"""Round-4 experimental Pallas kernel variants (temporary tuning module).

Each variant keeps the reference semantics (flux formulas from
``isentropic/dynamics/vertical_fluxes.py``, sedimentation from
``physics/microphysics/kessler.py:1221`` / ``sedimentation_fluxes/*``) but
restructures the lane-axis work: cyclic ``pltpu.roll`` + one final 0/1 mask
instead of shifted slices + concat-padding, and per-interface linear flux
coefficients ``g_d`` hoisted out of the 18 (6 fields x 3 stages) tendency
evaluations.  Winners get promoted into the real ops modules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EXTENT = {1: 1, 2: 1, 3: 2, 5: 3}


def _roll(x, shift):
    return pltpu.roll(x, shift % x.shape[-1], axis=x.ndim - 1)


def _flux_coeffs(order, wf, denom):
    """Per-interface linear flux coefficients g_d (f[m] = sum_d g_d[m] *
    phi[m+d], d in [-e, e-1]) — algebraically identical to the reference
    flux formulas, with the aw/bw split distributed onto each offset."""
    if order == 1:
        pos = (wf > 0.0).astype(wf.dtype)
        return {0: wf * pos, -1: wf * (1.0 - pos)}
    if order == 2:
        half = 0.5 * wf
        return {0: half, -1: half}
    aw = wf / denom
    bw = jnp.abs(wf) / denom
    if order == 3:
        return {
            -2: bw - aw,
            -1: 7.0 * aw - 3.0 * bw,
            0: 7.0 * aw + 3.0 * bw,
            1: -(aw + bw),
        }
    if order == 5:
        return {
            -3: aw - bw,
            -2: -8.0 * aw + 5.0 * bw,
            -1: 37.0 * aw - 10.0 * bw,
            0: 37.0 * aw + 10.0 * bw,
            1: -8.0 * aw - 5.0 * bw,
            2: aw + bw,
        }
    raise ValueError(f"unsupported vertical flux order {order}")


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dz", "tile_x", "interpret"),
)
def vadv_rk3ws_v2(
    w,
    s,
    su,
    sv,
    qv=None,
    qc=None,
    qr=None,
    *,
    order: int = 3,
    dt: float = 1.0,
    dz: float = 1.0,
    tile_x: int = 16,
    interpret: bool = False,
):
    """Roll+mask variant of fused_vertical_advection_rk3ws."""
    nx, ny, nz = s.shape
    e = _EXTENT[order]
    moist = qv is not None
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt
    denom = {3: 12.0, 5: 60.0}.get(order)

    def kernel(*refs):
        if moist:
            w_r, s_r, su_r, sv_r, qv_r, qc_r, qr_r = refs[:7]
            outs = refs[7:]
        else:
            w_r, s_r, su_r, sv_r = refs[:4]
            outs = refs[4:]
        wm = w_r[:]
        s0, su0, sv0 = s_r[:], su_r[:], sv_r[:]
        q0 = (qv_r[:], qc_r[:], qr_r[:]) if moist else ()

        # interface velocity on ALL k (junk at k=0; masked away below)
        wf = 0.5 * (_roll(wm, 1) + wm)
        g = _flux_coeffs(order, wf, denom)
        # tendency valid only on levels [e, nz-e): 0/1 mask times 1/dz
        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        mask = jnp.where(
            (kidx >= e) & (kidx < nz - e), jnp.float32(1.0 / dz), 0.0
        ).astype(s0.dtype)

        def tendency(phi):
            # full-length flux (junk near the edges, masked away)
            f = None
            for d, gd in g.items():
                term = gd * (phi if d == 0 else _roll(phi, -d))
                f = term if f is None else f + term
            return (_roll(f, -1) - f) * mask

        def stage(c, sx, sux, svx, qx):
            s_new = s0 + c * tendency(sx)
            su_new = su0 + c * tendency(sux)
            sv_new = sv0 + c * tendency(svx)
            if not moist:
                return s_new, su_new, sv_new, ()
            cis = c / sx
            q_new = tuple(
                qb + cis * tendency(sx * qx_i) for qb, qx_i in zip(q0, qx)
            )
            return s_new, su_new, sv_new, q_new

        s1, su1, sv1, q1 = stage(c1, s0, su0, sv0, q0)
        s2, su2, sv2, q2 = stage(c2, s1, su1, sv1, q1)
        s3, su3, sv3, q3 = stage(c3, s2, su2, sv2, q2)

        outs[0][:] = s3
        outs[1][:] = su3
        outs[2][:] = sv3
        for o, q in zip(outs[3:], q3):
            o[:] = q

    spec = pl.BlockSpec((TX, ny, nz), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM)
    args = [w, s, su, sv] + ([qv, qc, qr] if moist else [])
    n_out = 6 if moist else 3
    outs = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec] * len(args),
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), s.dtype)] * n_out,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("order", "dt", "tile_x", "interpret"))
def sed_rk3ws_v2(
    rho,
    h_if,
    qr,
    *,
    order: int = 1,
    dt: float = 1.0,
    tile_x: int = 16,
    interpret: bool = False,
):
    """Roll+mask variant of fused_sedimentation_rk3ws: the height-coefficient
    divides and 1/rho are computed once (not per RK stage) and folded with
    the validity mask; only the qr-dependent fall-velocity power and the
    flux-divergence FMA run per stage."""
    nx, ny, nz = rho.shape
    rho = rho.astype(qr.dtype)
    h_if = h_if.astype(qr.dtype)
    nb = order
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt

    def kernel(rho_r, hif_r, qr_r, out_q, out_vt):
        rhov = rho_r[:]
        hif = hif_r[:]
        h = 0.5 * (hif[..., :-1] + hif[..., 1:])
        q0 = qr_r[:]

        mrho = 1.0e-3 * rhov
        wsq = 36.34 * (rhov[..., -1:] / rhov) ** 0.5

        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        mask = (kidx >= nb).astype(q0.dtype)
        minv_rho = mask / rhov

        hm1 = _roll(h, 1)
        if order == 1:
            # T[k] = (rqv[k-1] - rqv[k]) / (h[k-1] - h[k]) / rho[k]
            A = -minv_rho / (hm1 - h)
            B = -A
            C = None
        else:
            hm2 = _roll(h, 2)
            d1 = hm1 - h
            d2 = hm2 - h
            d3 = hm2 - hm1
            A = (2.0 * h - hm1 - hm2) / (d1 * d2) * minv_rho
            B = d2 / (d1 * d3) * minv_rho
            C = (h - hm1) / (d2 * d3) * minv_rho

        def tendency(qi):
            vt = wsq * (mrho * jnp.where(qi > 0.0, qi, 0.0)) ** 0.1346
            rqv = rhov * qi * vt
            t = A * rqv + B * _roll(rqv, 1)
            if C is not None:
                t = t + C * _roll(rqv, 2)
            return t, vt

        t1, vt1 = tendency(q0)
        q1 = q0 + c1 * t1
        t2, _ = tendency(q1)
        q2 = q0 + c2 * t2
        t3, _ = tendency(q2)
        out_q[:] = q0 + c3 * t3
        out_vt[:] = vt1

    spec = pl.BlockSpec((TX, ny, nz), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM)
    spec_if = pl.BlockSpec(
        (TX, ny, nz + 1), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM
    )
    q_out, vt_out = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec, spec_if, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), qr.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rho, h_if, qr)
    return q_out, vt_out


def _tri(n, dtype, lower_incl, scale=1.0):
    l = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    m = (l <= k) if lower_incl else (l >= k)
    return jnp.where(m, jnp.asarray(scale, dtype), jnp.asarray(0.0, dtype))


def _scan_matmul(x, m):
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    y = jax.lax.dot_general(
        x2,
        m,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(lead + (m.shape[1],))


@functools.partial(
    jax.jit,
    static_argnames=(
        "pt", "dz", "g", "cp", "rd", "pref", "mode", "tile_x", "interpret",
        "skip_mm", "skip_pow",
    ),
)
def diag_v2(
    s,
    hs,
    theta,
    *,
    pt,
    dz,
    g,
    cp,
    rd,
    pref,
    mode="moist",
    tile_x=16,
    interpret=False,
    skip_mm=False,
    skip_pow=False,
):
    """Diagnostics variant: g*dz folded into the forward-scan matrix, the two
    reverse scans (mtg increments and layer thickness) stacked into ONE MXU
    contraction; skip_mm/skip_pow stub out pieces for cost attribution."""
    nx, ny, nz = s.shape
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)
    hs3 = hs[:, :, None]

    def kernel(*refs):
        s_ref, hs_ref, th_ref = refs[:3]
        outs = refs[3:]
        sv = s_ref[:]
        hsv = hs_ref[:]
        th = th_ref[0][None, None, :]
        theta_s = th_ref[0, nz]
        dtype = sv.dtype

        if skip_mm:
            p_rest = g * dz * sv
        else:
            p_rest = _scan_matmul(sv, _tri(nz, dtype, True, scale=g * dz))
        p = jnp.concatenate([jnp.full_like(sv[..., :1], pt), pt + p_rest], axis=-1)
        if skip_pow:
            exn = (cp / pref) * p
        else:
            exn = cp * (p / pref) ** (rd / cp)

        mtg_s = theta_s * exn[..., nz : nz + 1] + g * hsv
        base = mtg_s + 0.5 * dz * exn[..., nz : nz + 1]

        if mode == "mtg":
            if skip_mm:
                rsum = dz * exn[..., 1:nz]
            else:
                rsum = _scan_matmul(
                    exn[..., 1:nz], _tri(nz - 1, dtype, False, scale=dz)
                )
            outs[0][:] = jnp.concatenate([base + rsum, base], axis=-1)
            return

        dh = (
            rd
            * (th[..., :-1] * exn[..., :-1] + th[..., 1:] * exn[..., 1:])
            * (p[..., :-1] - p[..., 1:])
            / (cp * g * (p[..., :-1] + p[..., 1:]))
        )
        # one stacked contraction for BOTH reverse scans: rows = [dz*exn[1:nz]
        # padded to nz ; dh].  Same (l >= k) matrix, shared MXU pass.
        inc = dz * exn[..., 1:nz]
        zcol = jnp.zeros_like(inc[..., :1])
        stacked = jnp.concatenate(
            [
                jnp.concatenate([inc, zcol], axis=-1).reshape(-1, nz),
                dh.reshape(-1, nz),
            ],
            axis=0,
        )
        if skip_mm:
            res = stacked
        else:
            res = _scan_matmul(stacked, _tri(nz, dtype, False))
        nrow = sv.shape[0] * sv.shape[1]
        rsum = res[:nrow].reshape(sv.shape[:2] + (nz,))[..., : nz - 1]
        h_rest = res[nrow:].reshape(sv.shape[:2] + (nz,))
        mtg = jnp.concatenate([base + rsum, base], axis=-1)
        h = jnp.concatenate([hsv - h_rest, hsv], axis=-1)

        outs[0][:] = p
        outs[1][:] = exn
        outs[2][:] = mtg
        outs[3][:] = h
        if mode == "moist":
            rho = sv * (th[..., :-1] - th[..., 1:]) / (h[..., :-1] - h[..., 1:])
            t = 0.5 / cp * (th[..., :-1] * exn[..., :-1] + th[..., 1:] * exn[..., 1:])
            outs[4][:] = rho
            outs[5][:] = t

    def spec(lastdim):
        return pl.BlockSpec(
            (TX, ny, lastdim), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM
        )

    out_specs = {
        "mtg": [spec(nz)],
        "dry": [spec(nz + 1), spec(nz + 1), spec(nz), spec(nz + 1)],
        "moist": [spec(nz + 1), spec(nz + 1), spec(nz), spec(nz + 1), spec(nz), spec(nz)],
    }[mode]
    lastdims = {
        "mtg": [nz],
        "dry": [nz + 1, nz + 1, nz, nz + 1],
        "moist": [nz + 1, nz + 1, nz, nz + 1, nz, nz],
    }[mode]
    out_shapes = [jax.ShapeDtypeStruct((nx, ny, ld), s.dtype) for ld in lastdims]

    outs = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec(nz), spec(1), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s, hs3, theta)
    return outs[0] if mode == "mtg" else tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dz", "tile_x", "interpret"),
)
def vadv_rk3ws_v3(
    w,
    s,
    su,
    sv,
    qv=None,
    qc=None,
    qr=None,
    *,
    order: int = 3,
    dt: float = 1.0,
    dz: float = 1.0,
    tile_x: int = 16,
    interpret: bool = False,
):
    """v1 slicing structure + per-interface linear flux coefficients g_d
    hoisted out of the 18 tendency evaluations (no rolls)."""
    nx, ny, nz = s.shape
    e = _EXTENT[order]
    moist = qv is not None
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt
    denom = {3: 12.0, 5: 60.0}.get(order)

    def kernel(*refs):
        if moist:
            w_r, s_r, su_r, sv_r, qv_r, qc_r, qr_r = refs[:7]
            outs = refs[7:]
        else:
            w_r, s_r, su_r, sv_r = refs[:4]
            outs = refs[4:]
        wm = w_r[:]
        s0, su0, sv0 = s_r[:], su_r[:], sv_r[:]
        q0 = (qv_r[:], qc_r[:], qr_r[:]) if moist else ()

        # interface velocity on interior interfaces m in [e, nz+1-e)
        wf = 0.5 * (wm[..., e - 1 : nz - e] + wm[..., e : nz + 1 - e])
        g = _flux_coeffs(order, wf, denom)

        def padz(d):
            z = jnp.zeros(d.shape[:-1] + (e,), d.dtype)
            return jnp.concatenate([z, d, z], axis=-1)

        def tendency(phi):
            f = None
            for d, gd in g.items():
                term = gd * phi[..., e + d : nz + 1 - e + d]
                f = term if f is None else f + term
            return (f[..., 1:] - f[..., :-1]) * (1.0 / dz)

        def stage(c, sx, sux, svx, qx):
            s_new = s0 + c * padz(tendency(sx))
            su_new = su0 + c * padz(tendency(sux))
            sv_new = sv0 + c * padz(tendency(svx))
            if not moist:
                return s_new, su_new, sv_new, ()
            inv_s = 1.0 / sx[..., e : nz - e]
            q_new = tuple(
                qb + c * padz(tendency(sx * qx_i) * inv_s)
                for qb, qx_i in zip(q0, qx)
            )
            return s_new, su_new, sv_new, q_new

        s1, su1, sv1, q1 = stage(c1, s0, su0, sv0, q0)
        s2, su2, sv2, q2 = stage(c2, s1, su1, sv1, q1)
        s3, su3, sv3, q3 = stage(c3, s2, su2, sv2, q2)

        outs[0][:] = s3
        outs[1][:] = su3
        outs[2][:] = sv3
        for o, q in zip(outs[3:], q3):
            o[:] = q

    spec = pl.BlockSpec((TX, ny, nz), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM)
    args = [w, s, su, sv] + ([qv, qc, qr] if moist else [])
    n_out = 6 if moist else 3
    outs = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec] * len(args),
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), s.dtype)] * n_out,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("order", "dt", "dz"))
def vadv_rk3ws_jnp(
    w,
    s,
    su,
    sv,
    qv=None,
    qc=None,
    qr=None,
    *,
    order: int = 3,
    dt: float = 1.0,
    dz: float = 1.0,
):
    """Pure-XLA variant: identical 3-stage math, one jitted expression — lets
    XLA's own fusion/instruction selection compete with the Pallas kernel."""
    nx, ny, nz = s.shape
    e = _EXTENT[order]
    moist = qv is not None
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt
    denom = {3: 12.0, 5: 60.0}.get(order)

    wf = 0.5 * (w[..., e - 1 : nz - e] + w[..., e : nz + 1 - e])
    g = _flux_coeffs(order, wf, denom)

    def padz(d):
        return jnp.pad(d, ((0, 0), (0, 0), (e, e)))

    def tendency(phi):
        f = None
        for d, gd in g.items():
            term = gd * phi[..., e + d : nz + 1 - e + d]
            f = term if f is None else f + term
        return (f[..., 1:] - f[..., :-1]) * (1.0 / dz)

    q0 = (qv, qc, qr) if moist else ()

    def stage(c, sx, sux, svx, qx):
        s_new = s + c * padz(tendency(sx))
        su_new = su + c * padz(tendency(sux))
        sv_new = sv + c * padz(tendency(svx))
        if not moist:
            return s_new, su_new, sv_new, ()
        inv_s = 1.0 / sx[..., e : nz - e]
        q_new = tuple(
            qb + c * padz(tendency(sx * qx_i) * inv_s)
            for qb, qx_i in zip(q0, qx)
        )
        return s_new, su_new, sv_new, q_new

    s1, su1, sv1, q1 = stage(c1, s, su, sv, q0)
    s2, su2, sv2, q2 = stage(c2, s1, su1, sv1, q1)
    s3, su3, sv3, q3 = stage(c3, s2, su2, sv2, q2)
    return (s3, su3, sv3) + q3


@functools.partial(jax.jit, static_argnames=("order", "dt", "dz"))
def vadv_rk3ws_jnp_exact(
    w, s, su, sv, qv=None, qc=None, qr=None,
    *, order: int = 3, dt: float = 1.0, dz: float = 1.0,
):
    """Pure-XLA variant with the EXACT v1 kernel arithmetic (same _vflux
    factored formula, same hoisted aw/bw, same padz/concat structure) — for
    bitwise parity with the Pallas path."""
    from tasmania_tpu.ops.vertical_advection_step import _EXTENT, _vflux

    nx, ny, nz = s.shape
    e = _EXTENT[order]
    moist = qv is not None
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt
    denom = {3: 12.0, 5: 60.0}.get(order)

    wf_k = 0.5 * (w[..., e - 1 : nz - e] + w[..., e : nz + 1 - e])
    aw_k = wf_k / denom if denom is not None else None
    bw_k = jnp.abs(wf_k) / denom if denom is not None else None

    def tendency_core(phi):
        pw = {k: phi[..., e + k : nz + 1 - e + k] for k in range(-e, e)}
        f = _vflux(order, wf_k, aw_k, bw_k, pw)
        return (f[..., 1:] - f[..., :-1]) / dz

    def padz(d):
        z = jnp.zeros(d.shape[:-1] + (e,), d.dtype)
        return jnp.concatenate([z, d, z], axis=-1)

    q0 = (qv, qc, qr) if moist else ()

    def stage(c, sx, sux, svx, qx):
        s_new = s + c * padz(tendency_core(sx))
        su_new = su + c * padz(tendency_core(sux))
        sv_new = sv + c * padz(tendency_core(svx))
        if not moist:
            return s_new, su_new, sv_new, ()
        inv_s = 1.0 / sx[..., e : nz - e]
        q_new = tuple(
            qb + c * padz(tendency_core(sx * qx_i) * inv_s)
            for qb, qx_i in zip(q0, qx)
        )
        return s_new, su_new, sv_new, q_new

    s1, su1, sv1, q1 = stage(c1, s, su, sv, q0)
    s2, su2, sv2, q2 = stage(c2, s1, su1, sv1, q1)
    s3, su3, sv3, q3 = stage(c3, s2, su2, sv2, q2)
    return (s3, su3, sv3) + q3


@functools.partial(jax.jit, static_argnames=("order", "dt"))
def sed_rk3ws_jnp(rho, h_if, qr, *, order: int = 1, dt: float = 1.0):
    """Pure-XLA sedimentation with the EXACT v1 kernel arithmetic."""
    from tasmania_tpu.ops.sedimentation_step import (
        _dfdz,
        _fall_velocity_weighted,
    )

    nx, ny, nz = rho.shape
    rho = rho.astype(qr.dtype)
    h_if = h_if.astype(qr.dtype)
    nb = order
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt

    h = 0.5 * (h_if[..., :-1] + h_if[..., 1:])
    mrho = 1.0e-3 * rho
    wsq = 36.34 * (rho[..., -1:] / rho) ** 0.5
    inv_rho = 1.0 / rho[..., nb:]

    def tendency(qi):
        vt = _fall_velocity_weighted(mrho, wsq, qi)
        d = _dfdz(order, rho, h, qi, vt) * inv_rho
        z = jnp.zeros(d.shape[:-1] + (nb,), d.dtype)
        return jnp.concatenate([z, d], axis=-1), vt

    t1, vt1 = tendency(qr)
    q1 = qr + c1 * t1
    t2, _ = tendency(q1)
    q2 = qr + c2 * t2
    t3, _ = tendency(q2)
    return qr + c3 * t3, vt1


@functools.partial(
    jax.jit,
    static_argnames=("pt", "dz", "g", "cp", "rd", "pref", "mode"),
)
def diag_jnp(
    s, hs, theta, *, pt, dz, g, cp, rd, pref, mode="moist",
):
    """Pure-XLA diagnostics with the EXACT kernel arithmetic (same MXU
    triangular contractions via dot_general at HIGHEST)."""
    nx, ny, nz = s.shape
    hsv = hs[:, :, None]
    th = theta[0][None, None, :]
    theta_s = theta[0, nz]
    dtype = s.dtype

    p_rest = _scan_matmul(g * dz * s, _tri(nz, dtype, True))
    p = jnp.concatenate([jnp.full_like(s[..., :1], pt), pt + p_rest], axis=-1)
    exn = cp * (p / pref) ** (rd / cp)

    mtg_s = theta_s * exn[..., nz : nz + 1] + g * hsv
    base = mtg_s + 0.5 * dz * exn[..., nz : nz + 1]
    inc = dz * exn[..., 1:nz]
    rsum = _scan_matmul(inc, _tri(nz - 1, dtype, False))
    mtg = jnp.concatenate([base + rsum, base], axis=-1)
    if mode == "mtg":
        return mtg

    dh = (
        rd
        * (th[..., :-1] * exn[..., :-1] + th[..., 1:] * exn[..., 1:])
        * (p[..., :-1] - p[..., 1:])
        / (cp * g * (p[..., :-1] + p[..., 1:]))
    )
    h_rest = _scan_matmul(dh, _tri(nz, dtype, False))
    h = jnp.concatenate([hsv - h_rest, hsv], axis=-1)
    if mode == "dry":
        return p, exn, mtg, h
    rho = s * (th[..., :-1] - th[..., 1:]) / (h[..., :-1] - h[..., 1:])
    t = 0.5 / cp * (th[..., :-1] * exn[..., :-1] + th[..., 1:] * exn[..., 1:])
    return p, exn, mtg, h, rho, t
