"""Pallas TPU kernel: ONE whole semi-implicit stage of the isentropic core.

Fuses, per x-tile in VMEM, everything the dycore does between reading the
stage input and diagnosing velocities (reference call stack SURVEY.md §3.2:
``rk3ws_si.py:105-231`` + ``dycore.py:766-842``):

  1. density (+ water-density) advection with the relaxed lateral BC
     (``subclasses/prognostics/utils.py:44 step_forward_euler``,
     ``boundaries/relaxed.py:133``);
  2. the Montgomery potential of the stepped, enforced density — the
     column-local hydrostatic/Exner scans expressed as triangular-matrix
     contractions on the MXU (``isentropic/dynamics/diagnostics.py:320-406``;
     same recurrences as ``ops/diagnostics_step.py``) — computed on a
     one-column-haloed window so the pressure-gradient x-derivative never
     leaves VMEM;
  3. momentum advection with the semi-implicit pressure gradient
     ``(1-eps)·s_now·∇mtg_now + eps·s_new·∇mtg_new``
     (``utils.py:138 step_forward_euler_momentum``);
  4. the stage epilogue: mass fractions ``q = clip(sq/s_new)``, relaxed BC on
     every prognostic field, Rayleigh damping (``dycore.py:798-842``).

Versus the two-kernel path (``advection_step.fused_advection_fields`` +
standalone Montgomery + ``fused_momentum_epilogue``) this saves per stage:
the u/v/s_now re-reads, the s_new and mtg_new HBM round-trips, and — via
band-restricted constants — most of the BC-reference traffic: su/sv/q
references ride as (nx, 16, nz) y-band strips (the relaxed band is nr<=8
rows; x-band columns are finished OUTSIDE the kernel, see below) and the
damping references as (nx, ny, damp_depth) top slabs.

Column ownership:
  * kernel tiles own interior columns [nb, nx-nb), writing final values for
    x in [nr, nx-nr) ("core rows") and RAW (un-enforced, un-damped) updates
    for the x-band rows [nb, nr) and [nx-nr, nx-nb) — the caller applies
    BC+damping to those few columns in XLA (cheap, and it keeps per-row
    reference gathers out of the kernel);
  * the nb-wide x-frame is composed by the caller from "now" values, exactly
    like the two-kernel path.

The stage reproduces the two-kernel path to machine precision (same slicing
algebra; the band/slab restrictions only skip arithmetic that is an exact
identity where gamma == 0 / rmat == 0; the Montgomery contraction may differ
by ~1 ulp because it groups TX+2 columns per matmul where the standalone
kernel groups TX); the equivalence is pinned by ``tests/test_si_stage.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tasmania_tpu.ops.advection_step import (
    _DEFAULT_TILE_X,
    _clip_pos,
    _enforce_relaxed,
    _flux_3rd,
    _flux_5th,
)
from tasmania_tpu.ops.diagnostics_step import _scan_matmul, _tri

_YB = 8  # y-band strip half-width carried per reference field (>= nr, 8-aligned)


def _div_from_views(order, dx, dy, nb, ny, uf, vf, xs, ybase):
    """Flux divergence over W columns x [nb, ny-nb) rows, given the 2e
    face-aligned x-views xs (each (W+1, ny, nz)) and the center window ybase
    ((W, ny, nz)) for the y-fluxes; uf (W+1, ny, nz) faces, vf (W, ny+1, nz).
    Same arithmetic as ``advection_step._div_tile``."""
    e = 2 if order == 3 else 3
    jin = slice(nb, ny - nb)
    flux = _flux_3rd if order == 3 else _flux_5th
    fx = flux(uf[:, jin], *[x[:, jin] for x in xs])
    W = ybase.shape[0]
    ys = [ybase[:, nb - e + k : ny - nb - e + 1 + k] for k in range(2 * e)]
    fy = flux(vf[:, nb : ny - nb + 1], *ys)
    return (fx[1:] - fx[:-1]) / dx + (fy[:, 1:] - fy[:, :-1]) / dy


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "nb", "nr", "dt", "dtf", "dx", "dy", "eps",
        "pt", "dz", "g", "cp", "rd", "pref",
        "nq", "do_damp", "dd", "tile_x", "interpret",
    ),
)
def fused_si_stage(
    u,
    v,
    s_now,
    s_int,
    q_now,       # tuple of nq mass fractions (now)
    q_int,       # tuple of nq mass fractions (int)
    su_now,
    sv_now,
    su_int,
    sv_int,
    mtg_now,
    hs,          # (nx, ny) topography height
    theta,       # (1, nz+1) potential temperature on interface levels
    gamma,       # (nx, ny) relaxed-BC coefficients
    s_ref,
    su_ref,
    sv_ref,
    q_refs,      # tuple of nq reference mass fractions
    rmat,        # (1, nz) Rayleigh profile (ignored unless do_damp)
    *,
    order: int,
    nb: int,
    nr: int,
    dt: float,
    dtf: float,
    dx: float,
    dy: float,
    eps: float,
    pt: float,
    dz: float,
    g: float,
    cp: float,
    rd: float,
    pref: float,
    nq: int,
    do_damp: bool,
    dd: int,     # damp depth: rmat[:, dd:] must be exactly zero
    tile_x: int = _DEFAULT_TILE_X,
    interpret: bool = False,
):
    """One fused SI stage; returns (s_f, su_f, sv_f, *q_f), full arrays."""
    nx, ny, nz = s_now.shape
    e = 2 if order == 3 else 3
    assert order in (3, 5) and nb >= e
    assert nr <= _YB <= ny // 2 and nb <= nr
    assert len(q_now) == len(q_int) == len(q_refs) == nq
    NXI = nx - 2 * nb
    # W1 = TX+2 must leave the one-column s_int halo in-bounds even at the
    # extreme tiles (the dynamic-slice shift absorbs exactly one column)
    TX = min(tile_x, NXI - 2) if nb == e else min(tile_x, NXI)
    assert TX >= 1, "grid too small for the fused stage (use the 2-kernel path)"
    W1 = TX + 2
    HS = W1 + 2 * e
    jin = slice(nb, ny - nb)
    dtype = s_now.dtype
    dd_eff = dd if do_damp else 1

    theta_np = theta  # (1, nz+1)

    def kernel(*refs):
        refs, pad_ref = refs[:-1], refs[-1]
        (u_ref, v_ref, sn_ref, si_ref) = refs[:4]
        pos = 4
        qn_refs = refs[pos : pos + nq]; pos += nq
        qi_refs = refs[pos : pos + nq]; pos += nq
        (sun_ref, svn_ref, sui_ref, svi_ref, mn_ref,
         hs_ref, th_ref, g_ref, sref_ref) = refs[pos : pos + 9]
        pos += 9
        suyb_ref, svyb_ref = refs[pos : pos + 2]; pos += 2
        qyb_refs = refs[pos : pos + nq]; pos += nq
        sutop_ref, svtop_ref, rm_ref = refs[pos : pos + 3]; pos += 3
        out_refs = refs[pos:]

        pid = pl.program_id(0)
        cs = jnp.minimum(pid * TX, NXI - TX)
        t0 = nb + cs
        a0 = jnp.clip(t0 - 1 - e, 0, nx - HS)
        delta = (t0 - 1 - e) - a0  # {-1, 0, +1}; nonzero only when nb == e

        uf = u_ref[:]                      # (TX+3, ny, nz) faces [t0-1, ...)
        vf = v_ref[:]                      # (TX+2, ny+1, nz)
        s_now_w = sn_ref[:]                # (TX+2, ny, nz)
        s_int_w = si_ref[:]                # (HS, ny, nz), starts at a0

        # --- density advection on the W1 window --------------------------- #
        # The nominal stencil window [t0-1-e, t0+TX+1+e) leaves the array by
        # exactly one column at the extreme tiles (when nb == e), so the
        # fetched block starts at the clamped a0.  Copy the window into a
        # scratch ref padded by one edge-duplicate column per side: every
        # view start 1 + delta + k is then in-range, and the views are
        # dynamic REF reads (``pl.ds``) — Mosaic has no lowering for
        # dynamic_slice on values, and a clamped slice would SHIFT the whole
        # view, corrupting every column rather than just the masked frame
        # column that consumes the duplicate values.
        pad_ref[1 : HS + 1] = s_int_w
        pad_ref[0:1] = s_int_w[:1]
        pad_ref[HS + 1 : HS + 2] = s_int_w[-1:]
        xs = [
            pad_ref[pl.ds(1 + delta + k, W1 + 1)] for k in range(2 * e)
        ]
        ybase_s = pad_ref[pl.ds(1 + delta + e, W1)]
        div_s = _div_from_views(order, dx, dy, nb, ny, uf, vf, xs, ybase_s)
        s_adv = s_now_w[:, jin] - dt * div_s
        s_res = jnp.concatenate(
            [s_now_w[:, :nb], s_adv, s_now_w[:, ny - nb :]], axis=1
        )
        r1 = lax.broadcasted_iota(jnp.int32, (W1, 1, 1), 0)
        xg1 = t0 - 1 + r1
        frame1 = (xg1 < nb) | (xg1 >= nx - nb)
        s_res = jnp.where(frame1, s_now_w, s_res)
        s_e_w1 = _enforce_relaxed(s_res, g_ref[:], sref_ref[:])

        # --- Montgomery of the enforced density (MXU scans) --------------- #
        hs_w = hs_ref[:]                   # (TX+2, ny, 1)
        theta_s = th_ref[0, nz]
        p_rest = _scan_matmul(g * dz * s_e_w1, _tri(nz, dtype, lower_incl=True))
        p = jnp.concatenate(
            [jnp.full_like(s_e_w1[..., :1], pt), pt + p_rest], axis=-1
        )
        exn = cp * (p / pref) ** (rd / cp)
        mtg_s = theta_s * exn[..., nz : nz + 1] + g * hs_w
        base = mtg_s + 0.5 * dz * exn[..., nz : nz + 1]
        rsum = _scan_matmul(
            dz * exn[..., 1:nz], _tri(nz - 1, dtype, lower_incl=False)
        )
        mtg_w1 = jnp.concatenate([base + rsum, base], axis=-1)

        # --- tile-column views -------------------------------------------- #
        ct = slice(1, TX + 1)
        uf_t = uf[1 : TX + 2]
        vf_t = vf[1 : TX + 1]
        s_now_t = s_now_w[ct]
        s_e_t = s_e_w1[ct]
        sref_t = sref_ref[:][ct]
        g_t = g_ref[:][ct]
        rt = lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0)
        xgt = t0 + rt
        band = (xgt < nr) | (xgt >= nx - nr)

        def div_tile(phi_w):
            # phi_w: (TX+2e, ny, nz) cells [t0-e, t0+TX+e)
            xs_t = [phi_w[k : TX + 1 + k] for k in range(2 * e)]
            return _div_from_views(
                order, dx, dy, nb, ny, uf_t, vf_t, xs_t, phi_w[e : e + TX]
            )

        def enforce_yband(res, yb):
            lo = _enforce_relaxed(res[:, :_YB], g_t[:, :_YB], yb[:, :_YB])
            hi = _enforce_relaxed(res[:, ny - _YB :], g_t[:, ny - _YB :], yb[:, _YB:])
            return jnp.concatenate([lo, res[:, _YB : ny - _YB], hi], axis=1)

        rm_top = rm_ref[:][:, None, :]     # (1, dd) -> (1, 1, dd)

        def damp_top(phi, phi_now_v, ref_top):
            if not do_damp:
                return phi
            top = phi[..., :dd_eff] - dtf * rm_top * (
                phi_now_v[..., :dd_eff] - ref_top
            )
            return jnp.concatenate([top, phi[..., dd_eff:]], axis=-1)

        # --- s output ------------------------------------------------------ #
        # s is enforced a SECOND time in the epilogue (reference
        # ``dycore.py:811`` after ``rk3ws_si.py:183``; v1 kernel does the
        # same); band rows carry the single-enforced value — the caller
        # applies the second enforcement there
        s_e2 = _enforce_relaxed(s_e_t, g_t, sref_t)
        s_dmp = damp_top(s_e2, s_now_t, sref_t[..., :dd_eff])
        out_refs[0][0:TX] = jnp.where(band, s_e_t, s_dmp)

        # --- momentum ------------------------------------------------------ #
        su_n = sun_ref[:]
        sv_n = svn_ref[:]
        div_su = div_tile(sui_ref[:])
        div_sv = div_tile(svi_ref[:])
        m_n = mn_ref[:]                    # (TX+2, ny, nz)
        cp1 = slice(2, TX + 2)
        cm1 = slice(0, TX)
        jp1 = slice(nb + 1, ny - nb + 1)
        jm1 = slice(nb - 1, ny - nb - 1)
        pgx = (1.0 - eps) * s_now_t[:, jin] * (
            m_n[cp1, jin] - m_n[cm1, jin]
        ) / (2.0 * dx) + eps * s_e_t[:, jin] * (
            mtg_w1[cp1, jin] - mtg_w1[cm1, jin]
        ) / (2.0 * dx)
        pgy = (1.0 - eps) * s_now_t[:, jin] * (
            m_n[ct, jp1] - m_n[ct, jm1]
        ) / (2.0 * dy) + eps * s_e_t[:, jin] * (
            mtg_w1[ct, jp1] - mtg_w1[ct, jm1]
        ) / (2.0 * dy)
        su_pre = jnp.concatenate(
            [su_n[:, :nb], su_n[:, jin] - dt * (div_su + pgx), su_n[:, ny - nb :]],
            axis=1,
        )
        sv_pre = jnp.concatenate(
            [sv_n[:, :nb], sv_n[:, jin] - dt * (div_sv + pgy), sv_n[:, ny - nb :]],
            axis=1,
        )
        su_enf = enforce_yband(su_pre, suyb_ref[:])
        sv_enf = enforce_yband(sv_pre, svyb_ref[:])
        su_dmp = damp_top(su_enf, su_n, sutop_ref[:])
        sv_dmp = damp_top(sv_enf, sv_n, svtop_ref[:])
        out_refs[1][0:TX] = jnp.where(band, su_pre, su_dmp)
        out_refs[2][0:TX] = jnp.where(band, sv_pre, sv_dmp)

        # --- water species ------------------------------------------------- #
        if nq:
            s_int_q = pad_ref[pl.ds(2 + delta, TX + 2 * e)]
            for k in range(nq):
                sq_now = _clip_pos(s_now_t * qn_refs[k][:])
                sq_int = _clip_pos(s_int_q * qi_refs[k][:])
                div_q = div_tile(sq_int)
                sq_res = jnp.concatenate(
                    [sq_now[:, :nb], sq_now[:, jin] - dt * div_q,
                     sq_now[:, ny - nb :]],
                    axis=1,
                )
                q_raw = _clip_pos(sq_res / s_e_t)
                q_enf = enforce_yband(q_raw, qyb_refs[k][:])
                out_refs[3 + k][0:TX] = jnp.where(band, q_raw, q_enf)

    # ----------------------- specs & wrapper ------------------------------- #
    def em(w, off):
        """Element spec of x-width w at clamped tile start + off."""
        return pl.BlockSpec(
            (pl.Element(w), pl.Element(ny), pl.Element(nz)),
            lambda ix, off=off, w=w: (
                nb + off + jnp.minimum(ix * TX, NXI - TX), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    s_int_spec = pl.BlockSpec(
        (pl.Element(HS), pl.Element(ny), pl.Element(nz)),
        lambda ix: (
            jnp.clip(nb - 1 - e + jnp.minimum(ix * TX, NXI - TX), 0, nx - HS),
            0,
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    u_spec = pl.BlockSpec(
        (pl.Element(TX + 3), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb - 1 + jnp.minimum(ix * TX, NXI - TX), 0, 0),
        memory_space=pltpu.VMEM,
    )
    v_spec = pl.BlockSpec(
        (pl.Element(W1), pl.Element(ny + 1), pl.Element(nz)),
        lambda ix: (nb - 1 + jnp.minimum(ix * TX, NXI - TX), 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane_spec = pl.BlockSpec(  # (nx, ny, 1) operands on the W1 window
        (pl.Element(W1), pl.Element(ny), pl.Element(1)),
        lambda ix: (nb - 1 + jnp.minimum(ix * TX, NXI - TX), 0, 0),
        memory_space=pltpu.VMEM,
    )
    yband_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(2 * _YB), pl.Element(nz)),
        lambda ix: (nb + jnp.minimum(ix * TX, NXI - TX), 0, 0),
        memory_space=pltpu.VMEM,
    )
    top_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(dd_eff)),
        lambda ix: (nb + jnp.minimum(ix * TX, NXI - TX), 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)

    c_spec = em(TX, 0)
    w1_spec = em(W1, -1)
    h_spec = em(TX + 2 * e, -e)

    # band/slab constants (XLA slices of the full reference fields)
    def yband(a):
        return jnp.concatenate([a[:, :_YB], a[:, ny - _YB :]], axis=1)

    su_yb, sv_yb = yband(su_ref), yband(sv_ref)
    q_ybs = tuple(yband(q) for q in q_refs)
    su_top = su_ref[..., :dd_eff]
    sv_top = sv_ref[..., :dd_eff]
    rm_top = (rmat if do_damp else jnp.zeros((1, nz), dtype))[:, :dd_eff]
    hs3 = hs[:, :, None].astype(dtype)
    g3 = gamma[:, :, None].astype(dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(NXI, TX),),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        in_specs=(
            [u_spec, v_spec, w1_spec, s_int_spec]
            + [c_spec] * nq
            + [h_spec] * nq
            + [c_spec, c_spec, h_spec, h_spec, w1_spec]
            + [plane_spec, whole, plane_spec, w1_spec]
            + [yband_spec, yband_spec]
            + [yband_spec] * nq
            + [top_spec, top_spec, whole]
        ),
        out_specs=[c_spec] * (3 + nq),
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), dtype)] * (3 + nq),
        scratch_shapes=[pltpu.VMEM((HS + 2, ny, nz), dtype)],
        interpret=interpret,
    )(
        u, v, s_now, s_int, *q_now, *q_int, su_now, sv_now, su_int, sv_int,
        mtg_now, hs3, theta_np, g3, s_ref, su_yb, sv_yb, *q_ybs,
        su_top, sv_top, rm_top,
    )
    s_o, su_o, sv_o = outs[0], outs[1], outs[2]
    q_o = list(outs[3:])

    # ------------- finish the x-band and x-frame columns in XLA ------------ #
    r3 = rmat[:, None, :] if do_damp else None

    def full_epilogue(sl, s_e_sl, su_v, sv_v, q_raw):
        """BC + damping on an x-slice; s_e_sl is the SINGLE-enforced density
        (the epilogue's second enforcement happens here)."""
        gsl = gamma[sl][:, :, None]
        s_f = _enforce_relaxed(s_e_sl, gsl, s_ref[sl])
        su_f = _enforce_relaxed(su_v, gsl, su_ref[sl])
        sv_f = _enforce_relaxed(sv_v, gsl, sv_ref[sl])
        if do_damp:
            s_f = s_f - dtf * r3 * (s_now[sl] - s_ref[sl])
            su_f = su_f - dtf * r3 * (su_now[sl] - su_ref[sl])
            sv_f = sv_f - dtf * r3 * (sv_now[sl] - sv_ref[sl])
        q_f = [
            _enforce_relaxed(qr, gsl, ref[sl]) for qr, ref in zip(q_raw, q_refs)
        ]
        return [s_f, su_f, sv_f] + q_f

    def paste(arrs, sl, vals):
        return [a.at[sl].set(v) for a, v in zip(arrs, vals)]

    arrs = [s_o, su_o, sv_o] + q_o

    # x-band [nb, nr) / [nx-nr, nx-nb): kernel wrote raw updates (s already
    # enforced); apply BC + damping here
    for sl in (slice(nb, nr), slice(nx - nr, nx - nb)):
        if sl.start < sl.stop:
            vals = full_epilogue(
                sl, s_o[sl], su_o[sl], sv_o[sl], [q[sl] for q in q_o]
            )
            arrs = paste(arrs, sl, vals)

    # x-frame [0, nb) / [nx-nb, nx): composed from "now" values
    for sl in (slice(0, nb), slice(nx - nb, nx)):
        gsl = gamma[sl][:, :, None]
        s_e_sl = _enforce_relaxed(s_now[sl], gsl, s_ref[sl])
        q_raw = [
            _clip_pos(_clip_pos(s_now[sl] * qn[sl]) / s_e_sl) for qn in q_now
        ]
        vals = full_epilogue(sl, s_e_sl, su_now[sl], sv_now[sl], q_raw)
        arrs = paste(arrs, sl, vals)

    return tuple(arrs)
