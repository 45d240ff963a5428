"""Fused RK3WS step of explicit vertical advection (Pallas kernel).

The SUS physics chain time-integrates ``IsentropicVerticalAdvection`` with a
three-stage Wicker--Skamarock RK (reference
``drivers/benchmarking/isentropic_moist/driver_namelist_sus.py:322-341``,
stepper algebra ``framework/subclasses/tendency_steppers/rk3ws.py:61-160``).
Vertical advection is column-local, so all three stages fuse: the step reads
the 7 input fields once and writes the 6 stepped fields once (~13 HBM
sweeps), where the generic stepper path re-reads the state and materializes 6
tendencies per stage (~40+ sweeps).

Implementation note (round-4 measurements, BENCH_NOTES r4_xla_vs_pallas):
an isolated fori-loop microbenchmark measured the XLA-compiled expression at
0.112 ms vs 0.785 for the Pallas kernel — but swapping it into the real step
REGRESSED the end-to-end bench by 1.35 ms/step: the microbenchmark let XLA
keep the loop-invariant operands VMEM-resident, which the full program
cannot, and the pad/concat intermediates then materialize in HBM.  The
Pallas kernel (tile_x=8, r4-tuned) remains the production path; the XLA
variant stays selectable (``impl="xla"``) and shares the SAME arithmetic
(bitwise-identical outputs).

Flux formulas replicate ``isentropic/dynamics/vertical_fluxes.py`` (reference
``subclasses/minimal_vertical_fluxes/*``) exactly; the per-stage algebra is
``x_i = x_0 + c_i * T(x_{i-1})`` with c = (dt/3, dt/2, dt), matching
``framework/steppers.py`` RK3WS.  Mass fractions q are advected as s*q with
the tendency divided by the *stage* density (reference
``isentropic/physics/vertical_advection.py`` ``tendency(s*q, scale=s)``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EXTENT = {1: 1, 2: 1, 3: 2, 5: 3}


def _vflux(order: int, wf, aw, bw, pw):
    """Vertical flux at interior interfaces; ``pw[k]`` is phi shifted by k
    relative to the interface (k in -extent..extent-1).  ``aw``/``bw`` are
    the precomputed weight arrays wf/denom and |wf|/denom — shared by all
    18 tendency evaluations of the RK3WS step (6 fields x 3 stages), so
    the divide-by-denominator and abs happen once, not per call."""
    if order == 1:
        return wf * jnp.where(wf > 0.0, pw[0], pw[-1])
    if order == 2:
        return wf * 0.5 * (pw[0] + pw[-1])
    if order == 3:
        return aw * (7.0 * (pw[-1] + pw[0]) - (pw[-2] + pw[1])) - bw * (
            3.0 * (pw[-1] - pw[0]) - (pw[-2] - pw[1])
        )
    if order == 5:
        return aw * (
            37.0 * (pw[-1] + pw[0]) - 8.0 * (pw[-2] + pw[1]) + (pw[-3] + pw[2])
        ) - bw * (
            10.0 * (pw[-1] - pw[0]) - 5.0 * (pw[-2] - pw[1]) + (pw[-3] - pw[2])
        )
    raise ValueError(f"unsupported vertical flux order {order}")


def _flux_coeffs(order, wf, denom):
    """Per-interface linear flux coefficients g_d (f[m] = sum_d g_d[m] *
    phi[m+d], d in -e..e-1) — ``_vflux`` with the aw/bw split distributed
    onto each offset.  Turns each tendency evaluation into 2e multiplies +
    (2e-1) adds on 2e taps, ~30% faster than the factored form on the VPU
    (r4 shootout: 0.532 vs 0.785 ms at tile_x=16); numerically a ~1-ulp
    reassociation of the SAME flux (the fused-vs-generic oracle tests hold
    at their existing tolerances, and the on-chip golden umax is unchanged
    at all printed digits)."""
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
    return {
        -3: aw - bw,
        -2: -8.0 * aw + 5.0 * bw,
        -1: 37.0 * aw - 10.0 * bw,
        0: 37.0 * aw + 10.0 * bw,
        1: -8.0 * aw - 5.0 * bw,
        2: aw + bw,
    }


def _rk3ws_update(wm, s0, su0, sv0, q0, *, order, dt, dz, gcoef=False):
    """The shared 3-stage update on (…, nz) arrays — used verbatim by BOTH
    the XLA path and the Pallas kernel body, so the two are bitwise equal
    at matching ``gcoef``."""
    nz = s0.shape[-1]
    e = _EXTENT[order]
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt
    denom = {3: 12.0, 5: 60.0}.get(order)

    # shared flux weights, computed once for all 18 tendency evaluations
    wf_k = 0.5 * (wm[..., e - 1 : nz - e] + wm[..., e : nz + 1 - e])
    if gcoef:
        g_k = _flux_coeffs(order, wf_k, denom)
    else:
        aw_k = wf_k / denom if denom is not None else None
        bw_k = jnp.abs(wf_k) / denom if denom is not None else None

    def tendency_core(phi):
        pw = {k: phi[..., e + k : nz + 1 - e + k] for k in range(-e, e)}
        if gcoef:
            f = None
            for d, gd in g_k.items():
                term = gd * pw[d]
                f = term if f is None else f + term
        else:
            f = _vflux(order, wf_k, aw_k, bw_k, pw)
        return (f[..., 1:] - f[..., :-1]) / dz  # levels [e, nz-e)

    def padz(d):
        z = jnp.zeros(d.shape[:-1] + (e,), d.dtype)
        return jnp.concatenate([z, d, z], axis=-1)

    def stage(c, sx, sux, svx, qx):
        s_new = s0 + c * padz(tendency_core(sx))
        su_new = su0 + c * padz(tendency_core(sux))
        sv_new = sv0 + c * padz(tendency_core(svx))
        if not q0:
            return s_new, su_new, sv_new, ()
        # one reciprocal per stage instead of one divide per species:
        # the three q tendencies share the divisor (VPU divides are
        # multi-pass; rtol 1e-6 vs the generic stepper absorbs the
        # 1-ulp a*(1/b) vs a/b difference)
        inv_s = 1.0 / sx[..., e : nz - e]
        q_new = tuple(
            qb + c * padz(tendency_core(sx * qx_i) * inv_s)
            for qb, qx_i in zip(q0, qx)
        )
        return s_new, su_new, sv_new, q_new

    s1, su1, sv1, q1 = stage(c1, s0, su0, sv0, q0)
    s2, su2, sv2, q2 = stage(c2, s1, su1, sv1, q1)
    s3, su3, sv3, q3 = stage(c3, s2, su2, sv2, q2)
    return (s3, su3, sv3) + q3


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dz", "tile_x", "interpret", "impl", "gcoef"),
)
def fused_vertical_advection_rk3ws(
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
    tile_x: int = 8,
    interpret: bool = False,
    impl: str = "pallas",
    gcoef: bool = True,
):
    """Three-stage RK3WS update of (s, su, sv[, qv, qc, qr]) under vertical
    advection with main-level velocity ``w = d(theta)/dt``.

    Args:
      w: (nx, ny, nz) tendency of air potential temperature (main levels).
      s, su, sv: (nx, ny, nz) isentropic density and momenta.
      qv, qc, qr: optional (nx, ny, nz) mass fractions (all or none).
      impl: "pallas" (default) or "xla".  The r4 microbenchmark measured
        the XLA expression at 0.112 ms vs pallas 0.785 — but IN the real
        step program the XLA variant costs +1.35 ms (bench combo table,
        BENCH_NOTES r4_xla_vs_pallas): the isolated fori-loop harness let
        XLA keep the six loop-invariant operands VMEM-resident, which the
        real chain cannot; the 18 pad/concat intermediates then materialize.
        tile_x=8 is the r4-tuned kernel width (0.606 ms vs 0.785 at 16).

    Returns:
      tuple of stepped fields in the same order as the inputs (w excluded).
    """
    nx, ny, nz = s.shape
    moist = qv is not None
    q0 = (qv, qc, qr) if moist else ()

    if impl == "xla":
        return _rk3ws_update(
            w, s, su, sv, q0, order=order, dt=dt, dz=dz, gcoef=gcoef
        )

    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)

    def kernel(*refs):
        if moist:
            w_r, s_r, su_r, sv_r, qv_r, qc_r, qr_r = refs[:7]
            outs = refs[7:]
            qk = (qv_r[:], qc_r[:], qr_r[:])
        else:
            w_r, s_r, su_r, sv_r = refs[:4]
            outs = refs[4:]
            qk = ()
        res = _rk3ws_update(
            w_r[:], s_r[:], su_r[:], sv_r[:], qk, order=order, dt=dt, dz=dz,
            gcoef=gcoef,
        )
        for o, r in zip(outs, res):
            o[:] = r

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


@functools.partial(
    jax.jit,
    static_argnames=(
        "vorder", "sorder", "dt", "dz", "vt_mode", "tile_x", "interpret"
    ),
)
def fused_vadv_sedimentation_rk3ws(
    w,
    s,
    su,
    sv,
    qv,
    qc,
    qr,
    rho,
    h_if,
    *,
    vorder: int = 3,
    sorder: int = 2,
    dt: float = 1.0,
    dz: float = 1.0,
    vt_mode: str = "stage",
    tile_x: int = 8,
    interpret: bool = False,
):
    """ONE kernel for the adjacent SUS processes
    ``IsentropicVerticalAdvection(rk3ws)`` ->
    ``[KesslerFallVelocity -> KesslerSedimentation](rk3ws)`` (reference chain
    order ``drivers/.../driver_namelist_sus.py:322-414``): both are
    column-local, so the sedimentation RK3WS runs in VMEM directly on the
    advected qr — the intermediate qr (dead in the sequential pair) never
    round-trips HBM, and one kernel launch disappears.  Reproduces
    ``fused_vertical_advection_rk3ws`` followed by
    ``fused_sedimentation_rk3ws``: the advected fields are bitwise (same
    helpers), the sedimentation outputs agree to fma-contraction
    reassociation (~1e-5 rtol — the sed algebra consumes the advected qr as
    an in-kernel VALUE, so the compiler may contract differently than in
    the standalone kernel; pinned by tests/test_pallas_ops.py).

    Returns:
      (s', su', sv', qv', qc', qr'', vt1): advected fields, the
      sedimentation-stepped qr, and the stage-1 fall velocity diagnostic.
    """
    from tasmania_tpu.ops.sedimentation_step import _sed_rk3ws_body

    nx, ny, nz = s.shape
    rho = rho.astype(qr.dtype)
    h_if = h_if.astype(qr.dtype)
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)

    def kernel(w_r, s_r, su_r, sv_r, qv_r, qc_r, qr_r, rho_r, hif_r, *outs):
        # --- vertical advection, all three RK stages (shared helper) ------- #
        adv = _rk3ws_update(
            w_r[:], s_r[:], su_r[:], sv_r[:],
            (qv_r[:], qc_r[:], qr_r[:]),
            order=vorder, dt=dt, dz=dz, gcoef=True,
        )
        for o, r in zip(outs[:5], adv[:5]):
            o[:] = r

        # --- sedimentation RK3WS on the advected qr (shared helper) -------- #
        q_out, vt1 = _sed_rk3ws_body(
            rho_r[:], hif_r[:], adv[5], order=sorder, dt=dt, vt_mode=vt_mode
        )
        outs[5][:] = q_out
        outs[6][:] = vt1

    spec = pl.BlockSpec((TX, ny, nz), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM)
    spec_if = pl.BlockSpec(
        (TX, ny, nz + 1), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec] * 8 + [spec_if],
        out_specs=[spec] * 7,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), s.dtype)] * 7,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w, s, su, sv, qv, qc, qr, rho, h_if)
    return tuple(outs)
