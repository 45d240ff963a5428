"""Pallas TPU kernel: fused RK3WS step of explicit vertical advection.

The SUS physics chain time-integrates ``IsentropicVerticalAdvection`` with a
three-stage Wicker--Skamarock RK (reference
``drivers/benchmarking/isentropic_moist/driver_namelist_sus.py:322-341``,
stepper algebra ``framework/subclasses/tendency_steppers/rk3ws.py:61-160``).
Vertical advection is column-local, so all three stages fit in VMEM per
x-tile: the kernel reads the 7 input fields once and writes the 6 stepped
fields once (~13 HBM sweeps), where the generic stepper path re-reads the
state and materializes 6 tendencies per stage (~40+ sweeps).

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
    18 tendency evaluations of the RK3WS kernel (6 fields x 3 stages), so
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


@functools.partial(
    jax.jit,
    static_argnames=("order", "dt", "dz", "tile_x", "interpret"),
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
    tile_x: int = 16,
    interpret: bool = False,
):
    """Three-stage RK3WS update of (s, su, sv[, qv, qc, qr]) under vertical
    advection with main-level velocity ``w = d(theta)/dt``.

    Args:
      w: (nx, ny, nz) tendency of air potential temperature (main levels).
      s, su, sv: (nx, ny, nz) isentropic density and momenta.
      qv, qc, qr: optional (nx, ny, nz) mass fractions (all or none).

    Returns:
      tuple of stepped fields in the same order as the inputs (w excluded).
    """
    nx, ny, nz = s.shape
    e = _EXTENT[order]
    moist = qv is not None
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt

    denom = {3: 12.0, 5: 60.0}.get(order)

    def tendency_core(wm, phi, aw=None, bw=None):
        # interface velocity on interior interfaces m in [e, nz+1-e)
        wf = 0.5 * (wm[..., e - 1 : nz - e] + wm[..., e : nz + 1 - e])
        if aw is None and denom is not None:
            aw, bw = wf / denom, jnp.abs(wf) / denom
        pw = {k: phi[..., e + k : nz + 1 - e + k] for k in range(-e, e)}
        f = _vflux(order, wf, aw, bw, pw)
        return (f[..., 1:] - f[..., :-1]) / dz  # levels [e, nz-e)

    def padz(d):
        z = jnp.zeros(d.shape[:-1] + (e,), d.dtype)
        return jnp.concatenate([z, d, z], axis=-1)

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
        # shared flux weights, computed once for all 18 tendency evaluations
        wf_k = 0.5 * (wm[..., e - 1 : nz - e] + wm[..., e : nz + 1 - e])
        aw_k = wf_k / denom if denom is not None else None
        bw_k = jnp.abs(wf_k) / denom if denom is not None else None

        def stage(c, sx, sux, svx, qx):
            s_new = s0 + c * padz(tendency_core(wm, sx, aw_k, bw_k))
            su_new = su0 + c * padz(tendency_core(wm, sux, aw_k, bw_k))
            sv_new = sv0 + c * padz(tendency_core(wm, svx, aw_k, bw_k))
            # one reciprocal per stage instead of one divide per species:
            # the three q tendencies share the divisor (VPU divides are
            # multi-pass; rtol 1e-6 vs the generic stepper absorbs the
            # 1-ulp a*(1/b) vs a/b difference)
            inv_s = 1.0 / sx[..., e : nz - e]
            q_new = tuple(
                qb + c * padz(tendency_core(wm, sx * qx_i, aw_k, bw_k) * inv_s)
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
