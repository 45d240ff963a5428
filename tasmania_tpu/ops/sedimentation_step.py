"""Pallas TPU kernel: fused RK3WS rain sedimentation.

The SUS chain time-integrates [KesslerFallVelocity -> KesslerSedimentation]
with RK3WS (reference ``drivers/.../driver_namelist_sus.py:392-414``).  Both
components are column-local, so the three stages fuse in VMEM per x-tile:
read (rho, h_if, qr) once, write (qr', vt) once.  Replicates exactly

  vt   = 36.34 (1e-3 rho max(qr,0))^0.1346 sqrt(rho_s/rho)
         (reference ``physics/microphysics/kessler.py:1198-1203``)
  dfdz = upwind flux divergence over height (reference
         ``microphysics/sedimentation_fluxes/{first,second}_order.py:30``)
  T    = dfdz / rho on levels [nb, nz), zero above

with stage algebra q_i = q_0 + c_i T(q_{i-1}), c = (dt/3, dt/2, dt)
(``framework/steppers.py`` RK3WS).  The vt diagnostic returned is the stage-1
evaluation, matching the generic stepper's k1 diagnostics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fall_velocity(rho, qr):
    rho_s = rho[..., -1:]
    return (
        36.34
        * (1.0e-3 * rho * jnp.where(qr > 0.0, qr, 0.0)) ** 0.1346
        * (rho_s / rho) ** 0.5
    )


def _fall_velocity_weighted(mrho, wsq, qr):
    """= ``_fall_velocity`` with the stage-invariant factors precomputed:
    ``mrho = 1e-3 rho`` and ``wsq = 36.34 (rho_s/rho)^0.5`` — only the
    qr-dependent power is evaluated per RK stage."""
    return wsq * (mrho * jnp.where(qr > 0.0, qr, 0.0)) ** 0.1346


def _dfdz(order: int, rho, h, q, vt):
    rqv = rho * q * vt
    if order == 1:
        return (rqv[..., :-1] - rqv[..., 1:]) / (h[..., :-1] - h[..., 1:])
    a = (2.0 * h[..., 2:] - h[..., 1:-1] - h[..., :-2]) / (
        (h[..., 1:-1] - h[..., 2:]) * (h[..., :-2] - h[..., 2:])
    )
    b = (h[..., :-2] - h[..., 2:]) / (
        (h[..., 1:-1] - h[..., 2:]) * (h[..., :-2] - h[..., 1:-1])
    )
    c = (h[..., 2:] - h[..., 1:-1]) / (
        (h[..., :-2] - h[..., 2:]) * (h[..., :-2] - h[..., 1:-1])
    )
    return a * rqv[..., 2:] + b * rqv[..., 1:-1] + c * rqv[..., :-2]


def _sed_rk3ws_body(rhov, hifv, q0, *, order, dt, vt_mode):
    """The three-stage RK3WS sedimentation algebra on (..., nz) VALUES —
    shared verbatim by ``fused_sedimentation_rk3ws`` and the merged
    vadv+sed kernel (``vertical_advection_step.fused_vadv_sedimentation_rk3ws``)
    so the two cannot diverge.  Returns (q_stepped, vt_stage1).

    Stage-invariant factors are hoisted out of the three RK evaluations:
    the sqrt-power, the 1e-3 scaling, the divides, and (r4) the WHOLE
    height-coefficient algebra of ``_dfdz`` with 1/rho folded in — per
    stage only the qr-dependent fall-velocity power and a 2- or 3-tap
    FMA remain.  Same formulas as ``_dfdz`` up to multiplication
    reassociation (oracle tests hold at their existing tolerances)."""
    nb = order  # flux extent
    c1, c2, c3 = dt / 3.0, dt / 2.0, dt
    h = 0.5 * (hifv[..., :-1] + hifv[..., 1:])
    mrho = 1.0e-3 * rhov
    wsq = 36.34 * (rhov[..., -1:] / rhov) ** 0.5
    inv_rho = 1.0 / rhov[..., nb:]
    if order == 1:
        ca = inv_rho / (h[..., :-1] - h[..., 1:])
        cb = None
    else:
        h2, h1, h0 = h[..., 2:], h[..., 1:-1], h[..., :-2]
        d1 = h1 - h2
        d2 = h0 - h2
        d3 = h0 - h1
        ca = (2.0 * h2 - h1 - h0) / (d1 * d2) * inv_rho
        cb = d2 / (d1 * d3) * inv_rho
        cc = (h2 - h1) / (d2 * d3) * inv_rho

    def tendency(qi, vt_frozen=None):
        # vt_mode="step" (the flagship namelist's setting): the qr^0.1346
        # fall-velocity power — the kernel's dominant cost, BENCH_NOTES
        # kernel_roofline — is evaluated at stage 1 only and reused; vt
        # varies slowly within a step, but this DEVIATES from the
        # reference's per-stage evaluation (error budget in BENCH_NOTES
        # r5_sed_vt_step; golden umax unchanged at all printed digits)
        vt = (
            vt_frozen
            if vt_frozen is not None
            else _fall_velocity_weighted(mrho, wsq, qi)
        )
        rqv = rhov * qi * vt
        if order == 1:
            d = ca * (rqv[..., :-1] - rqv[..., 1:])
        else:
            d = ca * rqv[..., 2:] + cb * rqv[..., 1:-1] + cc * rqv[..., :-2]
        z = jnp.zeros(d.shape[:-1] + (nb,), d.dtype)
        return jnp.concatenate([z, d], axis=-1), vt

    t1, vt1 = tendency(q0)
    frozen = vt1 if vt_mode == "step" else None
    q1 = q0 + c1 * t1
    t2, _ = tendency(q1, frozen)
    q2 = q0 + c2 * t2
    t3, _ = tendency(q2, frozen)
    return q0 + c3 * t3, vt1


@functools.partial(
    jax.jit, static_argnames=("order", "dt", "tile_x", "vt_mode", "interpret")
)
def fused_sedimentation_rk3ws(
    rho,
    h_if,
    qr,
    *,
    order: int = 1,
    dt: float = 1.0,
    tile_x: int = 16,
    vt_mode: str = "stage",
    interpret: bool = False,
):
    """Three-stage RK3WS update of qr under rain sedimentation.

    Args:
      rho: (nx, ny, nz) air density.
      h_if: (nx, ny, nz+1) height of interface levels.
      qr: (nx, ny, nz) precipitation-water mass fraction.

    Returns:
      (qr_out, vt_stage1): stepped mass fraction and the first-stage fall
      velocity diagnostic.
    """
    nx, ny, nz = rho.shape
    rho = rho.astype(qr.dtype)
    h_if = h_if.astype(qr.dtype)
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)

    def kernel(rho_r, hif_r, qr_r, out_q, out_vt):
        q_out, vt1 = _sed_rk3ws_body(
            rho_r[:], hif_r[:], qr_r[:], order=order, dt=dt, vt_mode=vt_mode
        )
        out_q[:] = q_out
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
