"""Pallas TPU kernels: fused RK2 Kessler microphysics / saturation adjustment.

The SUS chain time-integrates [KesslerMicrophysics -> θ-to-diagnostic] and
[θ-to-tendency -> KesslerSaturationAdjustmentPrognostic -> θ-to-diagnostic]
with RK2 (reference ``drivers/.../driver_namelist_sus.py:257-341``).  Both are
pure pointwise chains, so the two RK stages fuse in VMEM per x-tile: read the
thermodynamic inputs once, write the stepped species and the stage-1
θ-tendency diagnostic once.

Formulas verbatim from ``physics/microphysics/kessler.py`` (reference
``kessler.py:308-376`` microphysics, ``:1021-1031`` relaxed adjustment,
Tetens ``610.78·exp(17.27(T−273.16)/(T−35.86))``); stage algebra
``x_i = x_0 + c_i·k(x_{i-1})`` with c = (dt/2, dt) and the stage-1
diagnostics returned, matching ``framework/steppers.py`` RK2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tetens(t):
    return 610.78 * jnp.exp(17.27 * (t - 273.16) / (t - 35.86))


def _main_levels(f_if):
    return 0.5 * (f_if[..., :-1] + f_if[..., 1:])


@functools.partial(
    jax.jit,
    static_argnames=("a", "k1", "k2", "beta", "lhvw", "dt", "tile_x", "interpret"),
)
def fused_kessler_rk2(
    rho,
    t,
    p_if,
    exn_if,
    qv,
    qc,
    qr,
    *,
    a: float,
    k1: float,
    k2: float,
    beta: float,
    lhvw: float,
    dt: float,
    tile_x: int = 16,
    interpret: bool = False,
):
    """RK2 update of (qv, qc, qr) under autoconversion + accretion + rain
    evaporation; returns (qv', qc', qr', stage-1 θ-tendency)."""
    nx, ny, nz = rho.shape
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)

    def kernel(rho_r, t_r, p_r, e_r, qv_r, qc_r, qr_r, oqv, oqc, oqr, oth):
        rhov = rho_r[:]
        tv = t_r[:]
        p = _main_levels(p_r[:])
        exn = _main_levels(e_r[:])
        qvs = beta * _tetens(tv) / p  # T fixed across stages

        def tend(qv0, qc0, qr0):
            ar = k1 * jnp.where(qc0 > a, qc0 - a, 0.0)
            cr = k2 * qc0 * jnp.where(qr0 > 0.0, qr0**0.875, 0.0)
            er = jnp.where(
                qr0 > 0.0,
                0.0484794 * (qvs - qv0) * (rhov * qr0) ** (13.0 / 20.0),
                0.0,
            )
            return er, -(ar + cr), ar + cr - er

        qv0, qc0, qr0 = qv_r[:], qc_r[:], qr_r[:]
        ev1, ec1, er1 = tend(qv0, qc0, qr0)
        h = 0.5 * dt
        ev2, ec2, er2 = tend(qv0 + h * ev1, qc0 + h * ec1, qr0 + h * er1)
        oqv[:] = qv0 + dt * ev2
        oqc[:] = qc0 + dt * ec2
        oqr[:] = qr0 + dt * er2
        oth[:] = -lhvw / exn * ev1  # stage-1 θ-tendency diagnostic

    spec = pl.BlockSpec((TX, ny, nz), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM)
    spec_if = pl.BlockSpec(
        (TX, ny, nz + 1), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec, spec, spec_if, spec_if, spec, spec, spec],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), qv.dtype)] * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rho, t, p_if, exn_if, qv, qc, qr)


@functools.partial(
    jax.jit,
    static_argnames=(
        "a", "k1", "k2", "sr", "beta", "lhvw", "cp", "rv", "dt",
        "tile_x", "interpret",
    ),
)
def fused_kessler_satadj_rk2(
    rho,
    t,
    p_if,
    exn_if,
    qv,
    qc,
    qr,
    *,
    a: float,
    k1: float,
    k2: float,
    sr: float,
    beta: float,
    lhvw: float,
    cp: float,
    rv: float,
    dt: float,
    tile_x: int = 16,
    interpret: bool = False,
):
    """BOTH adjacent SUS processes — the RK2 Kessler microphysics update and
    the RK2 relaxed saturation adjustment applied to its output — in ONE
    kernel: the intermediate (qv', qc') and the Kessler θ-tendency never
    round-trip HBM, and the shared thermodynamic inputs (t, p, exn) are read
    once instead of twice.  Bitwise-identical op sequence to
    ``fused_kessler_rk2`` followed by ``fused_satadj_rk2``.

    Returns (qv'', qc'', qr', θ-tendency after both processes)."""
    nx, ny, nz = rho.shape
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)

    def kernel(rho_r, t_r, p_r, e_r, qv_r, qc_r, qr_r, oqv, oqc, oqr, oth):
        rhov = rho_r[:]
        tv = t_r[:]
        p = _main_levels(p_r[:])
        exn = _main_levels(e_r[:])
        qvs = beta * _tetens(tv) / p  # T fixed across stages; shared by both

        # --- Kessler RK2 (identical to fused_kessler_rk2) ------------------ #
        def tend(qv0, qc0, qr0):
            ar = k1 * jnp.where(qc0 > a, qc0 - a, 0.0)
            cr = k2 * qc0 * jnp.where(qr0 > 0.0, qr0**0.875, 0.0)
            er = jnp.where(
                qr0 > 0.0,
                0.0484794 * (qvs - qv0) * (rhov * qr0) ** (13.0 / 20.0),
                0.0,
            )
            return er, -(ar + cr), ar + cr - er

        qv0, qc0, qr0 = qv_r[:], qc_r[:], qr_r[:]
        ev1, ec1, er1 = tend(qv0, qc0, qr0)
        h = 0.5 * dt
        ev2, ec2, er2 = tend(qv0 + h * ev1, qc0 + h * ec1, qr0 + h * er1)
        qv1 = qv0 + dt * ev2
        qc1 = qc0 + dt * ec2
        oqr[:] = qr0 + dt * er2
        th1 = -lhvw / exn * ev1

        # --- saturation adjustment RK2 (identical to fused_satadj_rk2) ----- #
        denom = 1.0 + qvs * lhvw**2 / (cp * rv * tv**2)

        def dq(qva, qca):
            sat = (qvs - qva) / denom
            return jnp.where(sat <= qca, sat, qca)

        d1 = dq(qv1, qc1)
        hs_ = 0.5 * dt * sr
        d2 = dq(qv1 + hs_ * d1, qc1 - hs_ * d1)
        oqv[:] = qv1 + dt * sr * d2
        oqc[:] = qc1 - dt * sr * d2
        oth[:] = th1 - sr * (lhvw / exn) * d1

    spec = pl.BlockSpec((TX, ny, nz), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM)
    spec_if = pl.BlockSpec(
        (TX, ny, nz + 1), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec, spec, spec_if, spec_if, spec, spec, spec],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), qv.dtype)] * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rho, t, p_if, exn_if, qv, qc, qr)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "beta", "lhvw", "cp", "rv", "dt", "tile_x", "interpret"),
)
def fused_satadj_rk2(
    t,
    p_if,
    exn_if,
    qv,
    qc,
    theta_tnd_in,
    *,
    sr: float,
    beta: float,
    lhvw: float,
    cp: float,
    rv: float,
    dt: float,
    tile_x: int = 16,
    interpret: bool = False,
):
    """RK2 update of (qv, qc) under the relaxed saturation adjustment;
    returns (qv', qc', θ-tendency diagnostic = promoted input + stage-1
    adjustment)."""
    nx, ny, nz = t.shape
    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)

    def kernel(t_r, p_r, e_r, qv_r, qc_r, ti_r, oqv, oqc, oth):
        tv = t_r[:]
        p = _main_levels(p_r[:])
        exn = _main_levels(e_r[:])
        qvs = beta * _tetens(tv) / p
        denom = 1.0 + qvs * lhvw**2 / (cp * rv * tv**2)

        def dq(qv0, qc0):
            sat = (qvs - qv0) / denom
            return jnp.where(sat <= qc0, sat, qc0)

        qv0, qc0 = qv_r[:], qc_r[:]
        d1 = dq(qv0, qc0)
        h = 0.5 * dt * sr
        d2 = dq(qv0 + h * d1, qc0 - h * d1)
        oqv[:] = qv0 + dt * sr * d2
        oqc[:] = qc0 - dt * sr * d2
        oth[:] = ti_r[:] - sr * (lhvw / exn) * d1

    spec = pl.BlockSpec((TX, ny, nz), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM)
    spec_if = pl.BlockSpec(
        (TX, ny, nz + 1), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec, spec_if, spec_if, spec, spec, spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), qv.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(t, p_if, exn_if, qv, qc, theta_tnd_in)
