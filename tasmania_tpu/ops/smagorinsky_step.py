"""Pallas TPU kernel: fused Smagorinsky stage for the isentropic model.

One kernel evaluates the conservative-form Smagorinsky tendency
(reference ``src/tasmania/isentropic/physics/turbulence.py:38``,
velocity-form core ``physics/turbulence.py:210-227``) AND applies the RK
stage update ``out = base + c·s·T(u_st, v_st)`` in a single pass: read
(s, su_st, sv_st, su_base, sv_base) once per x-tile, write (su', sv') once.
The RK2 stepper (reference ``framework/subclasses/tendency_steppers/rk2.py``)
is two invocations:

  su1 = su0 + dt/2 · k(su0, sv0);   su' = su0 + dt · k(su1, sv1)

Tendencies are zero on the nb-frame (reference ``turbulence.py:103``), so the
frame of the output equals the base state; the kernel writes the x-interior
and the nb-wide x-edge columns are pasted afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tasmania_tpu.ops.advection_step import _clamp_start, _pick_tile


@functools.partial(
    jax.jit, static_argnames=("dx", "dy", "cs", "nb", "c", "tile_x", "interpret")
)
def _smag_stage(
    s, su_st, sv_st, su_base, sv_base, *, dx, dy, cs, nb, c, tile_x, interpret
):
    nx, ny, nz = s.shape
    H = 2  # stencil halo: one ring for strain, one for the divergence
    assert nb >= H
    NXI = nx - 2 * nb
    TX = _pick_tile(NXI, tile_x)
    grid = (pl.cdiv(NXI, TX),)
    jin = slice(nb, ny - nb)

    def kernel(s_ref, sus_ref, svs_ref, sub_ref, svb_ref, osu_ref, osv_ref):
        sw = s_ref[:]  # (TX+2H, ny, nz); window x = global [x0-2, x0+TX+2)
        u = sus_ref[:] / sw
        v = svs_ref[:] / sw

        # strain rate on the ring: window x-idx r in [1, TX+3), y-idx q in
        # [1, ny-1); ring arrays are indexed by (r-1, q-1)
        xm = slice(0, TX + 2)
        xp_ = slice(2, TX + 4)
        xc = slice(1, TX + 3)
        ym = slice(0, ny - 2)
        yp = slice(2, ny)
        yc = slice(1, ny - 1)
        s00 = (u[xp_, yc] - u[xm, yc]) / (2.0 * dx)
        s01 = 0.5 * (
            (u[xc, yp] - u[xc, ym]) / (2.0 * dy)
            + (v[xp_, yc] - v[xm, yc]) / (2.0 * dx)
        )
        s11 = (v[xc, yp] - v[xc, ym]) / (2.0 * dy)
        nu = cs**2 * dx * dy * (2.0 * (s00**2 + 2.0 * s01**2 + s11**2)) ** 0.5

        # flux divergence at tile points (window x-idx t in [2, TX+2),
        # y in [2, ny-2)); ring idx of (t, y) is (t-1, y-1)
        def ddx(f):
            return (f[2 : TX + 2, 1 : ny - 3] - f[0:TX, 1 : ny - 3]) / (2.0 * dx)

        def ddy(f):
            return (f[1 : TX + 1, 2 : ny - 2] - f[1 : TX + 1, 0 : ny - 4]) / (2.0 * dy)

        u_tnd = 2.0 * (ddx(nu * s00) + ddy(nu * s01))
        v_tnd = 2.0 * (ddx(nu * s01) + ddy(nu * s11))
        # u_tnd/v_tnd cover the x tile, y [2, ny-2); restrict to the y interior
        yo = slice(nb - 2, ny - nb - 2)  # within the (ny-4) frame
        s_in = sw[H : H + TX, jin]
        osu_ref[0:TX, jin] = sub_ref[H : H + TX, jin] + c * s_in * u_tnd[:, yo]
        osv_ref[0:TX, jin] = svb_ref[H : H + TX, jin] + c * s_in * v_tnd[:, yo]
        # y-frame: tendency is zero there
        osu_ref[0:TX, 0:nb] = sub_ref[H : H + TX, 0:nb]
        osu_ref[0:TX, ny - nb : ny] = sub_ref[H : H + TX, ny - nb : ny]
        osv_ref[0:TX, 0:nb] = svb_ref[H : H + TX, 0:nb]
        osv_ref[0:TX, ny - nb : ny] = svb_ref[H : H + TX, ny - nb : ny]

    in_spec_h = pl.BlockSpec(
        (pl.Element(TX + 2 * H), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb - H + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    osu, osv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec_h] * 5,
        out_specs=[out_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), s.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s, su_st, sv_st, su_base, sv_base)
    from tasmania_tpu.ops.paste import paste_x_edges_multi

    osu, osv = paste_x_edges_multi(
        (osu, osv),
        (su_base[:nb], sv_base[:nb]),
        (su_base[nx - nb :], sv_base[nx - nb :]),
        interpret=interpret,
    )
    return osu, osv


def _smag_tendency(u, v, dx, dy, cs, M, ny):
    """Conservative Smagorinsky tendency on M columns x y in [2, ny-2), from
    (M+4)-column velocity windows — the exact ``_smag_stage`` ring algebra,
    width-generalized."""
    xm = slice(0, M + 2)
    xp_ = slice(2, M + 4)
    xc = slice(1, M + 3)
    ym = slice(0, ny - 2)
    yp = slice(2, ny)
    yc = slice(1, ny - 1)
    s00 = (u[xp_, yc] - u[xm, yc]) / (2.0 * dx)
    s01 = 0.5 * (
        (u[xc, yp] - u[xc, ym]) / (2.0 * dy)
        + (v[xp_, yc] - v[xm, yc]) / (2.0 * dx)
    )
    s11 = (v[xc, yp] - v[xc, ym]) / (2.0 * dy)
    nu = cs**2 * dx * dy * (2.0 * (s00**2 + 2.0 * s01**2 + s11**2)) ** 0.5

    def ddx(f):
        return (f[2 : M + 2, 1 : ny - 3] - f[0:M, 1 : ny - 3]) / (2.0 * dx)

    def ddy(f):
        return (f[1 : M + 1, 2 : ny - 2] - f[1 : M + 1, 0 : ny - 4]) / (2.0 * dy)

    u_tnd = 2.0 * (ddx(nu * s00) + ddy(nu * s01))
    v_tnd = 2.0 * (ddx(nu * s01) + ddy(nu * s11))
    return u_tnd, v_tnd


@functools.partial(
    jax.jit,
    static_argnames=("dx", "dy", "cs", "nb", "dt", "tile_x", "interpret"),
)
def _smag_rk2_fused(s, su, sv, *, dx, dy, cs, nb, dt, tile_x, interpret):
    """BOTH RK2 stages in ONE kernel: stage 1 is evaluated on a 4-wider
    column window in VMEM, so the su1/sv1 intermediates never touch HBM and
    the second kernel launch + its paste disappear (r5; the two-launch path
    remains as ``_smag_stage`` for comparison).  Stage-1 values at global
    frame columns/rows are the BASE state (the two-launch path's paste/
    y-frame semantics), selected by global-position masks."""
    from jax import lax

    nx, ny, nz = s.shape
    H = 2
    assert nb >= H
    NXI = nx - 2 * nb
    TX = _pick_tile(NXI, tile_x)
    grid = (pl.cdiv(NXI, TX),)
    jin = slice(nb, ny - nb)
    W1 = TX + 2 * H          # stage-1 columns [t0-2, t0+TX+2)
    WIN = TX + 4 * H         # input windows  [t0-4, t0+TX+4), clamped
    _P = 1                   # scratch pad columns (window overhang <= 1)
    c1, c2 = 0.5 * dt, dt
    dtype = s.dtype

    def kernel(s_ref, su_ref, sv_ref, osu_ref, osv_ref, spad, supad, svpad):
        pid = pl.program_id(0)
        t0 = nb + jnp.minimum(pid * TX, NXI - TX)
        nom = t0 - 2 * H
        delta = nom - jnp.clip(nom, 0, nx - WIN)

        def fill(pad, ref):
            pad[_P : _P + WIN] = ref[:]
            for p in range(_P):
                pad[p : p + 1] = ref[0:1]
                pad[WIN + _P + p : WIN + _P + p + 1] = ref[WIN - 1 : WIN]

        fill(spad, s_ref)
        fill(supad, su_ref)
        fill(svpad, sv_ref)
        sw = spad[pl.ds(_P + delta, WIN)]
        suw = supad[pl.ds(_P + delta, WIN)]
        svw = svpad[pl.ds(_P + delta, WIN)]

        u0 = suw / sw
        v0 = svw / sw
        ut1, vt1 = _smag_tendency(u0, v0, dx, dy, cs, W1, ny)
        yo = slice(nb - 2, ny - nb - 2)
        s_1 = sw[H : H + W1]
        sub_1 = suw[H : H + W1]          # base == stage-1 input state
        svb_1 = svw[H : H + W1]
        su1_in = sub_1[:, jin] + c1 * s_1[:, jin] * ut1[:, yo]
        sv1_in = svb_1[:, jin] + c1 * s_1[:, jin] * vt1[:, yo]
        su1 = jnp.concatenate(
            [sub_1[:, :nb], su1_in, sub_1[:, ny - nb :]], axis=1
        )
        sv1 = jnp.concatenate(
            [svb_1[:, :nb], sv1_in, svb_1[:, ny - nb :]], axis=1
        )
        # global x-frame columns keep the base (the two-launch path's paste)
        r1 = lax.broadcasted_iota(jnp.int32, (W1, 1, 1), 0)
        xg = t0 - H + r1
        frame1 = (xg < nb) | (xg >= nx - nb)
        su1 = jnp.where(frame1, sub_1, su1)
        sv1 = jnp.where(frame1, svb_1, sv1)

        u1 = su1 / s_1
        v1 = sv1 / s_1
        ut2, vt2 = _smag_tendency(u1, v1, dx, dy, cs, TX, ny)
        s_t = sw[2 * H : 2 * H + TX]
        sub_t = suw[2 * H : 2 * H + TX]
        svb_t = svw[2 * H : 2 * H + TX]
        osu_ref[0:TX, jin] = sub_t[:, jin] + c2 * s_t[:, jin] * ut2[:, yo]
        osv_ref[0:TX, jin] = svb_t[:, jin] + c2 * s_t[:, jin] * vt2[:, yo]
        osu_ref[0:TX, 0:nb] = sub_t[:, 0:nb]
        osu_ref[0:TX, ny - nb : ny] = sub_t[:, ny - nb : ny]
        osv_ref[0:TX, 0:nb] = svb_t[:, 0:nb]
        osv_ref[0:TX, ny - nb : ny] = svb_t[:, ny - nb : ny]

    in_spec = pl.BlockSpec(
        (pl.Element(WIN), pl.Element(ny), pl.Element(nz)),
        lambda ix: (
            jnp.clip(
                nb - 2 * H + jnp.minimum(ix * TX, NXI - TX), 0, nx - WIN
            ),
            0,
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    osu, osv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 3,
        out_specs=[out_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((WIN + 2 * _P, ny, nz), dtype)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s, su, sv)
    from tasmania_tpu.ops.paste import paste_x_edges_multi

    return paste_x_edges_multi(
        (osu, osv),
        (su[:nb], sv[:nb]),
        (su[nx - nb :], sv[nx - nb :]),
        interpret=interpret,
    )


def fused_smagorinsky_rk2(
    s,
    su,
    sv,
    *,
    dx: float,
    dy: float,
    cs: float,
    nb: int,
    dt: float,
    tile_x: int = 32,
    interpret: bool = False,
):
    """Two-stage RK2 update of (su, sv) under the Smagorinsky closure.

    Default: the single-kernel whole-RK2 path (``_smag_rk2_fused``);
    ``TASMANIA_SMAG_FUSE=0`` selects the original two-launch pair."""
    import os

    nx = s.shape[0]
    TX = _pick_tile(nx - 2 * nb, tile_x)
    if os.environ.get("TASMANIA_SMAG_FUSE", "1") == "1" and nx >= TX + 8:
        return _smag_rk2_fused(
            s, su, sv, dx=dx, dy=dy, cs=cs, nb=nb, dt=dt, tile_x=tile_x,
            interpret=interpret,
        )
    kw = dict(dx=dx, dy=dy, cs=cs, nb=nb, tile_x=tile_x, interpret=interpret)
    su1, sv1 = _smag_stage(s, su, sv, su, sv, c=0.5 * dt, **kw)
    return _smag_stage(s, su1, sv1, su, sv, c=dt, **kw)
