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


# ------------------------------------------------------------------------------ #
# merged Shapiro smoothing + Smagorinsky RK2 (r5)                                #
# ------------------------------------------------------------------------------ #


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "nb", "dx", "dy", "cs", "dt", "tile_x", "interpret"
    ),
)
def fused_smoothing_smagorinsky_rk2(
    fields,
    gamma,
    *,
    order: int,
    nb: int,
    dx: float,
    dy: float,
    cs: float,
    dt: float,
    tile_x: int = 16,
    interpret: bool = False,
):
    """ONE kernel for the adjacent SUS processes ``IsentropicHorizontalSmoothing
    -> IsentropicSmagorinsky(rk2)`` (reference chain order
    ``drivers/.../driver_namelist_sus.py:183-471``): per x-tile, Shapiro-smooth
    all F fields in VMEM, then run BOTH Smagorinsky RK2 stages on the smoothed
    (s, su, sv) — the smoothed momenta (consumed only by the Smagorinsky
    update) never round-trip HBM, and neither do the stage-1 intermediates.
    Saves vs the two-kernel sequence: 2 writes + 3 reads of (nx, ny, nz)
    arrays and one kernel launch (~5 sweeps, BENCH_NOTES r5_smooth_smag).

    Args:
      fields: (s, su, sv[, q...]) raw state arrays, F = len(fields) >= 3.
      gamma: (F, nz) per-field smoothing coefficient (``fused_smoothing``).

    Returns:
      (s_smoothed, su_rk2, sv_rk2, *q_smoothed): bitwise the values of
      ``fused_smoothing`` followed by ``_smag_rk2_fused`` (same expression
      trees; pinned by tests/test_pallas_ops.py).
    """
    from jax import lax

    from tasmania_tpu.ops.smoothing_step import _CW_2D, _WEIGHTS

    fields = tuple(fields)
    F = len(fields)
    assert F >= 3
    nq = F - 3
    nx, ny, nz = fields[0].shape
    n = order
    H = 2                     # smag ring halo per stage
    assert nb >= n and nb >= H
    NXI = nx - 2 * nb
    TX = _pick_tile(NXI, min(tile_x, nx - 4 * H - 2 * n))
    assert TX >= 1, "grid too small for the merged smoothing+smag kernel"
    grid = (pl.cdiv(NXI, TX),)
    W1 = TX + 2 * H           # smag stage-1 columns   [t0-2, t0+TX+2)
    WS = W1 + 2 * H           # smoothed-momenta cols  [t0-4, t0+TX+4)
    WIN = WS + 2 * n          # raw input windows      [t0-4-n, ...), clamped
    PAD = max(1, 2 * H + n - nb)
    WQ = TX + 2 * n           # q windows (never clamp: n <= nb)
    cw = _CW_2D[order]
    weights = _WEIGHTS[order]
    jin = slice(nb, ny - nb)
    c1, c2 = 0.5 * dt, dt
    dtype = fields[0].dtype

    def kernel(*refs):
        g_ref = refs[0]
        s_ref, su_ref, sv_ref = refs[1:4]
        q_refs = refs[4 : 4 + nq]
        out_refs = refs[4 + nq : 4 + nq + 3 + nq]
        spad, supad, svpad = refs[4 + nq + 3 + nq :]

        pid = pl.program_id(0)
        t0 = nb + jnp.minimum(pid * TX, NXI - TX)
        nom = t0 - 2 * H - n
        delta = nom - jnp.clip(nom, 0, nx - WIN)

        def fill(pad, ref):
            pad[PAD : PAD + WIN] = ref[:]
            for p in range(PAD):
                pad[p : p + 1] = ref[0:1]
                pad[WIN + PAD + p : WIN + PAD + p + 1] = ref[WIN - 1 : WIN]

        fill(spad, s_ref)
        fill(supad, su_ref)
        fill(svpad, sv_ref)

        def smooth_window(pad, g, base_off, M):
            """Shapiro-smooth M columns whose nominal window offset is
            ``base_off`` (in units of the WIN fetch); global x-frame columns
            keep the raw value (``fused_smoothing`` writes interior only)."""
            center = pad[pl.ds(PAD + delta + base_off, M)]
            acc = (1.0 - cw * g) * center[:, jin]
            for off, wt in weights:
                acc = acc + wt * g * pad[pl.ds(PAD + delta + base_off + off, M)][:, jin]
            for off, wt in weights:
                acc = acc + wt * g * center[:, nb + off : ny - nb + off]
            sm = jnp.concatenate(
                [center[:, :nb], acc, center[:, ny - nb :]], axis=1
            )
            r = lax.broadcasted_iota(jnp.int32, (M, 1, 1), 0)
            xg = t0 - (2 * H + n) + base_off + r
            frame = (xg < nb) | (xg >= nx - nb)
            return jnp.where(frame, center, sm)

        gs = g_ref[0][None, None, :]
        gsu = g_ref[1][None, None, :]
        gsv = g_ref[2][None, None, :]
        s_sm = smooth_window(spad, gs, n, WS)       # cols [t0-4, t0+TX+4)
        su_sm = smooth_window(supad, gsu, n, WS)
        sv_sm = smooth_window(svpad, gsv, n, WS)

        out_refs[0][0:TX] = s_sm[2 * H : 2 * H + TX]

        # --- Smagorinsky RK2 on the smoothed fields (``_smag_rk2_fused``) -- #
        u0 = su_sm / s_sm
        v0 = sv_sm / s_sm
        ut1, vt1 = _smag_tendency(u0, v0, dx, dy, cs, W1, ny)
        yo = slice(nb - 2, ny - nb - 2)
        s_1 = s_sm[H : H + W1]
        sub_1 = su_sm[H : H + W1]
        svb_1 = sv_sm[H : H + W1]
        su1 = jnp.concatenate(
            [
                sub_1[:, :nb],
                sub_1[:, jin] + c1 * s_1[:, jin] * ut1[:, yo],
                sub_1[:, ny - nb :],
            ],
            axis=1,
        )
        sv1 = jnp.concatenate(
            [
                svb_1[:, :nb],
                svb_1[:, jin] + c1 * s_1[:, jin] * vt1[:, yo],
                svb_1[:, ny - nb :],
            ],
            axis=1,
        )
        r1 = lax.broadcasted_iota(jnp.int32, (W1, 1, 1), 0)
        xg1 = t0 - H + r1
        frame1 = (xg1 < nb) | (xg1 >= nx - nb)
        su1 = jnp.where(frame1, sub_1, su1)
        sv1 = jnp.where(frame1, svb_1, sv1)

        u1 = su1 / s_1
        v1 = sv1 / s_1
        ut2, vt2 = _smag_tendency(u1, v1, dx, dy, cs, TX, ny)
        s_t = s_sm[2 * H : 2 * H + TX]
        sub_t = su_sm[2 * H : 2 * H + TX]
        svb_t = sv_sm[2 * H : 2 * H + TX]
        out_refs[1][0:TX, jin] = sub_t[:, jin] + c2 * s_t[:, jin] * ut2[:, yo]
        out_refs[2][0:TX, jin] = svb_t[:, jin] + c2 * s_t[:, jin] * vt2[:, yo]
        out_refs[1][0:TX, 0:nb] = sub_t[:, 0:nb]
        out_refs[1][0:TX, ny - nb : ny] = sub_t[:, ny - nb : ny]
        out_refs[2][0:TX, 0:nb] = svb_t[:, 0:nb]
        out_refs[2][0:TX, ny - nb : ny] = svb_t[:, ny - nb : ny]

        # --- moist fields: smoothing only, on the tile ---------------------- #
        for k in range(nq):
            w = q_refs[k][:]              # (TX+2n, ny, nz)
            g = g_ref[3 + k][None, None, :]
            center = w[n : n + TX]
            acc = (1.0 - cw * g) * center[:, jin]
            for off, wt in weights:
                acc = acc + wt * g * w[n + off : n + TX + off, jin]
            for off, wt in weights:
                acc = acc + wt * g * center[:, nb + off : ny - nb + off]
            out_refs[3 + k][0:TX, jin] = acc
            out_refs[3 + k][0:TX, 0:nb] = center[:, 0:nb]
            out_refs[3 + k][0:TX, ny - nb : ny] = center[:, ny - nb : ny]

    in_spec = pl.BlockSpec(
        (pl.Element(WIN), pl.Element(ny), pl.Element(nz)),
        lambda ix: (
            jnp.clip(
                nb - 2 * H - n + jnp.minimum(ix * TX, NXI - TX), 0, nx - WIN
            ),
            0,
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    q_spec = pl.BlockSpec(
        (pl.Element(WQ), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb - n + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [in_spec] * 3
        + [q_spec] * nq,
        out_specs=[out_spec] * (3 + nq),
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), dtype)] * (3 + nq),
        scratch_shapes=[pltpu.VMEM((WIN + 2 * PAD, ny, nz), dtype)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gamma, *fields)
    from tasmania_tpu.ops.paste import paste_x_edges_multi

    return paste_x_edges_multi(
        outs,
        [phi[:nb] for phi in fields],
        [phi[nx - nb :] for phi in fields],
        interpret=interpret,
    )
