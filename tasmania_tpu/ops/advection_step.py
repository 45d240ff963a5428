"""Pallas TPU kernels: fused horizontal advection / momentum steps.

The hot ops of the isentropic core (SURVEY.md §3.2 [HOT²]): for each advected
field φ,  ``out = φ_now − dt·(∂x F_x(u, φ_int) + ∂y F_y(v, φ_int) − tnd)``
on the nb-inset interior (reference
``subclasses/prognostics/utils.py:44 step_forward_euler``), and for the
momenta the same with the semi-implicit pressure-gradient source
``(1−eps)·s_now·∇mtg_now + eps·s_new·∇mtg_new`` computed IN the kernel
(reference ``utils.py:138 step_forward_euler_momentum``).

Design notes (measured on TPU v5e):
* fields are SEPARATE refs — stacking F 12 MB fields costs ~2F extra sweeps;
* outputs are fresh full-size buffers written on interior blocks (x-edge
  columns pasted after, nb~3 columns ≈ free); input aliasing would race the
  overlapping halo fetches if the pipeline were not double-buffered;
* x-tiles ride the leading (cheapest) grid dimension; blocks span full
  (ny, nz), which the TPU tiles as (sublane, lane);
* third/fifth-order upwind formulas match
  ``isentropic/dynamics/horizontal_fluxes.py`` exactly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x-tile size of the fused kernels.  With clamped overlapping tiles the size
# is free (no divisor constraint); measured on TPU v5e at the benchmark
# nx=161 (drivers/tune_tile.py): TX=12 is the sweet spot (advection+epilogue
# pair 0.839 ms vs 0.911 at 8, 0.915 at 20, 1.055 at the old divisor-bound 5);
# TX>=24 exceeds the VMEM budget in the epilogue kernel — note the
# (TX, ny, 1) gamma/hs windows pad their unit lane dim to 128, costing ~4 MB
# of VMEM each.  Overridable for tuning experiments.
_DEFAULT_TILE_X = int(os.environ.get("TASMANIA_TILE_X", "12"))


def _flux_3rd(w_f, pm2, pm1, p0, pp1):
    flux4 = w_f / 12.0 * (7.0 * (p0 + pm1) - (pp1 + pm2))
    return flux4 - jnp.abs(w_f) / 12.0 * (3.0 * (p0 - pm1) - (pp1 - pm2))


def _flux_5th(w_f, pm3, pm2, pm1, p0, pp1, pp2):
    flux6 = w_f / 60.0 * (37.0 * (p0 + pm1) - 8.0 * (pp1 + pm2) + (pp2 + pm3))
    return flux6 - jnp.abs(w_f) / 60.0 * (
        10.0 * (p0 - pm1) - 5.0 * (pp1 - pm2) + (pp2 - pm3)
    )


def _pick_tile(n: int, want: int) -> int:
    """x-tile size: simply min(want, n).  Tiles need NOT divide n — the
    index maps clamp the last tile's start to n - TX (``_clamp_start``), so
    it overlaps its predecessor and recomputes ``TX - n % TX`` columns with
    identical values.  At the benchmark size NXI = 155 = 5·31 this unlocks
    TX = 16 (halo re-read ratio (TX+2e)/TX = 1.375) where the divisor rule
    forced TX = 5 (ratio 2.2): ~15% less DMA traffic on the haloed operands
    for ~3%% recompute."""
    return min(want, n)


def _clamp_start(ix, TX, n):
    """Element start offset of tile ix over an n-element extent: the last
    tile starts at n - TX (overlapping writes repeat identical values)."""
    return jnp.minimum(ix * TX, n - TX)


def _div_tile(order, TX, ny, nb, dx, dy, uf, vf, phi):
    """Flux divergence on the (TX, ny-2nb) tile given the haloed int window
    phi (TX+2e, ny, nz) and face velocities uf (TX+1, ny, nz) /
    vf (TX, ny+1, nz)."""
    e = 2 if order == 3 else 3
    jin = slice(nb, ny - nb)
    flux = _flux_3rd if order == 3 else _flux_5th
    xs = [phi[k : TX + 1 + k, jin] for k in range(2 * e)]
    fx = flux(uf[:, jin], *xs)
    ys = [phi[e : e + TX, nb - e + k : ny - nb - e + 1 + k] for k in range(2 * e)]
    fy = flux(vf[:, nb : ny - nb + 1], *ys)
    return (fx[1:] - fx[:-1]) / dx + (fy[:, 1:] - fy[:, :-1]) / dy


def _paste_x_edges(outs, nows, nb, nx):
    return tuple(
        o.at[:nb].set(n[:nb]).at[nx - nb :].set(n[nx - nb :])
        for o, n in zip(outs, nows)
    )


def _specs(TX, e, ny, nz, nb, NXI):
    """(u, v, now/tnd/out, int) block specs shared by both kernels; tile
    starts are clamped so the last tile may overlap (``_pick_tile``)."""
    u_spec = pl.BlockSpec(
        (pl.Element(TX + 1), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    v_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny + 1), pl.Element(nz)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    c_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_spec = pl.BlockSpec(
        (pl.Element(TX + 2 * e), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb - e + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return u_spec, v_spec, c_spec, h_spec


def _clip_pos(x):
    """Positivity clip with the exact semantics of
    ``dwarfs.diagnostics.WaterConstituent._clip`` (a ``where``, not ``max``)."""
    return jnp.where(x > 0.0, x, jnp.zeros_like(x))


def _enforce_relaxed(phi, gamma, ref):
    """The relaxed-BC three-way select of ``boundaries/relaxed.py:133``:
    exact pinning at γ==1, identity at γ==0, lerp between."""
    return jnp.where(
        gamma == 0.0,
        phi,
        jnp.where(gamma == 1.0, ref, phi - gamma * (phi - ref)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "nb", "dt", "dx", "dy", "tile_x", "interpret", "q_product"
    ),
)
def fused_advection_fields(
    u,
    v,
    fields_now,
    fields_int,
    tnds=None,
    gamma=None,
    ref0=None,
    *,
    order: int = 3,
    nb: int = 3,
    dt: float = 1.0,
    dx: float = 1.0,
    dy: float = 1.0,
    tile_x: int = _DEFAULT_TILE_X,
    interpret: bool = False,
    q_product=None,
):
    """Step each field through one fused upwind advection update.

    Args:
      u: (nx+1, ny, nz) staggered x-velocity.
      v: (nx, ny+1, nz) staggered y-velocity.
      fields_now / fields_int: tuples of F (nx, ny, nz) base / provisional
        fields.
      tnds: optional tuple of F source terms, each (nx, ny, nz) or None.
      q_product: optional tuple of F bools; where True, the field enters as a
        MASS FRACTION q and the kernel advects the water density
        ``sq = clip(s·q)`` formed in VMEM from field 0 (the air density) — the
        three sq inputs never materialize in HBM (reference ``dycore.py:766-774``
        conversions fused into ``utils.py:44 step_forward_euler``).  Field 0
        must not be flagged.
      gamma / ref0: optional (nx, ny) relaxed-BC coefficients + (nx, ny, nz)
        reference field; when given, the relaxed lateral BC
        (``boundaries/relaxed.py:133``, reference ``rk3ws_si.py:183-189``) is
        applied to FIELD 0 in VMEM before the write-out — the un-enforced
        density never materializes in HBM.  The caller still owns the x-edge
        frame rows (paste + enforce on nb-wide strips).

    Returns:
      tuple of F (nx, ny, nz) stepped fields (nb-frame = now values; for
      flagged fields the stepped/pasted quantity is the density ``sq``).
    """
    fields_now = tuple(fields_now)
    fields_int = tuple(fields_int)
    F = len(fields_now)
    qp = tuple(q_product) if q_product is not None else (False,) * F
    assert len(qp) == F and not (qp and qp[0])
    nx, ny, nz = fields_now[0].shape
    e = 2 if order == 3 else 3
    assert order in (3, 5)
    assert nb >= e, f"nb={nb} must be >= extent {e}"
    NXI = nx - 2 * nb
    TX = _pick_tile(NXI, tile_x)
    has_tnd = tuple(
        (tnds[i] is not None) if tnds is not None else False for i in range(F)
    )
    tnd_args = [t for t in (tnds or []) if t is not None]
    jin = slice(nb, ny - nb)

    enforce0 = gamma is not None
    # gamma rides as (nx, ny, 1): Mosaic constrains a block's LAST TWO dims
    # (multiple-of-(8,128) or equal to the array's); a 2-D (TX, ny) block with
    # TX=5 is illegal, while a 3-D (TX, ny, 1) block tiles the unconstrained
    # leading dim (the round-2 bench regression, VERDICT.md weak #1)
    bc_args = [gamma[:, :, None], ref0] if enforce0 else []

    def kernel(*refs):
        u_ref, v_ref = refs[0], refs[1]
        now_refs = refs[2 : 2 + F]
        int_refs = refs[2 + F : 2 + 2 * F]
        t_refs = iter(refs[2 + 2 * F : 2 + 2 * F + len(tnd_args)])
        nbc = 2 + 2 * F + len(tnd_args)
        g_ref = refs[nbc] if enforce0 else None
        r_ref = refs[nbc + 1] if enforce0 else None
        out_refs = refs[nbc + len(bc_args) :]
        uf = u_ref[:]
        vf = v_ref[:]
        s_now = now_refs[0][:] if any(qp) else None
        s_int = int_refs[0][:] if any(qp) else None
        for f in range(F):
            if qp[f]:
                now = _clip_pos(s_now * now_refs[f][:])
                phi_int = _clip_pos(s_int * int_refs[f][:])
            else:
                now = now_refs[f][:]
                phi_int = int_refs[f][:]
            div = _div_tile(order, TX, ny, nb, dx, dy, uf, vf, phi_int)
            rhs = div - next(t_refs)[:, jin] if has_tnd[f] else div
            if f == 0 and enforce0:
                res = jnp.concatenate(
                    [now[:, 0:nb], now[:, jin] - dt * rhs, now[:, ny - nb :]],
                    axis=1,
                )
                out_refs[f][0:TX] = _enforce_relaxed(res, g_ref[:], r_ref[:])
            else:
                out_refs[f][0:TX, jin] = now[:, jin] - dt * rhs
                out_refs[f][0:TX, 0:nb] = now[:, 0:nb]
                out_refs[f][0:TX, ny - nb : ny] = now[:, ny - nb : ny]

    u_spec, v_spec, c_spec, h_spec = _specs(TX, e, ny, nz, nb, NXI)
    g_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(1)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(NXI, TX),),
        # the in-VMEM sq products push the scoped allocation slightly past
        # 100 MB at the benchmark size; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        in_specs=[u_spec, v_spec]
        + [c_spec] * F
        + [h_spec] * F
        + [c_spec] * len(tnd_args)
        + ([g_spec, c_spec] if enforce0 else []),
        out_specs=[c_spec] * F,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), fields_now[0].dtype)] * F,
        interpret=interpret,
    )(u, v, *fields_now, *fields_int, *tnd_args, *bc_args)
    # the x-edge paste mirrors the in-kernel quantity: the density product for
    # flagged fields (XLA computes only the sliced nb edge rows); with the
    # in-kernel BC, field 0's frame strips are enforced here (nb-wide, cheap)
    paste_now = tuple(
        _clip_pos(fields_now[0] * fn) if qpf else fn
        for fn, qpf in zip(fields_now, qp)
    )
    if enforce0:
        g3 = gamma[:, :, None]
        paste_now = (
            _enforce_relaxed(paste_now[0], g3, ref0),
        ) + paste_now[1:]
    return _paste_x_edges(outs, paste_now, nb, nx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "nb", "dt", "dx", "dy", "eps", "has_tnd", "tile_x", "interpret"
    ),
)
def fused_momentum_step(
    u,
    v,
    su_now,
    sv_now,
    su_int,
    sv_int,
    s_now,
    mtg_now,
    s_new,
    mtg_new,
    su_tnd=None,
    sv_tnd=None,
    *,
    order: int = 3,
    nb: int = 3,
    dt: float = 1.0,
    dx: float = 1.0,
    dy: float = 1.0,
    eps: float = 0.5,
    has_tnd: bool = False,
    tile_x: int = _DEFAULT_TILE_X,
    interpret: bool = False,
):
    """Momentum step with the semi-implicit pressure gradient fused in:
    ``su' = su_now − dt·(div(su_int) + pgx − su_tnd)`` where
    ``pgx = ((1−eps)·s_now·∂x mtg_now + eps·s_new·∂x mtg_new)``
    (reference ``subclasses/prognostics/utils.py:138``)."""
    nx, ny, nz = su_now.shape
    e = 2 if order == 3 else 3
    assert order in (3, 5) and nb >= e
    NXI = nx - 2 * nb
    TX = _pick_tile(NXI, tile_x)
    jin = slice(nb, ny - nb)
    tnd_args = [su_tnd, sv_tnd] if has_tnd else []

    def kernel(*refs):
        (u_ref, v_ref, sun_ref, svn_ref, sui_ref, svi_ref,
         sn_ref, mn_ref, sw_ref, mw_ref) = refs[:10]
        t_refs = refs[10 : 10 + len(tnd_args)]
        osu_ref, osv_ref = refs[10 + len(tnd_args) :]
        uf = u_ref[:]
        vf = v_ref[:]
        su_n = sun_ref[:]
        sv_n = svn_ref[:]

        div_su = _div_tile(order, TX, ny, nb, dx, dy, uf, vf, sui_ref[:])
        div_sv = _div_tile(order, TX, ny, nb, dx, dy, uf, vf, svi_ref[:])

        # pressure gradient on the tile: windows carry e >= 1 halo columns
        c = slice(e, e + TX)
        cp1 = slice(e + 1, e + TX + 1)
        cm1 = slice(e - 1, e + TX - 1)
        jp1 = slice(nb + 1, ny - nb + 1)
        jm1 = slice(nb - 1, ny - nb - 1)
        s_n = sn_ref[:]
        m_n = mn_ref[:]
        s_w = sw_ref[:]
        m_w = mw_ref[:]
        pgx = (1.0 - eps) * s_n[c, jin] * (m_n[cp1, jin] - m_n[cm1, jin]) / (
            2.0 * dx
        ) + eps * s_w[c, jin] * (m_w[cp1, jin] - m_w[cm1, jin]) / (2.0 * dx)
        pgy = (1.0 - eps) * s_n[c, jin] * (m_n[c, jp1] - m_n[c, jm1]) / (
            2.0 * dy
        ) + eps * s_w[c, jin] * (m_w[c, jp1] - m_w[c, jm1]) / (2.0 * dy)

        su_rhs = div_su + pgx
        sv_rhs = div_sv + pgy
        if tnd_args:
            su_rhs = su_rhs - t_refs[0][:, jin]
            sv_rhs = sv_rhs - t_refs[1][:, jin]
        osu_ref[0:TX, jin] = su_n[:, jin] - dt * su_rhs
        osv_ref[0:TX, jin] = sv_n[:, jin] - dt * sv_rhs
        osu_ref[0:TX, 0:nb] = su_n[:, 0:nb]
        osu_ref[0:TX, ny - nb : ny] = su_n[:, ny - nb : ny]
        osv_ref[0:TX, 0:nb] = sv_n[:, 0:nb]
        osv_ref[0:TX, ny - nb : ny] = sv_n[:, ny - nb : ny]

    u_spec, v_spec, c_spec, h_spec = _specs(TX, e, ny, nz, nb, NXI)
    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(NXI, TX),),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[u_spec, v_spec, c_spec, c_spec, h_spec, h_spec]
        + [h_spec] * 4
        + [c_spec] * len(tnd_args),
        out_specs=[c_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), su_now.dtype)] * 2,
        interpret=interpret,
    )(u, v, su_now, sv_now, su_int, sv_int, s_now, mtg_now, s_new, mtg_new,
      *tnd_args)
    return _paste_x_edges(outs, (su_now, sv_now), nb, nx)


@functools.partial(
    jax.jit,
    static_argnames=("order", "nb", "dt", "dx", "dy", "tile_x", "interpret"),
)
def fused_advection_step(
    u,
    v,
    phi_now,
    phi_int,
    tnd=None,
    *,
    order: int = 3,
    nb: int = 3,
    dt: float = 1.0,
    dx: float = 1.0,
    dy: float = 1.0,
    tile_x: int = _DEFAULT_TILE_X,
    interpret: bool = False,
):
    """Stacked-layout convenience wrapper over ``fused_advection_fields``
    (kept for oracle tests; the prognostics pass separate fields)."""
    F = phi_now.shape[0]
    outs = fused_advection_fields(
        u,
        v,
        tuple(phi_now[i] for i in range(F)),
        tuple(phi_int[i] for i in range(F)),
        tuple(tnd[i] for i in range(F)) if tnd is not None else None,
        order=order,
        nb=nb,
        dt=dt,
        dx=dx,
        dy=dy,
        tile_x=tile_x,
        interpret=interpret,
    )
    return jnp.stack(outs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "nb", "dt", "dtf", "dx", "dy", "eps", "nq", "do_damp",
        "has_tnd", "tile_x", "interpret",
    ),
)
def fused_momentum_epilogue(
    u,
    v,
    su_now,
    sv_now,
    su_int,
    sv_int,
    s_now,
    mtg_now,
    s_e,
    mtg_new,
    sqs,
    gamma,
    s_ref,
    su_ref,
    sv_ref,
    q_refs,
    rmat,
    su_tnd=None,
    sv_tnd=None,
    *,
    order: int = 3,
    nb: int = 3,
    dt: float = 1.0,
    dtf: float = 1.0,
    dx: float = 1.0,
    dy: float = 1.0,
    eps: float = 0.5,
    nq: int = 3,
    do_damp: bool = True,
    has_tnd: bool = False,
    tile_x: int = _DEFAULT_TILE_X,
    interpret: bool = False,
):
    """Momentum step + the WHOLE dycore stage epilogue in one kernel.

    Fuses, per x-tile in VMEM (reference ``dycore.py:798-842`` epilogue +
    ``utils.py:138 step_forward_euler_momentum``):

      1. momentum flux divergence + semi-implicit pressure gradient
         ``(1−eps)·s_now·∇mtg_now + eps·s_e·∇mtg_new``;
      2. water mass fractions ``q = clip(sq/s_e)`` (``dycore.py:798-806``);
      3. relaxed lateral BC on s, su, sv, q (``enforce_raw``, ``dycore.py:811``
         — note s is enforced a SECOND time here, matching the reference);
      4. Rayleigh damping ``φ − dtf·r(z)·(φ_now − φ_ref)`` on s, su, sv
         (``dycore.py:817-819``), with the stage-0 "now" capture ==
         ``s_now/su_now/sv_now`` (RK3WS-SI steps every stage from the captured
         state, so the damper's and the prognostic's "now" coincide);

    so none of su', sv', q, or the twice-enforced density round-trips HBM
    between the momentum stencil and the epilogue.  ``dt`` is the STAGE
    timestep, ``dtf`` the full one (the reference damps with the full dt).
    Velocity diagnosis stays outside (pointwise XLA; staggered faces would
    need cross-tile final values).

    Args:
      sqs: tuple of nq stepped water densities (kernel-A outputs).
      gamma: (nx, ny) relaxed coefficients; q_refs: tuple of nq reference
      mass fractions; rmat: (1, nz) Rayleigh profile (ignored unless do_damp).

    Returns:
      (s_f, su_f, sv_f, *q_f) full (nx, ny, nz) arrays (x-frame strips
      computed here in XLA with the same epilogue math).
    """
    nx, ny, nz = su_now.shape
    e = 2 if order == 3 else 3
    assert order in (3, 5) and nb >= e
    assert len(sqs) == nq and len(q_refs) == nq
    NXI = nx - 2 * nb
    TX = _pick_tile(NXI, tile_x)
    jin = slice(nb, ny - nb)
    tnd_args = [su_tnd, sv_tnd] if has_tnd else []
    dtype = su_now.dtype

    def kernel(*refs):
        (u_ref, v_ref, sun_ref, svn_ref, sui_ref, svi_ref,
         sn_ref, mn_ref, se_ref, mw_ref) = refs[:10]
        pos = 10
        sq_refs = refs[pos : pos + nq]
        pos += nq
        g_ref, sref_ref, suref_ref, svref_ref = refs[pos : pos + 4]
        pos += 4
        qref_refs = refs[pos : pos + nq]
        pos += nq
        rm_ref = refs[pos]
        pos += 1
        t_refs = refs[pos : pos + len(tnd_args)]
        out_refs = refs[pos + len(tnd_args) :]

        uf = u_ref[:]
        vf = v_ref[:]
        su_n = sun_ref[:]
        sv_n = svn_ref[:]

        div_su = _div_tile(order, TX, ny, nb, dx, dy, uf, vf, sui_ref[:])
        div_sv = _div_tile(order, TX, ny, nb, dx, dy, uf, vf, svi_ref[:])

        c = slice(e, e + TX)
        cp1 = slice(e + 1, e + TX + 1)
        cm1 = slice(e - 1, e + TX - 1)
        jp1 = slice(nb + 1, ny - nb + 1)
        jm1 = slice(nb - 1, ny - nb - 1)
        s_n = sn_ref[:]
        m_n = mn_ref[:]
        s_w = se_ref[:]
        m_w = mw_ref[:]
        pgx = (1.0 - eps) * s_n[c, jin] * (m_n[cp1, jin] - m_n[cm1, jin]) / (
            2.0 * dx
        ) + eps * s_w[c, jin] * (m_w[cp1, jin] - m_w[cm1, jin]) / (2.0 * dx)
        pgy = (1.0 - eps) * s_n[c, jin] * (m_n[c, jp1] - m_n[c, jm1]) / (
            2.0 * dy
        ) + eps * s_w[c, jin] * (m_w[c, jp1] - m_w[c, jm1]) / (2.0 * dy)

        su_rhs = div_su + pgx
        sv_rhs = div_sv + pgy
        if tnd_args:
            su_rhs = su_rhs - t_refs[0][:, jin]
            sv_rhs = sv_rhs - t_refs[1][:, jin]
        su_pre = jnp.concatenate(
            [su_n[:, 0:nb], su_n[:, jin] - dt * su_rhs, su_n[:, ny - nb :]],
            axis=1,
        )
        sv_pre = jnp.concatenate(
            [sv_n[:, 0:nb], sv_n[:, jin] - dt * sv_rhs, sv_n[:, ny - nb :]],
            axis=1,
        )

        g3 = g_ref[:]  # (TX, ny, 1), broadcasts over nz
        s_c = s_w[c]
        s_out = _enforce_relaxed(s_c, g3, sref_ref[:])
        su_out = _enforce_relaxed(su_pre, g3, suref_ref[:])
        sv_out = _enforce_relaxed(sv_pre, g3, svref_ref[:])
        if do_damp:
            r3 = rm_ref[:][:, None, :]  # (1, nz) -> (1, 1, nz)
            s_out = s_out - dtf * r3 * (s_n[c] - sref_ref[:])
            su_out = su_out - dtf * r3 * (su_n - suref_ref[:])
            sv_out = sv_out - dtf * r3 * (sv_n - svref_ref[:])
        out_refs[0][0:TX] = s_out
        out_refs[1][0:TX] = su_out
        out_refs[2][0:TX] = sv_out
        for k in range(nq):
            q_f = _clip_pos(sq_refs[k][:] / s_c)
            out_refs[3 + k][0:TX] = _enforce_relaxed(q_f, g3, qref_refs[k][:])

    u_spec, v_spec, c_spec, h_spec = _specs(TX, e, ny, nz, nb, NXI)
    # gamma as (nx, ny, 1): only the LAST TWO block dims are tiling-constrained
    # on TPU, so the x-tile must ride a leading dim (see fused_advection_fields)
    g_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(1)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    r_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(nz)),
        lambda ix: (0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(NXI, TX),),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        in_specs=[u_spec, v_spec, c_spec, c_spec, h_spec, h_spec]
        + [h_spec] * 4
        + [c_spec] * nq
        + [g_spec, c_spec, c_spec, c_spec]
        + [c_spec] * nq
        + [r_spec]
        + [c_spec] * len(tnd_args),
        out_specs=[c_spec] * (3 + nq),
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), dtype)] * (3 + nq),
        interpret=interpret,
    )(u, v, su_now, sv_now, su_int, sv_int, s_now, mtg_now, s_e, mtg_new,
      *sqs, gamma[:, :, None], s_ref, su_ref, sv_ref, *q_refs, rmat,
      *tnd_args)

    # x-frame strips (nb rows each end): identical epilogue math in XLA on
    # nb-wide slices — the kernel only owns the interior rows
    def strips(sl):
        g3 = gamma[sl][:, :, None]
        s_c = s_e[sl]
        s_f = _enforce_relaxed(s_c, g3, s_ref[sl])
        su_f = _enforce_relaxed(su_now[sl], g3, su_ref[sl])
        sv_f = _enforce_relaxed(sv_now[sl], g3, sv_ref[sl])
        if do_damp:
            r3 = rmat[:, None, :]
            s_f = s_f - dtf * r3 * (s_now[sl] - s_ref[sl])
            su_f = su_f - dtf * r3 * (su_now[sl] - su_ref[sl])
            sv_f = sv_f - dtf * r3 * (sv_now[sl] - sv_ref[sl])
        qs_f = [
            _enforce_relaxed(_clip_pos(sq[sl] / s_c), g3, qr[sl])
            for sq, qr in zip(sqs, q_refs)
        ]
        return [s_f, su_f, sv_f] + qs_f

    lo = strips(slice(0, nb))
    hi = strips(slice(nx - nb, nx))
    return tuple(
        o.at[:nb].set(l).at[nx - nb :].set(h)
        for o, l, h in zip(outs, lo, hi)
    )
