"""Pallas TPU kernel: ONE whole semi-implicit stage of the isentropic core.

Fuses, per x-tile in VMEM, everything the dycore does in a stage (reference
call stack SURVEY.md §3.2: ``rk3ws_si.py:105-231`` + ``dycore.py:766-842``):

  1. density (+ water-density) advection with the relaxed lateral BC
     (``subclasses/prognostics/utils.py:44 step_forward_euler``,
     ``boundaries/relaxed.py:133``);
  2. the Montgomery potential of the stepped, enforced density — the
     column-local hydrostatic/Exner scans expressed as triangular-matrix
     contractions on the MXU (``isentropic/dynamics/diagnostics.py:320-406``;
     same recurrences as ``ops/diagnostics_step.py``) — computed on a haloed
     window so the pressure-gradient x-derivative never leaves VMEM;
  3. momentum advection with the semi-implicit pressure gradient
     ``(1-eps)·s_now·∇mtg_now + eps·s_new·∇mtg_new``
     (``utils.py:138 step_forward_euler_momentum``);
  4. the stage epilogue: mass fractions ``q = clip(sq/s_new)``, relaxed BC on
     every prognostic field, Rayleigh damping (``dycore.py:798-842``);
  5. (``with_velocities``) the staggered velocity diagnosis from the FINAL
     density and momenta (``dwarfs/diagnostics.py get_velocity_components``,
     reference ``diagnostics.py:125``) — the momentum update is extended one
     column left (VX = 1) so the u-face between tiles sees both final cells.

Versus the two-kernel path (``advection_step.fused_advection_fields`` +
standalone Montgomery + ``fused_momentum_epilogue`` + an XLA velocity pass)
this saves per stage: the u/v/s_now re-reads, the s_new and mtg_new HBM
round-trips, the 5-sweep velocity pass, and — via band-restricted
constants — most of the BC-reference traffic: su/sv/q references ride as
(nx, 16, nz) y-band strips (the relaxed band is nr <= 8 rows; x-band columns
are finished OUTSIDE the kernel, see below) and the damping references as
(nx, ny, damp_depth) top slabs.

Column ownership:
  * kernel tiles own interior columns [nb, nx-nb) (u faces [nb, nx-nb)),
    writing final values for x in [nr, nx-nr) ("core rows") and RAW
    (un-enforced, un-damped) updates for the x-band rows [nb, nr) and
    [nx-nr, nx-nb) — the caller applies BC+damping to those few columns in
    XLA (cheap, and it keeps per-row reference gathers out of the kernel);
  * the nb-wide x-frame is composed by the caller from "now" values, exactly
    like the two-kernel path; velocity faces touching band/frame cells are
    recomputed by the caller from the finished fields.

The stage reproduces the two-kernel path to machine precision (same slicing
algebra; the band/slab restrictions only skip arithmetic that is an exact
identity where gamma == 0 / rmat == 0; the Montgomery contraction may differ
by ~1 ulp because it groups TX+2+VX columns per matmul where the standalone
kernel groups TX); the equivalence is pinned by ``tests/test_si_stage.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from tasmania_tpu.ops.advection_step import (
    _clip_pos,
    _enforce_relaxed,
    _flux_3rd,
    _flux_5th,
)
from tasmania_tpu.ops.diagnostics_step import _scan_matmul, _tri

_YB = 8  # y-band strip half-width carried per reference field (>= nr, 8-aligned)
_P = 2   # scratch pad columns per side (covers window overhang <= 2)

# on-chip tuned.  r4 (XLA band epilogue): 16 best (0.659 ms vs 0.675 at
# 8/12; >=20 exceeds VMEM).  r5 (in-kernel band + frame pipeline): 12 best —
# 7.08e8 vs 6.8-6.9e8 at 16 end-to-end; 20 fails the remote compile
# (BENCH_NOTES r5_stage_tile_retune).
_STAGE_TILE_X = int(os.environ.get("TASMANIA_TILE_X_STAGE", "12"))


def tile_and_band(nx, order, nb, nr, tile_x, with_velocities=False):
    """Static tile geometry shared by the kernel and its callers: (TX, NPROG,
    BW, band_ik).  ``band_ik`` = the first/last tile own the x-band columns
    exclusively, so the kernel can finish them in-VMEM (see ``fused_si_stage``
    Column ownership); callers use it to decide the frame-pipeline mode."""
    e = 2 if order == 3 else 3
    VX = 1 if with_velocities else 0
    NXI = nx - 2 * nb
    WIN_CAP = nx - (2 + VX + 2 * e)
    TX = min(tile_x, NXI, WIN_CAP)
    if TX < 1:
        return TX, 0, nr - nb, False
    NPROG = -(-NXI // TX)
    BW = nr - nb
    band_ik = BW > 0 and TX >= 2 * BW and (NPROG == 1 or NXI - TX >= BW)
    return TX, NPROG, BW, band_ik


def compute_frame_strips(
    sl, s_now, su_now, sv_now, q_now, gamma, s_ref, su_ref, sv_ref, q_refs,
    rmat, dtf, do_damp,
):
    """The keep-now x-frame values on slice ``sl`` — EXACTLY the kernel
    epilogue's ``frame_vals`` (compose from "now": single-enforce s, clip
    mass fractions, enforce everything, damp) so pipelined stages can overlay
    the previous stage's frame columns bitwise."""
    gsl = gamma[sl][:, :, None]
    r3 = rmat[:, None, :] if do_damp else None
    s_e = _enforce_relaxed(s_now[sl], gsl, s_ref[sl])
    q_raw = [_clip_pos(_clip_pos(s_now[sl] * qn[sl]) / s_e) for qn in q_now]
    s_f = _enforce_relaxed(s_e, gsl, s_ref[sl])
    su_f = _enforce_relaxed(su_now[sl], gsl, su_ref[sl])
    sv_f = _enforce_relaxed(sv_now[sl], gsl, sv_ref[sl])
    if do_damp:
        s_f = s_f - dtf * r3 * (s_now[sl] - s_ref[sl])
        su_f = su_f - dtf * r3 * (su_now[sl] - su_ref[sl])
        sv_f = sv_f - dtf * r3 * (sv_now[sl] - sv_ref[sl])
    q_f = [_enforce_relaxed(qr, gsl, ref[sl]) for qr, ref in zip(q_raw, q_refs)]
    return [s_f, su_f, sv_f] + q_f


def _div_from_views(order, dx, dy, nb, ny, uf, vf, xs, ybase):
    """Flux divergence over W columns x [nb, ny-nb) rows, given the 2e
    face-aligned x-views xs (each (W+1, ny, nz)) and the center window ybase
    ((W, ny, nz)) for the y-fluxes; uf (W+1, ny, nz) faces, vf (W, ny+1, nz).
    Same arithmetic as ``advection_step._div_tile``."""
    e = 2 if order == 3 else 3
    jin = slice(nb, ny - nb)
    flux = _flux_3rd if order == 3 else _flux_5th
    fx = flux(uf[:, jin], *[x[:, jin] for x in xs])
    ys = [ybase[:, nb - e + k : ny - nb - e + 1 + k] for k in range(2 * e)]
    fy = flux(vf[:, nb : ny - nb + 1], *ys)
    return (fx[1:] - fx[:-1]) / dx + (fy[:, 1:] - fy[:, :-1]) / dy


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "nb", "nr", "dt", "dtf", "dx", "dy", "eps",
        "pt", "dz", "g", "cp", "rd", "pref",
        "nq", "do_damp", "dd", "with_velocities", "derive_velocities",
        "tile_x", "skip_xband", "interpret",
        "dist", "gnx", "gny", "yb", "epi_w",
        "overlay_frame", "finish_frame",
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
    with_velocities: bool = False,
    derive_velocities: bool = False,
    tile_x: int = _STAGE_TILE_X,
    skip_xband: bool = False,
    interpret: bool = False,
    dist: bool = False,
    goff=None,       # traced int32 (2,): global coords of local cell (0, 0)
    gnx: int = 0,    # global physical-grid extents (dist only)
    gny: int = 0,
    yb: int = _YB,   # in-kernel y-band enforcement depth (dist: >= pad_y + nr)
    epi_w: int = 0,  # x-epilogue strip width (dist: pad_x + nr; 0 = nr-by-nb default)
    overlay_frame: bool = False,  # int-state frame columns ride in as strips
    frame_lo=None,   # tuple (s, su, sv, *q) of (nb, ny, nz) strips
    frame_hi=None,
    finish_frame: bool = True,    # False: leave output frame columns raw
):
    """One fused SI stage; returns (s_f, su_f, sv_f, *q_f[, u_f, v_f]),
    full arrays (staggered u (nx+1, ny, nz) / v (nx, ny+1, nz) when
    ``with_velocities``; their outermost faces are ZERO — callers apply
    ``set_outermost_layers_x/y``, matching ``get_velocity_components``).

    ``dist`` mode (shard_map, VERDICT r4 weak #1): the operands are one
    shard's halo-extended local block and every frame/band decision becomes a
    GLOBAL-coordinate test against ``goff``/``gnx``/``gny`` — the relaxed
    band and the keep-now frame exist only where the global gamma/position
    say so (reference ``domain/horizontal_boundary.py:159-434`` enforce
    sites), so interior shards advect every local cell and edge shards
    reproduce the single-device edge treatment exactly.  The caller owes a
    post-stage halo exchange (``DistributedBoundary.post_stage_sync``) and a
    local halo pad >= nb + 1 on sharded axes (the Montgomery gradient at the
    first owned column reads the advected density one cell into the halo)."""
    nx, ny, nz = s_now.shape
    e = 2 if order == 3 else 3
    assert order in (3, 5) and nb >= e
    if dist:
        assert goff is not None and gnx > 0 and gny > 0
        assert not with_velocities, "dist mode derives or defers velocities"
    else:
        assert yb == _YB and epi_w == 0 and goff is None
    # derive_velocities (r4): for stages whose "int" state is the previous
    # stage's FINISHED output, the advective velocities are exactly the
    # staggered divides of (s_int, su_int, sv_int) — the faces this kernel
    # consumes (global [nb-1, nx-nb+2) / [nb, ny-nb+1)) never touch the
    # set_outermost-pinned global faces, so deriving them in-kernel from the
    # already-fetched stencil windows is bitwise identical to the XLA
    # velocity pass while saving its 5 HBM sweeps and the u/v input reads.
    # NOT valid for stage 0: the step-input u/v are physics-produced
    # (vertical advection updates momenta AFTER IsentropicVelocityComponents
    # ran), so they are not the divide of the current s/su/sv.
    assert not (derive_velocities and with_velocities)
    if derive_velocities:
        assert u is None and v is None
    assert nr <= yb <= ny // 2 and nb <= nr
    assert len(q_now) == len(q_int) == len(q_refs) == nq
    NXI = nx - 2 * nb
    VX = 1 if with_velocities else 0
    # the widest window (s stencil, Wm + 2e) must fit in the array
    TX, NPROG, BW, band_ik = tile_and_band(
        nx, order, nb, nr, tile_x, with_velocities
    )
    assert TX >= 1, "grid too small for the fused stage (use the 2-kernel path)"
    # in-kernel x-band finishing (r5): the first/last tile apply the FULL
    # per-row lateral BC + damping to the band columns they own (the full
    # reference fields are in scope — only their 2*BW band columns ride into
    # VMEM), so the XLA epilogue shrinks to the nb-wide keep-now frame.
    # Requires the band columns to be owned by pid 0 / the last pid ALONE:
    # the clamped last tile must not reach back into the left band
    # (NXI - TX >= BW), and a single tile must fit both bands disjointly.
    # TASMANIA_BAND_IK=0 restores the XLA band epilogue (perf A/B knob; read
    # at trace time — one variant per process, like TASMANIA_TILE_X_STAGE)
    band_ik = (
        band_ik and not dist and os.environ.get("TASMANIA_BAND_IK", "1") == "1"
    )
    # frame pipeline (r5): intermediate stages of a fused RK step neither
    # paste nor recompute the keep-now x-frame — the NEXT stage overlays the
    # (step-invariant per damp-config) frame strips into its stencil windows,
    # and only the final stage pays one nb-wide paste.  Both modes require
    # the in-kernel band.
    overlay_eff = overlay_frame and band_ik
    finish_eff = finish_frame or not band_ik
    if overlay_eff:
        assert frame_lo is not None and frame_hi is not None
        assert len(frame_lo) == len(frame_hi) == 3 + nq
        assert not with_velocities
    Wm = TX + 2 + VX        # density/Montgomery window, cells [t0-1-VX, t0+TX+1)
    Wp = TX + VX            # momentum window, cells [t0-VX, t0+TX)
    WIN_S = Wm + 2 * e      # s_int stencil fetch
    WIN_M = Wp + 2 * e      # su/sv_int stencil fetch
    jin = slice(nb, ny - nb)
    dtype = s_now.dtype
    dd_eff = dd if do_damp else 1


    def kernel(*refs):
        refs, spad_ref, supad_ref, svpad_ref = refs[:-3], *refs[-3:]
        if dist:
            goff_ref = refs[0]
            refs = refs[1:]
            gx0 = goff_ref[0]
            gy0 = goff_ref[1]
        if derive_velocities:
            (sn_ref, si_ref) = refs[:2]
            u_ref = v_ref = None
            pos = 2
        else:
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
        if band_ik:
            surb_ref, svrb_ref = refs[pos : pos + 2]; pos += 2
            qrb_refs = refs[pos : pos + nq]; pos += nq
        if overlay_eff:
            flo_refs = refs[pos : pos + 3 + nq]; pos += 3 + nq
            fhi_refs = refs[pos : pos + 3 + nq]; pos += 3 + nq
        out_refs = refs[pos:]

        pid = pl.program_id(0)
        cs = jnp.minimum(pid * TX, NXI - TX)
        t0 = nb + cs

        def fill_pad(pad, win, W):
            """win (W, ny, nz) -> pad (W+2P, ny, nz) with edge duplicates."""
            pad[_P : _P + W] = win
            for p in range(_P):
                pad[p : p + 1] = win[:1]
                pad[W + _P + p : W + _P + p + 1] = win[-1:]

        # s_int stencil window: nominal [t0-1-VX-e, t0+TX+1+e), fetched at
        # the array-clamped a0 and re-centred via edge-duplicate scratch
        # padding + dynamic ref reads (pl.ds) — Mosaic has no lowering for
        # dynamic_slice on values, and a clamped slice would SHIFT the whole
        # view, corrupting every column rather than just the masked frame
        # columns that consume the duplicate values.
        nom_s = t0 - 1 - VX - e
        del_s = nom_s - jnp.clip(nom_s, 0, nx - WIN_S)
        fill_pad(spad_ref, si_ref[:], WIN_S)
        nom_m = t0 - VX - e
        del_m = nom_m - jnp.clip(nom_m, 0, nx - WIN_M)
        fill_pad(supad_ref, sui_ref[:], WIN_M)
        fill_pad(svpad_ref, svi_ref[:], WIN_M)

        if overlay_eff:
            # the int-state arrays carry RAW frame columns (the previous
            # stage skipped its paste): overwrite every pad position that
            # corresponds to a GLOBAL frame column with the strip value.
            # Column-by-column, global-coordinate logic — ANY tile whose
            # clamped window reaches a frame column gets the overlay, not
            # just the first/last tile (at small nx an interior tile's
            # window spans a frame, r5 NaN bug).  A column outside this
            # tile's window degenerates to a no-op rewrite at a clamped
            # position.  Unconditional read-select-write: pl.when write
            # blocks measured -7% end-to-end here (r5).
            def overlay(pad, width, cstart, lo_strip, hi_strip):
                ptot = width + 2 * _P
                for g in list(range(nb)) + list(range(nx - nb, nx)):
                    pos = jnp.clip(_P + g - cstart, 0, ptot - 1)
                    if g < nb:
                        in_win = cstart <= g
                        val = lo_strip[g : g + 1]
                    else:
                        in_win = cstart + width > g
                        val = hi_strip[g - (nx - nb) : g - (nx - nb) + 1]
                    cur = pad[pl.ds(pos, 1)]
                    pad[pl.ds(pos, 1)] = jnp.where(in_win, val, cur)

            cstart_s = nom_s - del_s
            cstart_m = nom_m - del_m
            overlay(spad_ref, WIN_S, cstart_s, flo_refs[0], fhi_refs[0])
            overlay(supad_ref, WIN_M, cstart_m, flo_refs[1], fhi_refs[1])
            overlay(svpad_ref, WIN_M, cstart_m, flo_refs[2], fhi_refs[2])

        if derive_velocities:
            # u faces [t0-1-VX, t0+TX+2) need cells [t0-2-VX, t0+TX+2) of
            # s_int/su_int — always real array cells (t0 >= nb >= e >= 2)
            # inside the already-filled stencil pads
            scm = spad_ref[pl.ds(_P + del_s + e - 1, TX + 4 + VX)]
            sucm = supad_ref[pl.ds(_P + del_m + e - 2, TX + 4 + VX)]
            uf = (sucm[:-1] + sucm[1:]) / (scm[:-1] + scm[1:])
            # v faces [nb, ny-nb+1) from cells of the Wm window; outermost
            # (never-consumed) y faces zero-filled
            sc_wm = spad_ref[pl.ds(_P + del_s + e, Wm)]
            svc_wm = svpad_ref[pl.ds(_P + del_m + e - 1, Wm)]
            v_in = (svc_wm[:, :-1] + svc_wm[:, 1:]) / (
                sc_wm[:, :-1] + sc_wm[:, 1:]
            )
            zvf = jnp.zeros_like(v_in[:, :1])
            vf = jnp.concatenate([zvf, v_in, zvf], axis=1)
        else:
            uf = u_ref[:]        # (TX+3+VX, ny, nz) faces [t0-1-VX, t0+TX+2)
            vf = v_ref[:]        # (Wm, ny+1, nz)
        s_now_w = sn_ref[:]      # (Wm, ny, nz)

        # --- density advection on the Wm window --------------------------- #
        xs = [spad_ref[pl.ds(_P + del_s + k, Wm + 1)] for k in range(2 * e)]
        ybase_s = spad_ref[pl.ds(_P + del_s + e, Wm)]
        div_s = _div_from_views(order, dx, dy, nb, ny, uf, vf, xs, ybase_s)
        s_adv = s_now_w[:, jin] - dt * div_s
        s_res = jnp.concatenate(
            [s_now_w[:, :nb], s_adv, s_now_w[:, ny - nb :]], axis=1
        )
        r1 = lax.broadcasted_iota(jnp.int32, (Wm, 1, 1), 0)
        xg1 = t0 - 1 - VX + r1
        if dist:
            # global-coordinate frame: keep "now" wherever the SINGLE-DEVICE
            # stencil would not write — within nb of a GLOBAL edge (x and y);
            # out-of-domain ghost columns (negative coords) land in the same
            # bucket (their values are discarded by the post-stage exchange)
            xg1g = gx0 + xg1
            cyg = gy0 + lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
            yframe = (cyg < nb) | (cyg >= gny - nb)
            frame1 = (xg1g < nb) | (xg1g >= gnx - nb) | yframe
        else:
            frame1 = (xg1 < nb) | (xg1 >= nx - nb)
        s_res = jnp.where(frame1, s_now_w, s_res)
        s_e_wm = _enforce_relaxed(s_res, g_ref[:], sref_ref[:])

        # --- Montgomery of the enforced density (MXU scans) --------------- #
        if os.environ.get("TASMANIA_SKIP_MTG") == "1":
            # TIMING-ONLY probe (wrong values): attribute the in-kernel
            # Montgomery recompute (two MXU triangular contractions at
            # HIGHEST precision + the Exner power) — trace-time env read,
            # one variant per process
            mtg_wm = mn_ref[:]
        else:
            hs_w = hs_ref[:]                   # (Wm, ny, 1)
            theta_s = th_ref[0, nz]
            p_rest = _scan_matmul(
                g * dz * s_e_wm, _tri(nz, dtype, lower_incl=True)
            )
            p = jnp.concatenate(
                [jnp.full_like(s_e_wm[..., :1], pt), pt + p_rest], axis=-1
            )
            exn = cp * (p / pref) ** (rd / cp)
            mtg_s = theta_s * exn[..., nz : nz + 1] + g * hs_w
            base = mtg_s + 0.5 * dz * exn[..., nz : nz + 1]
            rsum = _scan_matmul(
                dz * exn[..., 1:nz], _tri(nz - 1, dtype, lower_incl=False)
            )
            mtg_wm = jnp.concatenate([base + rsum, base], axis=-1)

        # --- window views --------------------------------------------------- #
        cwp = slice(1, 1 + Wp)          # Wp cells within the Wm window
        ctm = slice(1 + VX, 1 + VX + TX)  # tile cells within Wm
        ctp = slice(VX, VX + TX)          # tile cells within Wp
        uf_p = uf[1 : Wp + 2]             # faces for the Wp divergence
        vf_p = vf[1 : 1 + Wp]
        uf_t = uf[1 + VX : 1 + VX + TX + 1]
        vf_t = vf[1 + VX : 1 + VX + TX]
        s_now_p = s_now_w[cwp]
        s_now_t = s_now_w[ctm]
        s_e_p = s_e_wm[cwp]
        s_e_t = s_e_wm[ctm]
        sref_p = sref_ref[:][cwp]
        g_p = g_ref[:][cwp]
        g_t = g_ref[:][ctm]
        rp = lax.broadcasted_iota(jnp.int32, (Wp, 1, 1), 0)
        rt = lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0)
        if dist:
            # global x-band: columns within nr of a GLOBAL x-edge carry raw
            # updates (gamma spans every row there; the XLA epilogue owns
            # their full-ny enforcement) — interior shards have none
            xgp = gx0 + t0 - VX + rp
            band_p = (xgp < nr) | (xgp >= gnx - nr)
            xgt = gx0 + t0 + rt
            band_t = (xgt < nr) | (xgt >= gnx - nr)
        else:
            band_p = ((t0 - VX + rp) < nr) | ((t0 - VX + rp) >= nx - nr)
            band_t = ((t0 + rt) < nr) | ((t0 + rt) >= nx - nr)

        def div_p(pad, delta):
            xs_p = [pad[pl.ds(_P + delta + k, Wp + 1)] for k in range(2 * e)]
            return _div_from_views(
                order, dx, dy, nb, ny, uf_p, vf_p, xs_p,
                pad[pl.ds(_P + delta + e, Wp)],
            )

        def enforce_yband(res, gg, ybnd):
            lo = _enforce_relaxed(res[:, :yb], gg[:, :yb], ybnd[:, :yb])
            hi = _enforce_relaxed(
                res[:, ny - yb :], gg[:, ny - yb :], ybnd[:, yb:]
            )
            return jnp.concatenate([lo, res[:, yb : ny - yb], hi], axis=1)

        rm_top = rm_ref[:][:, None, :]     # (1, dd) -> (1, 1, dd)

        def damp_top(phi, phi_now_v, ref_top):
            if not do_damp:
                return phi
            top = phi[..., :dd_eff] - dtf * rm_top * (
                phi_now_v[..., :dd_eff] - ref_top
            )
            return jnp.concatenate([top, phi[..., dd_eff:]], axis=-1)

        # --- s: second enforcement + damping (reference ``dycore.py:811`` -- #
        # after ``rk3ws_si.py:183``; band rows carry the single-enforced
        # value — the caller applies the second enforcement + damping there)
        s_e2_p = _enforce_relaxed(s_e_p, g_p, sref_p)
        s_dmp_p = damp_top(s_e2_p, s_now_p, sref_p[..., :dd_eff])
        # band_ik: the XLA band epilogue computes exactly enforce+damp of the
        # single-enforced density — s_dmp_p already IS that value, so the
        # band columns are final without reverting to s_e_p
        s_f_p = s_dmp_p if band_ik else jnp.where(band_p, s_e_p, s_dmp_p)
        out_refs[0][0:TX] = s_f_p[ctp]

        # --- momentum on the Wp window ------------------------------------- #
        su_n = sun_ref[:]                  # (Wp, ny, nz)
        sv_n = svn_ref[:]
        div_su = div_p(supad_ref, del_m)
        div_sv = div_p(svpad_ref, del_m)
        m_n = mn_ref[:]                    # (Wm, ny, nz)
        cp1 = slice(2, 2 + Wp)
        cm1 = slice(0, Wp)
        jp1 = slice(nb + 1, ny - nb + 1)
        jm1 = slice(nb - 1, ny - nb - 1)
        pgx = (1.0 - eps) * s_now_p[:, jin] * (
            m_n[cp1, jin] - m_n[cm1, jin]
        ) / (2.0 * dx) + eps * s_e_p[:, jin] * (
            mtg_wm[cp1, jin] - mtg_wm[cm1, jin]
        ) / (2.0 * dx)
        pgy = (1.0 - eps) * s_now_p[:, jin] * (
            m_n[cwp, jp1] - m_n[cwp, jm1]
        ) / (2.0 * dy) + eps * s_e_p[:, jin] * (
            mtg_wm[cwp, jp1] - mtg_wm[cwp, jm1]
        ) / (2.0 * dy)
        su_pre = jnp.concatenate(
            [su_n[:, :nb], su_n[:, jin] - dt * (div_su + pgx), su_n[:, ny - nb :]],
            axis=1,
        )
        sv_pre = jnp.concatenate(
            [sv_n[:, :nb], sv_n[:, jin] - dt * (div_sv + pgy), sv_n[:, ny - nb :]],
            axis=1,
        )
        if dist:
            # keep "now" on the GLOBAL y-frame rows (the structural concat
            # above keeps only the LOCAL halo rows)
            su_pre = jnp.where(yframe, su_n, su_pre)
            sv_pre = jnp.where(yframe, sv_n, sv_pre)
        g_wp = g_ref[:][cwp]
        su_enf = enforce_yband(su_pre, g_wp, suyb_ref[:])
        sv_enf = enforce_yband(sv_pre, g_wp, svyb_ref[:])
        su_dmp = damp_top(su_enf, su_n, sutop_ref[:])
        sv_dmp = damp_top(sv_enf, sv_n, svtop_ref[:])
        su_f_p = jnp.where(band_p, su_pre, su_dmp)
        sv_f_p = jnp.where(band_p, sv_pre, sv_dmp)

        # --- in-kernel x-band finishing (su/sv; band_ik) -------------------- #
        # identical algebra to the XLA ``band_vals``/``full_epilogue`` path:
        # full-per-row relaxation toward the band columns of the TRUE
        # reference fields, then Rayleigh damping (rmat is zero below dd).
        # Computed unconditionally on the 2*BW head/tail tile columns and
        # merged with scalar-predicate selects — predicated (pl.when) write
        # blocks measured -7% end-to-end here (Mosaic serialization, r5).
        def edge_select(tile_vals, head_fn, tail_fn):
            """tile_vals with the BW head (tail) columns replaced on the
            first (last) tile by head_fn/tail_fn values."""
            head = jnp.where(pid == 0, head_fn(), tile_vals[0:BW])
            tail = jnp.where(
                pid == NPROG - 1, tail_fn(), tile_vals[TX - BW : TX]
            )
            mid = [tile_vals[BW : TX - BW]] if TX > 2 * BW else []
            return jnp.concatenate([head] + mid + [tail], axis=0)

        if band_ik:

            def band_momentum(m_pre, m_n, mrb_ref, mtop_ref, wsl, bsl):
                return damp_top(
                    _enforce_relaxed(m_pre[wsl], g_wp[wsl], mrb_ref[bsl]),
                    m_n[wsl],
                    mtop_ref[wsl],
                )

            lo_w = slice(VX, VX + BW)
            hi_w = slice(VX + TX - BW, VX + TX)
            lo_b = slice(0, BW)
            hi_b = slice(BW, 2 * BW)
            out_refs[1][0:TX] = edge_select(
                su_f_p[ctp],
                lambda: band_momentum(su_pre, su_n, surb_ref, sutop_ref, lo_w, lo_b),
                lambda: band_momentum(su_pre, su_n, surb_ref, sutop_ref, hi_w, hi_b),
            )
            out_refs[2][0:TX] = edge_select(
                sv_f_p[ctp],
                lambda: band_momentum(sv_pre, sv_n, svrb_ref, svtop_ref, lo_w, lo_b),
                lambda: band_momentum(sv_pre, sv_n, svrb_ref, svtop_ref, hi_w, hi_b),
            )
        else:
            out_refs[1][0:TX] = su_f_p[ctp]
            out_refs[2][0:TX] = sv_f_p[ctp]

        # --- water species -------------------------------------------------- #
        if nq:
            s_int_q = spad_ref[pl.ds(_P + del_s + 1 + VX, TX + 2 * e)]
            WQ = TX + 2 * e
            for k in range(nq):
                sq_now = _clip_pos(s_now_t * qn_refs[k][:])
                qi = qi_refs[k][:]
                if overlay_eff:
                    # q windows are plain (never-clamped) element fetches of
                    # width TX+2e at global offset (nb-e)+cs: only the first
                    # e and last e positions CAN be global frame columns
                    # (interior positions are >= nb+cs and < nx-nb).  Select
                    # per position by global coordinate — any tile whose
                    # window reaches a frame gets the strip value, read from
                    # the strip ref at the traced column index.
                    qoff = t0 - e  # global col of window index 0
                    head = []
                    tail = []
                    for j in range(e):
                        gl = qoff + j
                        vl = flo_refs[3 + k][pl.ds(jnp.clip(gl, 0, nb - 1), 1)]
                        head.append(jnp.where(gl < nb, vl, qi[j : j + 1]))
                        gh = qoff + WQ - e + j
                        vh = fhi_refs[3 + k][
                            pl.ds(jnp.clip(gh - (nx - nb), 0, nb - 1), 1)
                        ]
                        tail.append(
                            jnp.where(
                                gh >= nx - nb, vh, qi[WQ - e + j : WQ - e + j + 1]
                            )
                        )
                    qi = jnp.concatenate(head + [qi[e : WQ - e]] + tail, axis=0)
                sq_int = _clip_pos(s_int_q * qi)
                xs_q = [sq_int[j : TX + 1 + j] for j in range(2 * e)]
                div_q = _div_from_views(
                    order, dx, dy, nb, ny, uf_t, vf_t, xs_q,
                    sq_int[e : e + TX],
                )
                sq_res = jnp.concatenate(
                    [sq_now[:, :nb], sq_now[:, jin] - dt * div_q,
                     sq_now[:, ny - nb :]],
                    axis=1,
                )
                if dist:
                    sq_res = jnp.where(yframe, sq_now, sq_res)
                q_raw = _clip_pos(sq_res / s_e_t)
                q_enf = enforce_yband(q_raw, g_t, qyb_refs[k][:])
                q_out_t = jnp.where(band_t, q_raw, q_enf)
                if band_ik:
                    qr_ref = qrb_refs[k]
                    q_out_t = edge_select(
                        q_out_t,
                        lambda: _enforce_relaxed(
                            q_raw[0:BW], g_t[0:BW], qr_ref[0:BW]
                        ),
                        lambda: _enforce_relaxed(
                            q_raw[TX - BW : TX],
                            g_t[TX - BW : TX],
                            qr_ref[BW : 2 * BW],
                        ),
                    )
                out_refs[3 + k][0:TX] = q_out_t

        # --- staggered velocities from the FINAL fields --------------------- #
        # (``dwarfs/diagnostics.py get_velocity_components``; faces touching
        # band/frame cells are recomputed by the caller from finished fields)
        if with_velocities:
            u_face = (su_f_p[:-1] + su_f_p[1:]) / (s_f_p[:-1] + s_f_p[1:])
            out_refs[3 + nq][0:TX] = u_face
            s_f_t = s_f_p[ctp]
            sv_f_t = sv_f_p[ctp]
            v_in = (sv_f_t[:, :-1] + sv_f_t[:, 1:]) / (
                s_f_t[:, :-1] + s_f_t[:, 1:]
            )
            zv = jnp.zeros_like(v_in[:, :1])
            out_refs[4 + nq][0:TX] = jnp.concatenate([zv, v_in, zv], axis=1)

    # ----------------------- specs & wrapper ------------------------------- #
    def em(w, off, lastdim=None, ydim=None):
        """Element spec of x-width w at clamped tile start + off."""
        return pl.BlockSpec(
            (
                pl.Element(w),
                pl.Element(ny if ydim is None else ydim),
                pl.Element(nz if lastdim is None else lastdim),
            ),
            lambda ix, off=off: (
                nb + off + jnp.minimum(ix * TX, NXI - TX), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    def clamped(w, nom_off):
        return pl.BlockSpec(
            (pl.Element(w), pl.Element(ny), pl.Element(nz)),
            lambda ix, nom_off=nom_off, w=w: (
                jnp.clip(
                    nb + nom_off + jnp.minimum(ix * TX, NXI - TX), 0, nx - w
                ),
                0,
                0,
            ),
            memory_space=pltpu.VMEM,
        )

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    c_spec = em(TX, 0)
    wm_spec = em(Wm, -1 - VX)
    wp_spec = em(Wp, -VX)
    u_spec = em(TX + 3 + VX, -1 - VX)
    v_spec = em(Wm, -1 - VX, ydim=ny + 1)
    plane_spec = em(Wm, -1 - VX, lastdim=1)
    s_int_spec = clamped(WIN_S, -1 - VX - e)
    m_int_spec = clamped(WIN_M, -VX - e)
    yband_spec = em(Wp, -VX, ydim=2 * yb)
    top_spec = em(Wp, -VX, lastdim=dd_eff)
    qyb_spec = em(TX, 0, ydim=2 * yb)

    # band/slab constants (XLA slices of the full reference fields)
    def yband(a):
        return jnp.concatenate([a[:, :yb], a[:, ny - yb :]], axis=1)

    su_yb, sv_yb = yband(su_ref), yband(sv_ref)
    q_ybs = tuple(yband(q) for q in q_refs)

    # full-row reference values at the 2*BW band columns (band_ik only)
    def bandcols(a):
        return jnp.concatenate([a[nb:nr], a[nx - nr : nx - nb]], axis=0)

    band_args = (
        (bandcols(su_ref), bandcols(sv_ref)) + tuple(bandcols(q) for q in q_refs)
        if band_ik
        else ()
    )
    frame_args = (
        tuple(frame_lo) + tuple(frame_hi) if overlay_eff else ()
    )
    su_top = su_ref[..., :dd_eff]
    sv_top = sv_ref[..., :dd_eff]
    rm_top = (rmat if do_damp else jnp.zeros((1, nz), dtype))[:, :dd_eff]
    hs3 = hs[:, :, None].astype(dtype)
    g3 = gamma[:, :, None].astype(dtype)

    n_out = 3 + nq + (2 if with_velocities else 0)
    out_shapes = [jax.ShapeDtypeStruct((nx, ny, nz), dtype)] * (3 + nq)
    out_specs = [c_spec] * (3 + nq)
    if with_velocities:
        out_shapes += [
            jax.ShapeDtypeStruct((nx + 1, ny, nz), dtype),
            jax.ShapeDtypeStruct((nx, ny + 1, nz), dtype),
        ]
        out_specs += [em(TX, 0), em(TX, 0, ydim=ny + 1)]

    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(NXI, TX),),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        in_specs=(
            ([pl.BlockSpec(memory_space=pltpu.SMEM)] if dist else [])
            + ([] if derive_velocities else [u_spec, v_spec])
            + [wm_spec, s_int_spec]
            + [c_spec] * nq
            + [h_spec_q := em(TX + 2 * e, -e)] * nq
            + [wp_spec, wp_spec, m_int_spec, m_int_spec, wm_spec]
            + [plane_spec, whole, plane_spec, wm_spec]
            + [yband_spec, yband_spec]
            + [qyb_spec] * nq
            + [top_spec, top_spec, whole]
            # grid-invariant constants as BLOCKED specs with a constant index
            # map: the pipeline's block-revisiting check skips their DMA
            # after the first iteration (an unblocked VMEM mapping re-fetched
            # them every grid step — measured -7% end-to-end, r5)
            + [
                pl.BlockSpec(
                    tuple(pl.Element(d) for d in a.shape),
                    lambda ix, nd=a.ndim: (0,) * nd,
                    memory_space=pltpu.VMEM,
                )
                for a in band_args + frame_args
            ]
        ),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((WIN_S + 2 * _P, ny, nz), dtype),
            pltpu.VMEM((WIN_M + 2 * _P, ny, nz), dtype),
            pltpu.VMEM((WIN_M + 2 * _P, ny, nz), dtype),
        ],
        interpret=interpret,
    )(
        *((jnp.asarray(goff, jnp.int32),) if dist else ()),
        *(() if derive_velocities else (u, v)),
        s_now, s_int, *q_now, *q_int, su_now, sv_now, su_int, sv_int,
        mtg_now, hs3, theta, g3, s_ref, su_yb, sv_yb, *q_ybs,
        su_top, sv_top, rm_top, *band_args, *frame_args,
    )
    s_o, su_o, sv_o = outs[0], outs[1], outs[2]
    q_o = list(outs[3 : 3 + nq])

    if skip_xband:
        # PROFILING ONLY: returns raw band/frame columns (wrong values in the
        # outer nr columns) to attribute the XLA epilogue's cost.  Static
        # argument (part of the jit cache key) — the caller reads the
        # TASMANIA_SKIP_XBAND env at ITS trace time (ADVICE r4: an env read
        # inside this jitted body was ignored on cache hits).
        return tuple([s_o, su_o, sv_o] + q_o)

    if not finish_eff:
        # frame-pipeline intermediate stage: the band columns are final
        # (band_ik) but the nb-wide x-frame columns are UNWRITTEN — only the
        # next stage's overlaying kernel may consume these arrays
        return tuple([s_o, su_o, sv_o] + q_o)

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

    def frame_vals(sl):
        """x-frame columns, composed from "now" values (the shared helper
        keeps the caller-side pipeline strips bitwise identical)."""
        return compute_frame_strips(
            sl, s_now, su_now, sv_now, q_now, gamma, s_ref, su_ref, sv_ref,
            q_refs, rmat, dtf, do_damp,
        )

    def band_vals(sl):
        """x-band columns: kernel wrote raw updates (s already enforced
        once); apply BC + damping here."""
        return full_epilogue(
            sl, s_o[sl], su_o[sl], sv_o[sl], [q[sl] for q in q_o]
        )

    # finished edge strips [0, nr) and [nx-nr, nx) per field, pasted with
    # ONE in-place (aliased) edge write per array — an `.at[].set` chain
    # made XLA re-materialize every full array, 0.72 ms/step at the
    # flagship size (BENCH_NOTES r4_residue_itemization)
    from tasmania_tpu.ops.paste import paste_x_edges_multi

    if dist:
        # per-shard strips: which of the outer epi_w local columns are global
        # frame (keep-now compose) / global band (BC + damping on the raw
        # kernel values) is a traced global-coordinate test; everything else
        # keeps the kernel's finished core values (never double-damped)
        W = epi_w
        assert W >= max(nb, nr) and 2 * W <= nx
        gx0v = jnp.asarray(goff, jnp.int32)[0]
        arrs0 = [s_o, su_o, sv_o] + q_o

        def compose(sl, g):
            fr = frame_vals(sl)
            bd = band_vals(sl)
            fm = ((g < nb) | (g >= gnx - nb))[:, None, None]
            bm = ((g < nr) | (g >= gnx - nr))[:, None, None]
            return [
                jnp.where(fm, f, jnp.where(bm, b, a[sl]))
                for f, b, a in zip(fr, bd, arrs0)
            ]

        lo = compose(slice(0, W), gx0v + jnp.arange(W))
        hi = compose(slice(nx - W, nx), gx0v + (nx - W) + jnp.arange(W))
        return paste_x_edges_multi(arrs0, lo, hi, interpret=interpret)

    lo_f = frame_vals(slice(0, nb))
    hi_f = frame_vals(slice(nx - nb, nx))
    if nr > nb and not band_ik:
        lo_b = band_vals(slice(nb, nr))
        hi_b = band_vals(slice(nx - nr, nx - nb))
        lo = [jnp.concatenate([f, b], axis=0) for f, b in zip(lo_f, lo_b)]
        hi = [jnp.concatenate([b, f], axis=0) for f, b in zip(hi_f, hi_b)]
    else:
        # band_ik: the kernel's first/last tile finished the band columns
        # in-VMEM — only the nb-wide keep-now frame remains
        lo, hi = lo_f, hi_f
    arrs = list(
        paste_x_edges_multi(
            [s_o, su_o, sv_o] + q_o, lo, hi, interpret=interpret
        )
    )

    if not with_velocities:
        return tuple(arrs)

    # velocity faces touching band/frame cells, from the FINISHED fields
    # (identical expression to the kernel's — and to
    # ``get_velocity_components`` — so every face is a single formula
    # evaluation on final values); outermost faces are zeroed for the
    # caller's ``set_outermost_layers_x/y``
    s_f, su_f, sv_f = arrs[0], arrs[1], arrs[2]
    u_o, v_o = outs[3 + nq], outs[4 + nq]

    def uface(f0, f1):
        return (su_f[f0 - 1 : f1 - 1] + su_f[f0:f1]) / (
            s_f[f0 - 1 : f1 - 1] + s_f[f0:f1]
        )

    zcol = jnp.zeros((1, ny, nz), dtype)
    u_o = u_o.at[0:1].set(zcol).at[nx : nx + 1].set(zcol)
    u_o = u_o.at[1 : nr + 1].set(uface(1, nr + 1))
    u_o = u_o.at[nx - nr : nx].set(uface(nx - nr, nx))

    def vrows(sl):
        v_in = (sv_f[sl][:, :-1] + sv_f[sl][:, 1:]) / (
            s_f[sl][:, :-1] + s_f[sl][:, 1:]
        )
        zv = jnp.zeros_like(v_in[:, :1])
        return jnp.concatenate([zv, v_in, zv], axis=1)

    v_o = v_o.at[0:nr].set(vrows(slice(0, nr)))
    v_o = v_o.at[nx - nr :].set(vrows(slice(nx - nr, nx)))

    return tuple(arrs) + (u_o, v_o)
