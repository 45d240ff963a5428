"""Domain-decomposed (sharded) dry isentropic core step.

The distributed flagship path (BASELINE.json config 5; SURVEY.md §2.8/§5.8):
prognostic fields block-sharded ``P('x','y',None)`` over a 2-D device mesh,
halo exchange via ``lax.ppermute`` inside ``shard_map``, physical (relaxed)
boundary conditions expressed as *sharded coefficient arrays* so edge shards
need no control flow — the three-way relaxation ``where`` is a no-op wherever
``gamma == 0``.  The vertical axis stays shard-local, so the Montgomery cumsum
scan never communicates (SURVEY.md §5.7).

Stage structure mirrors the single-device semi-implicit core
(``isentropic/dynamics/prognostic.py``): two halo exchanges per stage —
one for the provisional fields feeding the fluxes, one for the stepped density
feeding the Montgomery gradient.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tasmania_tpu.parallel.halo import halo_exchange


class ShardedIsentropicConfig(NamedTuple):
    nb: int
    dx: float
    dy: float
    dz: float
    pt: float
    eps: float
    g: float = 9.80665
    rd: float = 287.05
    cp: float = 1004.0
    pref: float = 1e5
    flux_extent: int = 2  # third_order_upwind


def _pad_xy(f, nb: int):
    return jnp.pad(f, ((nb, nb), (nb, nb)) + ((0, 0),) * (f.ndim - 2))


def _third_order_flux_x(u, phi):
    uf = u[2:-2]
    pm2, pm1, p0, pp1 = phi[:-3], phi[1:-2], phi[2:-1], phi[3:]
    flux4 = uf / 12.0 * (7.0 * (p0 + pm1) - (pp1 + pm2))
    return flux4 - jnp.abs(uf) / 12.0 * (3.0 * (p0 - pm1) - (pp1 - pm2))


def _third_order_flux_y(v, phi):
    vf = v[:, 2:-2]
    pm2, pm1, p0, pp1 = phi[:, :-3], phi[:, 1:-2], phi[:, 2:-1], phi[:, 3:]
    flux4 = vf / 12.0 * (7.0 * (p0 + pm1) - (pp1 + pm2))
    return flux4 - jnp.abs(vf) / 12.0 * (3.0 * (p0 - pm1) - (pp1 - pm2))


def _montgomery(s_pad, hs_pad, cfg: ShardedIsentropicConfig, theta_s: float):
    """Shard-local Montgomery scan (cumsum; see dynamics/diagnostics.py)."""
    csum = jnp.cumsum(cfg.g * cfg.dz * s_pad, axis=2)
    p = jnp.concatenate([jnp.zeros_like(s_pad[:, :, :1]), csum], axis=2) + cfg.pt
    exn = cfg.cp * (p / cfg.pref) ** (cfg.rd / cfg.cp)
    nz = s_pad.shape[2]
    hs3 = hs_pad[:, :, None]
    mtg_s = theta_s * exn[:, :, nz : nz + 1] + cfg.g * hs3
    base = mtg_s + 0.5 * cfg.dz * exn[:, :, nz : nz + 1]
    inc = cfg.dz * exn[:, :, 1:nz]
    rcsum = jnp.cumsum(inc[:, :, ::-1], axis=2)[:, :, ::-1]
    return jnp.concatenate([base + rcsum, base], axis=2)


def _face_velocities(s_pad, su_pad, sv_pad):
    """Staggered velocities diagnosed from halo-valid density + momenta."""
    sx = s_pad[:-1] + s_pad[1:]
    u_in = jnp.where(sx != 0.0, (su_pad[:-1] + su_pad[1:]) / jnp.where(sx != 0, sx, 1.0), 0.0)
    u = jnp.concatenate(
        [jnp.zeros_like(u_in[:1]), u_in, jnp.zeros_like(u_in[:1])], axis=0
    )
    sy = s_pad[:, :-1] + s_pad[:, 1:]
    v_in = jnp.where(
        sy != 0.0, (sv_pad[:, :-1] + sv_pad[:, 1:]) / jnp.where(sy != 0, sy, 1.0), 0.0
    )
    v = jnp.concatenate(
        [jnp.zeros_like(v_in[:, :1]), v_in, jnp.zeros_like(v_in[:, :1])], axis=1
    )
    return u, v


def _clip(x):
    """Positivity clip matching ``dwarfs/diagnostics.py::WaterConstituent``."""
    return jnp.where(x > 0.0, x, jnp.zeros_like(x))


def make_sharded_dry_step(
    mesh: Mesh,
    cfg: ShardedIsentropicConfig,
    theta_s: float,
    rmat: np.ndarray,
    stage_fractions: Tuple[float, ...] = (1.0 / 3.0, 0.5, 1.0),
    moist: bool = False,
    diagnose_velocities: bool = False,
):
    """Build a jitted sharded RK3WS-SI step.

    Inputs of the returned function (all sharded ``P('x','y',None)`` /
    ``P('x','y')``): s, su, sv (prognostics), hs (topography), gamma
    (relaxation coefficients), interior mask, and the reference fields.

    With ``moist=True`` the step carries the three water-species *mass
    fractions* ``q`` (stacked ``(3, bx, by, nz)``), performing the per-stage
    mass-fraction⇄isentropic-density conversion with positivity clipping
    exactly as the single-device core does (``isentropic/dynamics/dycore.py::
    _stage_moist``; reference ``dycore.py:766-806``).

    With ``diagnose_velocities=True`` the step additionally returns the
    staggered velocities diagnosed from the final fields, with the outermost
    global faces pinned to the reference velocities (the single-device core's
    ``set_outermost_layers_x/y`` under relaxed boundaries).  They are returned
    in cell-anchored layout — ``u_left[i] = u[face i]`` for ``i < nx`` — so
    blocks stay uniform across shards; the last global face is the reference
    value by construction (use :func:`assemble_staggered_x`/``_y``)."""
    nb = cfg.nb
    rmat_c = jnp.asarray(rmat)  # (1, 1, nz)

    def relax(phi, gamma3, phi_ref):
        return jnp.where(
            gamma3 == 0.0,
            phi,
            jnp.where(gamma3 == 1.0, phi_ref, phi - gamma3 * (phi - phi_ref)),
        )

    def local_step(s, su, sv, hs, gamma, mask, s_ref, su_ref, sv_ref, dt,
                   q=None, q_ref=None, u_ref=None, v_ref=None):
        """``q``: optional (3, bx, by, nz) stacked water-species mass
        fractions (qv, qc, qr) advected (as s·q) alongside the dry
        prognostics.  ``u_ref``/``v_ref``: cell-anchored staggered reference
        velocities used to pin the outermost diagnosed faces."""
        # static per-step halo fills
        hs_pad = halo_exchange(
            _pad_xy(hs, nb)[..., None], nb, ("x", "y"), (False, False)
        )[..., 0]
        gamma3 = gamma[:, :, None]
        mask3 = mask[:, :, None]

        s0, su0, sv0 = s, su, sv
        s_int, su_int, sv_int = s, su, sv
        # step-initial water densities, captured once (prognostic.py::
        # _capture_now at stage 0)
        sq0 = None if q is None else _clip(s0[None] * q)
        q_int = q
        mtg_now = None

        for frac in stage_fractions:
            dts = frac * dt
            sp = halo_exchange(_pad_xy(s_int, nb), nb, ("x", "y"), (False, False))
            sup = halo_exchange(_pad_xy(su_int, nb), nb, ("x", "y"), (False, False))
            svp = halo_exchange(_pad_xy(sv_int, nb), nb, ("x", "y"), (False, False))
            if mtg_now is None:
                # Montgomery of the timestep's initial state (captured once)
                mtg_now = _montgomery(sp, hs_pad, cfg, theta_s)

            u, v = _face_velocities(sp, sup, svp)

            def divergence(phi_pad):
                fx = _third_order_flux_x(u, phi_pad)
                fy = _third_order_flux_y(v, phi_pad)
                e = cfg.flux_extent
                B = phi_pad.shape[0]
                C = phi_pad.shape[1]
                ip = slice(nb - e + 1, nb - e + 1 + B - 2 * nb)
                im = slice(nb - e, nb - e + B - 2 * nb)
                jp = slice(nb - e + 1, nb - e + 1 + C - 2 * nb)
                jm = slice(nb - e, nb - e + C - 2 * nb)
                iin = slice(nb, B - nb)
                jin = slice(nb, C - nb)
                return (fx[ip, jin] - fx[im, jin]) / cfg.dx + (
                    fy[iin, jp] - fy[iin, jm]
                ) / cfg.dy

            # density step + relaxation (interior mask keeps global-edge cells)
            s_new = jnp.where(mask3, s0 - dts * divergence(sp), s0)
            s_new = relax(s_new, gamma3, s_ref)

            if q is not None:
                # per-stage mass-fraction -> density conversion for the flux
                # input (dycore.py::_stage_moist), advect, convert back below
                sq_new = []
                for qi in range(q.shape[0]):
                    sqp = halo_exchange(
                        _pad_xy(_clip(s_int * q_int[qi]), nb),
                        nb, ("x", "y"), (False, False),
                    )
                    sq_new.append(
                        jnp.where(mask3, sq0[qi] - dts * divergence(sqp), sq0[qi])
                    )

            # second exchange: stepped density feeds the Montgomery gradient
            sn_pad = halo_exchange(_pad_xy(s_new, nb), nb, ("x", "y"), (False, False))
            mtg_new = _montgomery(sn_pad, hs_pad, cfg, theta_s)

            iin = slice(nb, sn_pad.shape[0] - nb)
            jin = slice(nb, sn_pad.shape[1] - nb)
            ip1 = slice(nb + 1, sn_pad.shape[0] - nb + 1)
            im1 = slice(nb - 1, sn_pad.shape[0] - nb - 1)
            jp1 = slice(nb + 1, sn_pad.shape[1] - nb + 1)
            jm1 = slice(nb - 1, sn_pad.shape[1] - nb - 1)
            pgx = (1.0 - cfg.eps) * s0 * (
                mtg_now[ip1, jin] - mtg_now[im1, jin]
            ) / (2.0 * cfg.dx) + cfg.eps * s_new * (
                mtg_new[ip1, jin] - mtg_new[im1, jin]
            ) / (2.0 * cfg.dx)
            pgy = (1.0 - cfg.eps) * s0 * (
                mtg_now[iin, jp1] - mtg_now[iin, jm1]
            ) / (2.0 * cfg.dy) + cfg.eps * s_new * (
                mtg_new[iin, jp1] - mtg_new[iin, jm1]
            ) / (2.0 * cfg.dy)

            su_new = jnp.where(mask3, su0 - dts * (divergence(sup) + pgx), su0)
            sv_new = jnp.where(mask3, sv0 - dts * (divergence(svp) + pgy), sv0)
            su_new = relax(su_new, gamma3, su_ref)
            sv_new = relax(sv_new, gamma3, sv_ref)

            s_int, su_int, sv_int = s_new, su_new, sv_new
            if q is not None:
                # density -> mass fraction against the BC-enforced new density
                # (dycore.py::_stage_moist, reference ``:798-806``), then the
                # lateral relaxation the dycore's enforce_raw applies to the
                # mass fractions
                sden = jnp.where(s_new != 0.0, s_new, 1.0)
                q_int = jnp.stack(
                    [
                        relax(_clip(sqk / sden), gamma3, q_ref[k])
                        for k, sqk in enumerate(sq_new)
                    ]
                )

        # Rayleigh damping toward the reference at end of step
        s_int = s_int - dt * rmat_c * (s0 - s_ref)
        su_int = su_int - dt * rmat_c * (su0 - su_ref)
        sv_int = sv_int - dt * rmat_c * (sv0 - sv_ref)

        out = (s_int, su_int, sv_int)
        if q is not None:
            out = out + (q_int,)
        if u_ref is not None:
            # diagnose staggered velocities from the final fields — face i of
            # cell i averages cells i-1, i (the neighbour cell coming from the
            # halo) — with the outermost global faces pinned to the reference
            # (dycore.py velocity closure: get_velocity_components +
            # set_outermost_layers under relaxed boundaries)
            sp = halo_exchange(_pad_xy(s_int, nb), nb, ("x", "y"), (False, False))
            sup = halo_exchange(_pad_xy(su_int, nb), nb, ("x", "y"), (False, False))
            svp = halo_exchange(_pad_xy(sv_int, nb), nb, ("x", "y"), (False, False))
            bx, by = s_int.shape[0], s_int.shape[1]
            cm = slice(nb - 1, nb - 1 + bx)
            cc = slice(nb, nb + bx)
            sx = sp[cm] + sp[cc]
            u_new = (sup[cm] + sup[cc]) / jnp.where(sx != 0.0, sx, 1.0)
            dm = slice(nb - 1, nb - 1 + by)
            dc = slice(nb, nb + by)
            sy = sp[:, dm] + sp[:, dc]
            v_new = (svp[:, dm] + svp[:, dc]) / jnp.where(sy != 0.0, sy, 1.0)
            # trim the y/x paddings picked up from the padded inputs
            u_new = u_new[:, nb : nb + by]
            v_new = v_new[nb : nb + bx]
            # pin the first global face (the last global face is not stored;
            # it equals the reference by the relaxed-BC pinning — see
            # assemble_staggered_x/_y)
            on_x_edge = lax.axis_index("x") == 0
            row0 = jnp.where(on_x_edge, u_ref[:1], u_new[:1])
            u_new = jnp.concatenate([row0, u_new[1:]], axis=0)
            on_y_edge = lax.axis_index("y") == 0
            col0 = jnp.where(on_y_edge, v_ref[:, :1], v_new[:, :1])
            v_new = jnp.concatenate([col0, v_new[:, 1:]], axis=1)
            out = out + (u_new, v_new)
        return out

    spec3 = P("x", "y", None)
    spec2 = P("x", "y")
    spec4 = P(None, "x", "y", None)
    in_specs = (
        spec3, spec3, spec3, spec2, spec2, spec2, spec3, spec3, spec3, None
    )
    out_specs = (spec3, spec3, spec3)
    if moist:
        in_specs = in_specs + (spec4, spec4)
        out_specs = out_specs + (spec4,)
    if diagnose_velocities:
        in_specs = in_specs + (spec3, spec3)
        out_specs = out_specs + (spec3, spec3)

    if moist and diagnose_velocities:
        fn = local_step
    elif moist:
        fn = lambda *a: local_step(*a)
    elif diagnose_velocities:
        fn = lambda s, su, sv, hs, g, m, sr, sur, svr, dt, ur, vr: local_step(
            s, su, sv, hs, g, m, sr, sur, svr, dt, None, None, ur, vr
        )
    else:
        fn = lambda *a: local_step(*a)

    sharded = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return jax.jit(sharded), NamedSharding(mesh, spec3), NamedSharding(mesh, spec2)


def assemble_staggered_x(u_left, u_ref_full):
    """Full ``(nx+1, ny, nz)`` staggered field from the step's cell-anchored
    ``u_left`` output: the last global face equals the reference (relaxed-BC
    outermost-layer pinning), so append it from ``u_ref_full``."""
    return jnp.concatenate([u_left, u_ref_full[-1:]], axis=0)


def assemble_staggered_y(v_bot, v_ref_full):
    """Full ``(nx, ny+1, nz)`` staggered field (see assemble_staggered_x)."""
    return jnp.concatenate([v_bot, v_ref_full[:, -1:]], axis=1)


def build_relaxed_gamma_mask(nx: int, ny: int, nb: int, nr: int) -> Tuple[np.ndarray, np.ndarray]:
    """Global (nx, ny) relaxation coefficients (mass points) + interior mask,
    matching ``domain/boundaries/relaxed.py`` exactly."""
    from tasmania_tpu.domain.boundaries.relaxed import _relaxation_ramp

    rel = _relaxation_ramp(nr, nb)
    rrel = rel[::-1]
    g = np.zeros((nx, ny))
    xnegyneg = np.zeros((nr, nr))
    for i in range(nr):
        xnegyneg[i, i:] = rel[i]
        xnegyneg[i:, i] = rel[i]
    g[:nr, :nr] = xnegyneg
    g[:nr, nr : ny - nr] = rel[:, None]
    g[:nr, ny - nr :] = xnegyneg[:, ::-1]
    g[nx - nr :, :nr] = xnegyneg[::-1, :]
    g[nx - nr :, nr : ny - nr] = rrel[:, None]
    g[nx - nr :, ny - nr :] = xnegyneg[::-1, ::-1]
    g[nr : nx - nr, :nr] = rel[None, :]
    g[nr : nx - nr, ny - nr :] = rrel[None, :]

    mask = np.zeros((nx, ny), dtype=bool)
    mask[nb : nx - nb, nb : ny - nb] = True
    return g, mask
