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


def make_sharded_dry_step(
    mesh: Mesh,
    cfg: ShardedIsentropicConfig,
    theta_s: float,
    rmat: np.ndarray,
    stage_fractions: Tuple[float, ...] = (1.0 / 3.0, 0.5, 1.0),
    moist: bool = False,
):
    """Build a jitted sharded RK3WS-SI dry step.

    Inputs of the returned function (all sharded ``P('x','y',None)`` /
    ``P('x','y')``): s, su, sv (prognostics), hs (topography), gamma
    (relaxation coefficients), interior mask, and the reference fields.
    """
    nb = cfg.nb
    rmat_c = jnp.asarray(rmat)  # (1, 1, nz)

    def relax(phi, gamma3, phi_ref):
        return jnp.where(
            gamma3 == 0.0,
            phi,
            jnp.where(gamma3 == 1.0, phi_ref, phi - gamma3 * (phi - phi_ref)),
        )

    def local_step(s, su, sv, hs, gamma, mask, s_ref, su_ref, sv_ref, dt,
                   sq=None, sq_ref=None):
        """``sq``: optional (3, bx, by, nz) stacked water-species densities
        (sqv, sqc, sqr) advected alongside the dry prognostics."""
        # static per-step halo fills
        hs_pad = halo_exchange(
            _pad_xy(hs, nb)[..., None], nb, ("x", "y"), (False, False)
        )[..., 0]
        gamma3 = gamma[:, :, None]
        mask3 = mask[:, :, None]

        s0, su0, sv0 = s, su, sv
        s_int, su_int, sv_int = s, su, sv
        sq0 = sq
        sq_int = sq
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

            if sq is not None:
                sq_new = []
                for q in range(sq.shape[0]):
                    sqp = halo_exchange(
                        _pad_xy(sq_int[q], nb), nb, ("x", "y"), (False, False)
                    )
                    val = jnp.where(mask3, sq0[q] - dts * divergence(sqp), sq0[q])
                    sq_new.append(relax(val, gamma3, sq_ref[q]))
                sq_stage = jnp.stack(sq_new)

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
            if sq is not None:
                sq_int = sq_stage

        # Rayleigh damping toward the reference at end of step
        s_int = s_int - dt * rmat_c * (s0 - s_ref)
        su_int = su_int - dt * rmat_c * (su0 - su_ref)
        sv_int = sv_int - dt * rmat_c * (sv0 - sv_ref)
        if sq is not None:
            return s_int, su_int, sv_int, sq_int
        return s_int, su_int, sv_int

    spec3 = P("x", "y", None)
    spec2 = P("x", "y")
    spec4 = P(None, "x", "y", None)
    if moist:
        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                spec3, spec3, spec3, spec2, spec2, spec2,
                spec3, spec3, spec3, None, spec4, spec4,
            ),
            out_specs=(spec3, spec3, spec3, spec4),
        )
    else:
        sharded = shard_map(
            lambda *a: local_step(*a),
            mesh=mesh,
            in_specs=(
                spec3, spec3, spec3, spec2, spec2, spec2, spec3, spec3, spec3, None
            ),
            out_specs=(spec3, spec3, spec3),
        )
    return jax.jit(sharded), NamedSharding(mesh, spec3), NamedSharding(mesh, spec2)


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
