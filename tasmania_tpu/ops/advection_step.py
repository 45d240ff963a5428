"""Pallas TPU kernel: fused multi-field horizontal advection step.

The hot op of the isentropic core (SURVEY.md §3.2 [HOT²]): for each advected
field φ,  ``out = φ_now − dt·(∂x F_x(u, φ_int) + ∂y F_y(v, φ_int) − tnd)``
on the nb-inset interior.  The jnp path materialises the two flux arrays and
the output per field (~9 HBM sweeps/field); this kernel keeps the fluxes in
VMEM and streams ``(TX, nyi, nz)`` x-tiles, cutting traffic to ~4 sweeps/field
(read now/int + u/v amortised over fields, write out).

Layout: fields stacked on a leading axis (F, nx, ny, nz) — the TPU tiles the
trailing (ny, nz) dims, so x-shifts walk the (cheap) leading grid dimension
and y-shifts are sublane moves.  Shifted/overlapping windows are expressed
with ``pl.Element`` block dims; the field axis is ``pl.Squeezed``.
Third-order upwind (extent 2) and fifth-order upwind (extent 3) formulas match
``isentropic/dynamics/horizontal_fluxes.py`` exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flux_3rd(w_f, pm2, pm1, p0, pp1):
    flux4 = w_f / 12.0 * (7.0 * (p0 + pm1) - (pp1 + pm2))
    return flux4 - jnp.abs(w_f) / 12.0 * (3.0 * (p0 - pm1) - (pp1 - pm2))


def _flux_5th(w_f, pm3, pm2, pm1, p0, pp1, pp2):
    flux6 = w_f / 60.0 * (37.0 * (p0 + pm1) - 8.0 * (pp1 + pm2) + (pp2 + pm3))
    return flux6 - jnp.abs(w_f) / 60.0 * (
        10.0 * (p0 - pm1) - 5.0 * (pp1 - pm2) + (pp2 - pm3)
    )


def _pick_tile(n: int, want: int) -> int:
    """Largest divisor of n that is <= want (falls back to n)."""
    for t in range(min(want, n), 0, -1):
        if n % t == 0:
            return t
    return n


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
    tile_x: int = 32,
    interpret: bool = False,
):
    """Step stacked fields through one fused upwind advection update.

    Args:
      u: (nx+1, ny, nz) staggered x-velocity.
      v: (nx, ny+1, nz) staggered y-velocity.
      phi_now / phi_int: (F, nx, ny, nz) stacked base / provisional fields.
      tnd: optional (F, nx, ny, nz) stacked source terms (added as −(−tnd)).

    Returns:
      (F, nx, ny, nz): phi_now with the nb-inset interior updated.
    """
    F, nx, ny, nz = phi_now.shape
    e = 2 if order == 3 else 3
    assert order in (3, 5)
    assert nb >= e, f"nb={nb} must be >= extent {e}"
    NXI, NYI = nx - 2 * nb, ny - 2 * nb
    TX = _pick_tile(NXI, tile_x)
    # grid order (x-tile, field): the u/v block index is constant across the
    # inner (field) steps, so Mosaic's revisiting optimisation fetches each
    # velocity tile ONCE per x-tile instead of once per (field, x-tile)
    grid = (NXI // TX, F)
    has_tnd = tnd is not None

    # Mosaic requires the last two block dims be full-size (or (8,128)-
    # divisible): blocks span full (ny, nz); the y frame is handled in-kernel.
    def kernel(*refs):
        if has_tnd:
            u_ref, v_ref, now_ref, int_ref, tnd_ref, out_ref = refs
        else:
            u_ref, v_ref, now_ref, int_ref, out_ref = refs
            tnd_ref = None
        phi = int_ref[0]          # (TX+2e, ny, nz)
        uf = u_ref[:]             # (TX+1, ny, nz): faces of the TX output cells
        vf = v_ref[:]             # (TX, ny+1, nz)
        now = now_ref[0]          # (TX, ny, nz)

        # x-fluxes at TX+1 faces, restricted to the y interior
        jin = slice(nb, ny - nb)
        if order == 3:
            fx = _flux_3rd(
                uf[:, jin],
                phi[0 : TX + 1, jin],
                phi[1 : TX + 2, jin],
                phi[2 : TX + 3, jin],
                phi[3 : TX + 4, jin],
            )
            fy = _flux_3rd(
                vf[:, nb : ny - nb + 1],
                phi[e : e + TX, nb - e : ny - nb - e + 1],
                phi[e : e + TX, nb - e + 1 : ny - nb - e + 2],
                phi[e : e + TX, nb - e + 2 : ny - nb - e + 3],
                phi[e : e + TX, nb - e + 3 : ny - nb - e + 4],
            )
        else:
            fx = _flux_5th(
                uf[:, jin],
                phi[0 : TX + 1, jin],
                phi[1 : TX + 2, jin],
                phi[2 : TX + 3, jin],
                phi[3 : TX + 4, jin],
                phi[4 : TX + 5, jin],
                phi[5 : TX + 6, jin],
            )
            fy = _flux_5th(
                vf[:, nb : ny - nb + 1],
                phi[e : e + TX, nb - e : ny - nb - e + 1],
                phi[e : e + TX, nb - e + 1 : ny - nb - e + 2],
                phi[e : e + TX, nb - e + 2 : ny - nb - e + 3],
                phi[e : e + TX, nb - e + 3 : ny - nb - e + 4],
                phi[e : e + TX, nb - e + 4 : ny - nb - e + 5],
                phi[e : e + TX, nb - e + 5 : ny - nb - e + 6],
            )

        div = (fx[1:] - fx[:-1]) / dx + (fy[:, 1:] - fy[:, :-1]) / dy
        rhs = div - tnd_ref[0, :, jin] if has_tnd else div
        # ref-slice writes (jnp .at[].set lowers to an unsupported scatter)
        out_ref[0, :, jin] = now[:, jin] - dt * rhs
        out_ref[0, :, 0:nb] = now[:, 0:nb]
        out_ref[0, :, ny - nb : ny] = now[:, ny - nb : ny]

    # Mosaic: all dims of a spec must be Element (or none); last two Element
    # dims must be full-size (or (8,128)-divisible)
    in_specs = [
        # u faces nb+ix*TX .. +TX (inclusive), full (y, z)
        pl.BlockSpec(
            (pl.Element(TX + 1), pl.Element(ny), pl.Element(nz)),
            lambda ix, f: (nb + ix * TX, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (pl.Element(TX), pl.Element(ny + 1), pl.Element(nz)),
            lambda ix, f: (nb + ix * TX, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (pl.Element(1), pl.Element(TX), pl.Element(ny), pl.Element(nz)),
            lambda ix, f: (f, nb + ix * TX, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (pl.Element(1), pl.Element(TX + 2 * e), pl.Element(ny), pl.Element(nz)),
            lambda ix, f: (f, nb - e + ix * TX, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [u, v, phi_now, phi_int]
    if has_tnd:
        in_specs.append(
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TX), pl.Element(ny), pl.Element(nz)),
                lambda ix, f: (f, nb + ix * TX, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(tnd)

    interior = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (pl.Element(1), pl.Element(TX), pl.Element(ny), pl.Element(nz)),
            lambda ix, f: (f, ix * TX, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((F, NXI, ny, nz), phi_now.dtype),
        interpret=interpret,
    )(*args)

    return phi_now.at[:, nb : nb + NXI].set(interior)
