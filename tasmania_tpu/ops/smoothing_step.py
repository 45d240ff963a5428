"""Pallas TPU kernel: fused multi-field Shapiro smoothing.

One pass applies the order-n 2-D Shapiro filter of
``dwarfs/horizontal_smoothing.py`` (reference
``src/tasmania/dwarfs/subclasses/horizontal_smoothers/*``) to every field:
interior ``(1-c·γ)φ + γ·Σ w_k (φ x-shifts + φ y-shifts)``, frame passed
through.  Fields are passed as SEPARATE arrays (no stacking: a jnp.stack of
six 12 MB fields would cost ~150 MB of extra HBM traffic) and processed
unrolled within each x-tile grid step.

γ is per-(field, z): the vertically-graded coefficient of the dwarf, distinct
for the dry and moist field groups (reference ``horizontal_smoothing.py:90``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tasmania_tpu.ops.advection_step import _clamp_start, _pick_tile

_CW_2D = {1: 1.0, 2: 0.75, 3: 0.625}
_WEIGHTS = {
    1: ((-1, 0.25), (1, 0.25)),
    2: ((-2, -0.0625), (-1, 0.25), (1, 0.25), (2, -0.0625)),
    3: (
        (-3, 0.015625),
        (-2, -0.09375),
        (-1, 0.234375),
        (1, 0.234375),
        (2, -0.09375),
        (3, 0.015625),
    ),
}


@functools.partial(
    jax.jit, static_argnames=("order", "nb", "tile_x", "interpret")
)
def fused_smoothing(
    fields,
    gamma,
    *,
    order: int = 2,
    nb: int = 3,
    tile_x: int = 16,
    interpret: bool = False,
):
    """Smooth each field with the order-n 2-D Shapiro filter, in one pass.

    Args:
      fields: tuple of F (nx, ny, nz) arrays.
      gamma: (F, nz) per-field vertically-graded coefficient.

    Returns:
      tuple of F (nx, ny, nz) arrays: interior smoothed, nb-frame untouched.
    """
    fields = tuple(fields)
    F = len(fields)
    nx, ny, nz = fields[0].shape
    n = order
    assert nb >= n, f"nb={nb} must be >= smoothing order {n}"
    NXI = nx - 2 * nb
    TX = _pick_tile(NXI, tile_x)
    grid = (pl.cdiv(NXI, TX),)
    cw = _CW_2D[order]
    weights = _WEIGHTS[order]
    jin = slice(nb, ny - nb)

    def kernel(*refs):
        g_ref = refs[0]
        in_refs = refs[1 : 1 + F]
        out_refs = refs[1 + F :]
        for f in range(F):
            w = in_refs[f][:]  # (TX+2n, ny, nz)
            g = g_ref[f][None, None, :]  # (1, 1, nz)
            center = w[n : n + TX]

            acc = (1.0 - cw * g) * center[:, jin]
            for off, wt in weights:
                acc = acc + wt * g * w[n + off : n + TX + off, jin]
            for off, wt in weights:
                acc = acc + wt * g * center[:, nb + off : ny - nb + off]

            out_refs[f][0 : TX, jin] = acc
            out_refs[f][0 : TX, 0:nb] = center[:, 0:nb]
            out_refs[f][0 : TX, ny - nb : ny] = center[:, ny - nb : ny]

    in_spec = pl.BlockSpec(
        (pl.Element(TX + 2 * n), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb - n + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    # full-size FRESH outputs (no input aliasing: the read windows overlap
    # neighbouring tiles' write regions, so in-place writes would race the
    # halo fetches whenever the pipeline is not double-buffered); the kernel
    # writes the x-interior and the cheap nb-wide x-edge columns are pasted
    # afterwards (in-place dynamic-update-slices on the dead buffer)
    out_spec = pl.BlockSpec(
        (pl.Element(TX), pl.Element(ny), pl.Element(nz)),
        lambda ix: (nb + _clamp_start(ix, TX, NXI), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [in_spec] * F,
        out_specs=[out_spec] * F,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), fields[0].dtype)] * F,
        interpret=interpret,
    )(gamma, *fields)
    from tasmania_tpu.ops.paste import paste_x_edges_multi

    # in-place aliased edge writes instead of .at[].set re-materialization
    # (BENCH_NOTES r4_residue_itemization); ONE batched call for all fields
    return paste_x_edges_multi(
        outs,
        [phi[:nb] for phi in fields],
        [phi[nx - nb :] for phi in fields],
        interpret=interpret,
    )
