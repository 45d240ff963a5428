"""In-place x-edge column paste via Pallas input-output aliasing.

The fused SI stage finishes the x-band/frame columns (lateral BC + damping
on the outer ``nr`` columns each side) in XLA and must paste them into the
kernel's full-array outputs.  An ``arr.at[cols].set(vals)`` chain makes XLA
re-materialize every (nx, ny, nz) array — measured 0.72 ms/step at the
flagship size (BENCH_NOTES r4_residue_itemization, the single largest
non-kernel cost).  This kernel writes ONLY the two edge blocks into the
ALIASED buffer: the untouched interior never crosses HBM again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def paste_x_edges(full, lo_vals, hi_vals, *, interpret: bool = False):
    """Return ``full`` with columns [0, w) <- lo_vals and [nx-w, nx) <-
    hi_vals (w = lo_vals.shape[0] = hi_vals.shape[0]).

    The pallas-level ``input_output_aliases`` avoids the interior copy only
    when the producer of ``full`` lives in the SAME enclosing jit program
    (true at every in-tree call site: the fused-stage callers trace this
    inside the step's jit).  An eager / top-level caller gets a full-array
    copy instead — this wrapper adds no ``donate_argnums``, so the caller's
    buffer is never invalidated."""
    nx, ny, nz = full.shape
    w = lo_vals.shape[0]
    assert hi_vals.shape[0] == w and 2 * w <= nx

    def kernel(lo_ref, hi_ref, full_ref, out_ref):
        del full_ref  # aliased with the output; never read
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            out_ref[:] = lo_ref[:]

        @pl.when(pid == 1)
        def _():
            out_ref[:] = hi_ref[:]

    strip = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(w), pl.Element(ny), pl.Element(nz)),
        lambda ix: (jnp.where(ix == 0, 0, nx - w), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[strip, strip, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(full.shape, full.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(lo_vals, hi_vals, full)
