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


@functools.partial(jax.jit, static_argnames=("interpret",))
def paste_x_edges_multi(fulls, lo_vals, hi_vals, *, interpret: bool = False):
    """Batched :func:`paste_x_edges`: ONE pallas_call pastes the edge strips
    of N same-shape arrays (each aliased in place) — the per-array calls cost
    a kernel launch each (18/step from the three SI stages alone)."""
    fulls = tuple(fulls)
    lo_vals = tuple(lo_vals)
    hi_vals = tuple(hi_vals)
    n = len(fulls)
    assert n and len(lo_vals) == len(hi_vals) == n
    nx, ny, nz = fulls[0].shape
    w = lo_vals[0].shape[0]
    assert all(f.shape == fulls[0].shape for f in fulls)
    assert all(a.shape[0] == w for a in lo_vals + hi_vals) and 2 * w <= nx

    def kernel(*refs):
        los, his = refs[:n], refs[n : 2 * n]
        outs = refs[3 * n :]
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            for o, l in zip(outs, los):
                o[:] = l[:]

        @pl.when(pid == 1)
        def _():
            for o, h in zip(outs, his):
                o[:] = h[:]

    strip = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(w), pl.Element(ny), pl.Element(nz)),
        lambda ix: (jnp.where(ix == 0, 0, nx - w), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[strip] * (2 * n) + [pl.BlockSpec(memory_space=pl.ANY)] * n,
        out_specs=[out_spec] * n,
        out_shape=[jax.ShapeDtypeStruct(fulls[0].shape, f.dtype) for f in fulls],
        input_output_aliases={2 * n + i: i for i in range(n)},
        interpret=interpret,
    )(*lo_vals, *hi_vals, *fulls)
    return tuple(outs)
