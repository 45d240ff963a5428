"""Microbenchmark: achieved HBM bandwidth of the hot Pallas kernels.

Times ``fused_advection_fields`` / ``fused_momentum_step`` at the flagship
benchmark size under an in-jit fori_loop (axon measurement rules:
BENCH_NOTES.json), sweeping the x-tile size, and reports effective GB/s
(bytes = unique reads + writes, halo re-reads not counted as useful traffic).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench_one(fn, args, nt, n_fields_io):
    """Time nt in-jit iterations of fn(*args); returns (ms/call, GB/s)."""

    def loop(a0, n):
        def body(i, a):
            outs = fn(a, *args[1:])
            # chain dependency: feed first output back in
            out0 = outs[0] if isinstance(outs, (tuple, list)) else outs
            return out0
        return jax.lax.fori_loop(0, n, body, a0)

    loop_c = jax.jit(loop, static_argnums=(1,))
    probe = jax.jit(lambda x: jnp.sum(x))
    # warm up with the SAME static nt (a different nt is a different program;
    # axon remote compile would otherwise land inside the timed region)
    out = loop_c(args[0], nt)
    float(probe(out))
    t0 = time.perf_counter()
    out = loop_c(args[0], nt)
    float(probe(out))
    dt = (time.perf_counter() - t0) / nt
    nbytes = n_fields_io * args[0].size * args[0].dtype.itemsize
    return dt * 1e3, nbytes / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=161)
    ap.add_argument("--nz", type=int, default=120)
    ap.add_argument("--nt", type=int, default=400)
    ap.add_argument("--tiles", type=str, default="5,31")
    cli = ap.parse_args()

    from tasmania_tpu.ops.advection_step import fused_advection_fields

    nx = ny = cli.nx
    nz = cli.nz
    nb = 3
    key = jax.random.PRNGKey(0)
    mk = lambda *s: 1.0 + 0.1 * jax.random.normal(key, s, jnp.float32)
    u = mk(nx + 1, ny, nz)
    v = mk(nx, ny + 1, nz)
    s = mk(nx, ny, nz)
    qs = [0.001 * mk(nx, ny, nz) for _ in range(3)]

    # reference: pure HBM copy bandwidth at the same array size
    ms, gbs = bench_one(lambda x: x + 1.0, (s,), cli.nt, n_fields_io=2)
    print(f"copy (r+w)       : {ms:7.3f} ms  {gbs:6.1f} GB/s", flush=True)

    for tx in [int(t) for t in cli.tiles.split(",")]:
        def fn(s_, u_, v_, qs_, tx_=tx):
            return fused_advection_fields(
                u_, v_,
                (s_, *qs_), (s_, *qs_), None,
                order=5, nb=nb, dt=1e-3, dx=1e3, dy=1e3,
                tile_x=tx_, q_product=(False, True, True, True),
            )

        # unique io: reads u, v, s, q3 x2(now+int same here so 6) + writes 4
        ms, gbs = bench_one(
            lambda s_, u_, v_, *qs_: fn(s_, u_, v_, list(qs_)),
            (s, u, v, *qs), cli.nt, n_fields_io=12,
        )
        print(f"advection tile_x={tx:4d}: {ms:7.3f} ms  {gbs:6.1f} GB/s(unique)",
              flush=True)


if __name__ == "__main__":
    main()
