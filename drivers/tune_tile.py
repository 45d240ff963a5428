"""Tune the x-tile size of the fused stage kernels on the real chip.

With clamped overlapping tiles (``ops/advection_step._clamp_start``) the tile
no longer needs to divide the 155-column benchmark interior, so the halo
re-read ratio (TX+2e)/TX becomes a free parameter: TX=5 rides 31 well-
pipelined grid steps at 2.2x re-read, TX=32 rides 5 steps at 1.19x.  This
driver times the two dominant kernels (advection fields + momentum epilogue,
~60% of the step) across TX and prints ms/call per the slope method of
``driver_roofline.time_loop``.

Usage: python drivers/tune_tile.py [--nt 100] [--tiles 5,8,16,24,32]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from drivers.driver_roofline import NB, NX, NY, NZ, DT, DX, DY, _mk, time_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=100)
    ap.add_argument("--tiles", type=str, default="5,8,16,24,32")
    cli = ap.parse_args()
    tiles = [int(t) for t in cli.tiles.split(",")]

    from tasmania_tpu.ops.advection_step import (
        fused_advection_fields,
        fused_momentum_epilogue,
    )

    F3 = (NX, NY, NZ)
    u = _mk(0, NX + 1, NY, NZ)
    v = _mk(1, NX, NY + 1, NZ)
    s = _mk(2, *F3, lo=5.0, hi=10.0)
    si = _mk(3, *F3, lo=5.0, hi=10.0)
    qn = tuple(_mk(4 + i, *F3, lo=0.0, hi=1e-3) for i in range(3))
    qi = tuple(_mk(7 + i, *F3, lo=0.0, hi=1e-3) for i in range(3))
    su, sv = _mk(10, *F3), _mk(11, *F3)
    sui, svi = _mk(12, *F3), _mk(13, *F3)
    mtg, mtg2 = _mk(14, *F3, lo=1e5, hi=3e5), _mk(15, *F3, lo=1e5, hi=3e5)
    gamma = jnp.zeros((NX, NY), jnp.float32).at[:NB].set(0.5).at[-NB:].set(0.5)
    rmat = _mk(16, 1, NZ, lo=0.0, hi=0.1)

    print(f"{'TX':>4s} {'adv ms':>8s} {'epi ms':>8s} {'sum':>8s}")
    best = None
    for tx in tiles:
        def adv(c, tx=tx):
            outs = fused_advection_fields(
                u, v, (c,) + qn, (si,) + qi, None, gamma, c,
                order=5, nb=NB, dt=DT, dx=DX, dy=DY, tile_x=tx,
                q_product=(False, True, True, True),
            )
            return outs[0]

        def epi(c, tx=tx):
            outs = fused_momentum_epilogue(
                u, v, su, sv, sui, svi, c, mtg, si, mtg2,
                qn, gamma, c, su, sv, qi, rmat,
                order=5, nb=NB, dt=DT, dtf=DT, dx=DX, dy=DY, eps=0.5,
                nq=3, do_damp=True, tile_x=tx,
            )
            return outs[0]

        a = time_loop(adv, s, cli.nt)
        b = time_loop(epi, s, cli.nt)
        print(f"{tx:4d} {a:8.3f} {b:8.3f} {a + b:8.3f}")
        if best is None or a + b < best[1]:
            best = (tx, a + b)
    print(f"\nbest TX = {best[0]} ({best[1]:.3f} ms for the kernel pair)")


if __name__ == "__main__":
    main()
