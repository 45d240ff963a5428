"""Tile sweep for the round-3 kernels: si_stage, vertical advection,
sedimentation (slope-timed, drivers/driver_roofline.time_loop).

The whole-stage kernel inherited TX=12 from the two-kernel pair sweep
(tune_tile.py) but has different window/recompute ratios; the column-local
RK3WS kernels default to 16 untuned.

Usage: python drivers/tune_tile2.py [--nt 100]
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
    ap.add_argument("--skip-stage", action="store_true")
    cli = ap.parse_args()

    from tasmania_tpu.ops.sedimentation_step import fused_sedimentation_rk3ws
    from tasmania_tpu.ops.si_stage import fused_si_stage
    from tasmania_tpu.ops.vertical_advection_step import (
        fused_vertical_advection_rk3ws,
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
    mtg = _mk(14, *F3, lo=1e5, hi=3e5)
    gamma = jnp.zeros((NX, NY), jnp.float32).at[:6].set(0.5).at[-6:].set(0.5)
    rmat = jnp.zeros((1, NZ), jnp.float32).at[:, :15].set(0.05)
    hs = _mk(15, NX, NY, lo=0.0, hi=500.0)
    theta = jnp.linspace(400.0, 280.0, NZ + 1, dtype=jnp.float32)[None, :]
    rho = _mk(21, *F3, lo=0.1, hi=1.2)
    h_if = jnp.sort(_mk(22, NX, NY, NZ + 1, lo=0.0, hi=1.2e4), axis=-1)[
        ..., ::-1
    ]
    w = _mk(23, *F3, lo=-0.01, hi=0.01)

    if not cli.skip_stage:
        print("si_stage:")
        for tx in (8, 12, 16, 20):
            def stage(c, tx=tx):
                outs = fused_si_stage(
                    u, v, c, si, qn, qi, su, sv, sui, svi, mtg, hs, theta,
                    gamma, si, su, sv, qn, rmat,
                    order=5, nb=NB, nr=6, dt=DT, dtf=DT, dx=DX, dy=DY,
                    eps=0.5, pt=2000.0, dz=1.0, g=9.80665, cp=1004.0,
                    rd=287.05, pref=1e5,
                    nq=3, do_damp=True, dd=15, tile_x=tx,
                )
                return outs[0]

            try:
                print(f"  TX={tx:3d}  {time_loop(stage, s, cli.nt):.3f} ms")
            except Exception as exc:
                print(f"  TX={tx:3d}  FAIL: {str(exc).splitlines()[0][:90]}")

    print("vertical_advection_rk3ws:")
    for tx in (8, 16, 32, 64):
        def vadv(c, tx=tx):
            outs = fused_vertical_advection_rk3ws(
                w, c, su, sv, qn[0], qn[1], qn[2],
                order=3, dt=DT, dz=1.0, tile_x=tx,
            )
            return outs[0]

        try:
            print(f"  TX={tx:3d}  {time_loop(vadv, s, cli.nt):.3f} ms")
        except Exception as exc:
            print(f"  TX={tx:3d}  FAIL: {str(exc).splitlines()[0][:90]}")

    print("sedimentation_rk3ws:")
    for tx in (8, 16, 32, 64):
        def sed(c, tx=tx):
            q_out, vt = fused_sedimentation_rk3ws(
                rho, h_if, c, order=2, dt=DT, tile_x=tx
            )
            return q_out

        try:
            print(f"  TX={tx:3d}  {time_loop(sed, qn[2], cli.nt):.3f} ms")
        except Exception as exc:
            print(f"  TX={tx:3d}  FAIL: {str(exc).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
