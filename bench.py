"""Benchmark driver: prints ONE JSON line for the round driver.

Runs the flagship step on the real TPU chip (ambient axon platform).
Currently benches the Burgers RK3WS core on a large 2-D grid; will switch to
the moist isentropic core (reference benchmark config: nx=ny=161, nz=120,
rk3ws_si + fifth_order_upwind, ``drivers/benchmarking/isentropic_moist/``)
once that model lands.

Axon-tunnel measurement rules (learned the hard way):
* ``block_until_ready`` does NOT block through the tunnel — force completion by
  fetching a jitted scalar probe;
* every distinct program first-compiles via a remote service (can take
  minutes) — warm up ALL programs (step + probe) before timing;
* keep nz==1 fields 2-D: a trailing unit dim lands in the TPU lane axis and
  wastes the VPU 128x (measured 8x end-to-end).
"""

from __future__ import annotations

import json
import time


def bench_burgers(nx=2048, ny=2048, nb=3, nt=50, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from tasmania_tpu.burgers.dynamics.advection import BurgersAdvection

    adv = BurgersAdvection.factory("third_order")
    ext = adv.extent
    dx = dy = 1.0 / nx
    dt = 1e-4

    def stage(u, v, u0, v0, frac):
        iw = slice(nb - ext, u.shape[0] - nb + ext)
        jw = slice(nb - ext, u.shape[1] - nb + ext)
        a_ux, a_uy, a_vx, a_vy = adv(dx, dy, u[iw, jw], v[iw, jw])
        i = slice(nb, u.shape[0] - nb)
        j = slice(nb, u.shape[1] - nb)
        un = u0.at[i, j].add(-frac * dt * (a_ux + a_uy))
        vn = v0.at[i, j].add(-frac * dt * (a_vx + a_vy))
        return un, vn

    @jax.jit
    def step(u, v):
        u1, v1 = stage(u, v, u, v, 1.0 / 3.0)
        u2, v2 = stage(u1, v1, u, v, 0.5)
        return stage(u2, v2, u, v, 1.0)

    probe = jax.jit(lambda u: jnp.sum(u))

    shape = (nx + 2 * nb, ny + 2 * nb)  # 2-D: y in TPU lanes
    key = jax.random.PRNGKey(0)
    u = 0.1 * jax.random.normal(key, shape, dtype=dtype)
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(1), shape, dtype=dtype)

    # warm up every program (remote compile can take minutes)
    u, v = step(u, v)
    float(probe(u))

    t0 = time.perf_counter()
    for _ in range(nt):
        u, v = step(u, v)
    float(probe(u))  # forces completion through the tunnel
    elapsed = time.perf_counter() - t0

    return nx * ny * nt / elapsed


def _run_sus_subprocess(backend: str, timeout_s: int):
    """Run the SUS driver in a subprocess; returns gps or None on failure.

    The pallas backend is 1.62x faster but a COLD axon remote compile can take
    ~25 min; the subprocess timeout turns that into a clean fallback."""
    import re
    import subprocess
    import sys
    from pathlib import Path

    try:
        proc = subprocess.run(
            [
                sys.executable,
                str(Path(__file__).resolve().parent / "drivers" / "driver_namelist_sus.py"),
                "--backend",
                backend,
                "--fused-loop",
            ],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    m = re.search(r"Throughput: ([0-9.e+]+) gridpoints/s", proc.stdout)
    return {"gps": float(m.group(1))} if m else None


def bench_isentropic():
    """The reference's own headline benchmark: moist isentropic core,
    161x161x120, rk3ws_si + fifth_order_upwind, full Kessler physics chain
    via sequential-update splitting, 100 steps of 5 s
    (reference drivers/benchmarking/isentropic_moist/namelist_sus.py)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))

    res = _run_sus_subprocess("pallas", timeout_s=2100)
    if res is not None:
        return res
    # fallback: pure-XLA backend (reliable ~30 s compile)
    from drivers.driver_namelist_sus import main as sus_main

    return sus_main(["--fused-loop"])


def main():
    res = bench_isentropic()
    # the reference publishes no numbers (BASELINE.md); vs_baseline is the
    # ratio to our first recorded TPU measurement: 1.013e8 gridpoints/s
    # (full SUS benchmark config, jnp backend, f32, one TPU v5e chip, r1);
    # the pallas backend reaches 1.62e8 (vs_baseline ~1.6)
    baseline = 1.013e8
    print(
        json.dumps(
            {
                "metric": "isentropic_moist_sus_gridpoints_per_s_per_chip",
                "value": round(res["gps"], 1),
                "unit": "gridpoints/s",
                "vs_baseline": round(res["gps"] / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
