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


def _tail(text: str, n: int = 12) -> str:
    lines = (text or "").strip().splitlines()
    return "\n".join(lines[-n:])


def _run_sus_subprocess(backend: str, timeout_s: int):
    """Run the SUS driver in a subprocess.

    Returns ``{"gps": float, "umax": ...}`` on success, else
    ``{"error": ..., "stderr_tail": ...}`` — the failure mode is ALWAYS
    recorded (round-2 lesson, VERDICT.md weak #2: a crashed pallas run fell
    back to jnp with rc:0 and nothing in the artifact said so).

    A COLD axon remote compile can take ~25 min; a persistent JAX compilation
    cache (``.jax_cache/``) is enabled so only the first-ever run pays it."""
    import os
    import re
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent
    env = os.environ.copy()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(root / ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    try:
        proc = subprocess.run(
            [
                sys.executable,
                str(root / "drivers" / "driver_namelist_sus.py"),
                "--backend",
                backend,
                "--fused-loop",
            ],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=env,
        )
    except subprocess.TimeoutExpired as exc:
        return {
            "error": f"timeout after {timeout_s}s",
            "stdout_tail": _tail(
                exc.stdout.decode() if isinstance(exc.stdout, bytes)
                else (exc.stdout or "")
            ),
        }
    if proc.returncode != 0:
        return {
            "error": f"rc={proc.returncode}",
            "stderr_tail": _tail(proc.stderr),
        }
    m = re.search(r"Throughput: ([0-9.e+]+) gridpoints/s", proc.stdout)
    if not m:
        return {"error": "no throughput line", "stdout_tail": _tail(proc.stdout)}
    res = {"gps": float(m.group(1))}
    mu = re.search(r"umax = ([0-9.\-]+)", proc.stdout)
    if mu:
        res["umax"] = float(mu.group(1))
    return res


def bench_isentropic():
    """The reference's own headline benchmark: moist isentropic core,
    161x161x120, rk3ws_si + fifth_order_upwind, full Kessler physics chain
    via sequential-update splitting, 100 steps of 5 s
    (reference drivers/benchmarking/isentropic_moist/namelist_sus.py).

    Returns the result dict with a ``backend`` provenance key; if the pallas
    attempt failed, its error tail rides along as ``pallas_error`` so the
    committed artifact shows the official backend did not run."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))

    res = _run_sus_subprocess("pallas", timeout_s=3300)
    if "gps" in res:
        res["backend"] = "pallas"
        return res
    pallas_error = res
    print(f"PALLAS BENCH FAILED, falling back to jnp: {pallas_error}",
          file=sys.stderr)
    # fallback: pure-XLA backend (reliable ~30 s compile)
    from drivers.driver_namelist_sus import main as sus_main

    out = sus_main(["--fused-loop"])
    out["backend"] = "jnp-fallback"
    out["pallas_error"] = json.dumps(pallas_error)
    return out


def main():
    res = bench_isentropic()
    # the reference publishes no numbers (BASELINE.md); vs_baseline is the
    # ratio to our first recorded TPU measurement: 1.013e8 gridpoints/s
    # (full SUS benchmark config, jnp backend, f32, one TPU v5e chip, r1)
    baseline = 1.013e8
    line = {
        "metric": "isentropic_moist_sus_gridpoints_per_s_per_chip",
        "value": round(res["gps"], 1),
        "unit": "gridpoints/s",
        "vs_baseline": round(res["gps"] / baseline, 3),
        "backend": res.get("backend", "unknown"),
    }
    if "umax" in res:
        line["umax"] = res["umax"]
    if "pallas_error" in res:
        line["pallas_error"] = res["pallas_error"]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
