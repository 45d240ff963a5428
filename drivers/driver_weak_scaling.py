"""Weak-scaling harness: fixed per-device block, growing virtual device mesh.

BASELINE config 5 asks for >=90% weak-scaling efficiency on real multi-host
hardware; only one chip is visible in this container, so this driver produces
the stand-in: the framework-integrated distributed step
(``tasmania_tpu.parallel.runner.DistributedModel`` — real dycore, ppermute
halo exchange) timed on 1 -> 4 -> 8 VIRTUAL CPU devices with a fixed
per-device block.  Virtual devices share the same physical cores, so the
meaningful ratio is per-gridpoint cost vs the 1-device run at equal
*per-device* work; on a real slice the same script (minus --virtual) measures
true weak scaling over ICI/DCN.

Usage: ``python drivers/driver_weak_scaling.py [--block N] [--nz N]
[--niter N] [--devices 1,4,8] [--physics]``

Each mesh size runs in a SUBPROCESS (the virtual device count is fixed at jax
import), and one JSON table is printed at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_one(n_devices: int, block: int, nz: int, niter: int, physics: bool,
            backend: str = "jax", halo=None) -> dict:
    script = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count={n_devices}"
).strip()
import sys, time, json
sys.path.insert(0, {str(REPO)!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import drivers.namelist_sus as nl
from drivers.driver_namelist_sus import build_domain_and_state, build_model
from tasmania_tpu.parallel import make_mesh
from tasmania_tpu.parallel.runner import DistributedModel

mesh = make_mesh(jax.devices())
px, py = mesh.devices.shape
nl.nx, nl.ny, nl.nz = px * {block}, py * {block}, {nz}
# 'pallas' means the shard-aware whole-stage kernel path (ops/si_stage dist
# mode); on the CPU virtual mesh it lowers via interpret=True — the
# ppermutes/fusions in the SPMD HLO are the pallas-path graph either way
nl.backend = {backend!r} if {backend!r} != "pallas" else "pallas:interpret"
domain, state, pt = build_domain_and_state(nl)
dt = nl.timestep.total_seconds()
if {physics!r}:
    factory = lambda dom: build_model(nl, dom, pt)
else:
    from tasmania_tpu.isentropic import IsentropicDynamicalCore
    def factory(dom):
        return IsentropicDynamicalCore(
            dom, moist=True,
            time_integration_scheme=nl.time_integration_scheme,
            horizontal_flux_scheme=nl.horizontal_flux_scheme,
            time_integration_properties={{"pt": pt, "eps": nl.eps}},
            damp=nl.damp, damp_depth=nl.damp_depth, damp_max=nl.damp_max,
            smooth=False, backend=nl.backend, backend_options=nl.bo,
            storage_options=nl.so,
        ), None

dm = DistributedModel(domain, state, mesh, factory, dt, halo={halo!r})
fields = dm.scatter_state(state)
hs = dm.put_topography(jnp.zeros((nl.nx, nl.ny), dtype=nl.so.dtype))
probe = jax.jit(lambda f: jnp.sum(f["air_isentropic_density"]))
out = dm.step(fields, hs); float(probe(out))  # compile
t0 = time.perf_counter()
for _ in range({niter}):
    fields = dm.step(fields, hs)
float(probe(fields))
dt_wall = time.perf_counter() - t0
print(json.dumps(dict(
    n={n_devices}, mesh=[px, py], nx=nl.nx, ny=nl.ny, nz=nl.nz,
    wall=dt_wall,
    gps=nl.nx * nl.ny * nl.nz * {niter} / dt_wall,
    gps_per_device=nl.nx * nl.ny * nl.nz * {niter} / dt_wall / {n_devices},
)))
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env
    )
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-2000:])
    return json.loads(res.stdout.strip().splitlines()[-1])


def analyze_comm(n_devices: int, block: int, nz: int, physics: bool,
                 gps_chip: float, ici_gbs: float,
                 backend: str = "jax", halo=None) -> dict:
    """Comm-vs-compute analysis of the distributed step's compiled HLO.

    Lowers the shard_map step on an n-device virtual mesh at a fixed
    per-device block, walks the optimized (SPMD, per-device) HLO for
    ``collective-permute`` ops, and sums their shape bytes -> halo bytes per
    step per device.  Projected real-hardware weak-scaling efficiency then
    follows from the MEASURED single-chip throughput (``gps_chip``, the
    official bench) and the ICI link bandwidth: with the proven
    interior/edge overlap structure (tests/test_overlap.py) efficiency is
    t_comp / max(t_comp, t_comm); without overlap t_comp / (t_comp + t_comm)
    — both reported (VERDICT r2 weak #6)."""
    script = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count={n_devices}"
).strip()
import sys, json, re
sys.path.insert(0, {str(REPO)!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import drivers.namelist_sus as nl
from drivers.driver_namelist_sus import build_domain_and_state, build_model
from tasmania_tpu.parallel import make_mesh
from tasmania_tpu.parallel.runner import DistributedModel

mesh = make_mesh(jax.devices())
px, py = mesh.devices.shape
nl.nx, nl.ny, nl.nz = px * {block}, py * {block}, {nz}
# 'pallas' means the shard-aware whole-stage kernel path (ops/si_stage dist
# mode); on the CPU virtual mesh it lowers via interpret=True — the
# ppermutes/fusions in the SPMD HLO are the pallas-path graph either way
nl.backend = {backend!r} if {backend!r} != "pallas" else "pallas:interpret"
domain, state, pt = build_domain_and_state(nl)
dt = nl.timestep.total_seconds()
if {physics!r}:
    factory = lambda dom: build_model(nl, dom, pt)
else:
    from tasmania_tpu.isentropic import IsentropicDynamicalCore
    def factory(dom):
        return IsentropicDynamicalCore(
            dom, moist=True,
            time_integration_scheme=nl.time_integration_scheme,
            horizontal_flux_scheme=nl.horizontal_flux_scheme,
            time_integration_properties={{"pt": pt, "eps": nl.eps}},
            damp=nl.damp, damp_depth=nl.damp_depth, damp_max=nl.damp_max,
            smooth=False, backend=nl.backend, backend_options=nl.bo,
            storage_options=nl.so,
        ), None

dm = DistributedModel(domain, state, mesh, factory, dt, halo={halo!r})
fields = dm.scatter_state(state)
hs = dm.put_topography(jnp.zeros((nl.nx, nl.ny), dtype=nl.so.dtype))
compiled = dm._step.lower(dict(fields), dm._consts, hs).compile()
hlo = compiled.as_text()

DT_BYTES = {{"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "pred": 1}}
def shape_bytes(sig):
    total = 0
    for m in re.finditer(r"(f64|f32|bf16|f16|s32|u32|pred)\\[([0-9,]*)\\]", sig):
        dims = m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[m.group(1)]
    return total

comm_bytes = 0
n_permutes = 0
for line in hlo.splitlines():
    ls = line.strip()
    if "collective-permute(" in ls and "=" in ls:
        # `%cp.5 = f64[3,32,16]{{2,1,0}} collective-permute(...)`: the result
        # shape (== bytes moved) sits between '=' and the op name
        sig = ls.split("=", 1)[1].split("collective-permute(", 1)[0]
        comm_bytes += shape_bytes(sig)
        n_permutes += 1

costs = compiled.cost_analysis()
if isinstance(costs, (list, tuple)):
    costs = costs[0]
print(json.dumps(dict(
    n={n_devices}, mesh=[px, py], block={block}, nz={nz},
    n_collective_permutes=n_permutes,
    comm_bytes_per_step_per_device=comm_bytes,
    flops_per_device=costs.get("flops", -1.0),
    hbm_bytes_per_device=costs.get("bytes accessed", -1.0),
)))
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env
    )
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-2000:])
    out = json.loads(res.stdout.strip().splitlines()[-1])

    pts = block * block * nz
    t_comp = pts / gps_chip
    t_comm = out["comm_bytes_per_step_per_device"] / (ici_gbs * 1e9)
    out.update(
        gps_chip_measured=gps_chip,
        ici_gbs_assumed=ici_gbs,
        t_compute_s=t_comp,
        t_comm_s=t_comm,
        comm_fraction=t_comm / (t_comp + t_comm),
        projected_efficiency_overlapped=t_comp / max(t_comp, t_comm),
        projected_efficiency_serial=t_comp / (t_comp + t_comm),
    )
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--block", type=int, default=32, help="per-device block edge")
    p.add_argument("--nz", type=int, default=16)
    p.add_argument("--niter", type=int, default=10)
    p.add_argument("--devices", type=str, default="1,4,8")
    p.add_argument("--physics", action="store_true")
    p.add_argument("--analyze", action="store_true",
                   help="HLO comm-fraction analysis instead of wall timing")
    p.add_argument("--gps-chip", type=float, default=4.551e8,
                   help="measured single-chip gridpoints/s (bench.py)")
    p.add_argument("--ici-gbs", type=float, default=45.0,
                   help="assumed ICI bandwidth per direction, GB/s")
    p.add_argument("--backend", type=str, default="jax",
                   help="jax | pallas (shard-aware whole-stage kernels)")
    p.add_argument("--halo", type=int, default=None,
                   help="shard halo width (pallas path needs nb+1)")
    cli = p.parse_args(argv)

    if cli.analyze:
        n = max(int(x) for x in cli.devices.split(","))
        halo = cli.halo if cli.halo is not None else (
            4 if cli.backend == "pallas" else None
        )
        r = analyze_comm(
            n, cli.block, cli.nz, cli.physics, cli.gps_chip, cli.ici_gbs,
            backend=cli.backend, halo=halo,
        )
        r["backend"] = cli.backend
        print(json.dumps(r, indent=1))
        return r

    rows = []
    for n in [int(x) for x in cli.devices.split(",")]:
        halo = cli.halo if cli.halo is not None else (
            4 if cli.backend == "pallas" else None
        )
        r = run_one(n, cli.block, cli.nz, cli.niter, cli.physics,
                    backend=cli.backend, halo=halo)
        rows.append(r)
        print(json.dumps(r), flush=True)

    base = rows[0]["gps_per_device"]
    table = {
        "block": cli.block,
        "nz": cli.nz,
        "physics": cli.physics,
        "note": (
            "virtual CPU devices share physical cores; efficiency here bounds "
            "framework+halo overhead, not interconnect (one real chip in this "
            "container)"
        ),
        "rows": [
            dict(r, weak_scaling_efficiency=r["gps_per_device"] / base)
            for r in rows
        ],
    }
    print(json.dumps(table, indent=1))
    return table


if __name__ == "__main__":
    main()
