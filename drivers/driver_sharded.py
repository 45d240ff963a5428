"""Sharded (domain-decomposed) isentropic benchmark driver (dry or moist).

BASELINE config 5: prognostic fields block-sharded over a 2-D device mesh with
ppermute halo exchange.  On this container only one real TPU chip is visible;
pass ``--virtual N`` to exercise the multi-device path on N virtual CPU
devices (functional validation), or run as-is on the real chip (mesh 1x1 —
measures the shard-local compute path).  On a real pod slice the same script
scales unchanged.

Usage: ``python drivers/driver_sharded.py [--nx N] [--nz N] [--niter N]
[--virtual N] [--moist]``

``--moist`` runs the full-fidelity moist step: the three water-species mass
fractions advected with per-stage mass-fraction⇄density conversion, plus
staggered-velocity diagnosis with outermost-face pinning — the distributed
equivalent of the single-device moist dycore's stage flow.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--ny", type=int, default=None)
    parser.add_argument("--nz", type=int, default=64)
    parser.add_argument("--niter", type=int, default=50)
    parser.add_argument("--virtual", type=int, default=0, help="N virtual CPU devices")
    parser.add_argument("--moist", action="store_true")
    cli = parser.parse_args(argv)

    if cli.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={cli.virtual}"
        ).strip()

    import jax

    if cli.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tasmania_tpu.domain import Domain
    from tasmania_tpu.dwarfs.vertical_damping import VerticalDamping
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.isentropic import (
        get_isentropic_state_from_brunt_vaisala_frequency,
    )
    from tasmania_tpu.parallel import make_mesh
    from tasmania_tpu.parallel.isentropic import (
        ShardedIsentropicConfig,
        build_relaxed_gamma_mask,
        make_sharded_dry_step,
    )

    mesh = make_mesh(jax.devices())
    px, py = mesh.devices.shape
    nx = cli.nx - cli.nx % px or px * 8
    ny = (cli.ny or cli.nx) - (cli.ny or cli.nx) % py or py * 8
    nz, nb, nr = cli.nz, 3, 6
    print(f"mesh {px}x{py}, grid {nx}x{ny}x{nz}")

    domain = Domain(
        (0.0, 2.2e3 * nx), nx, (0.0, 2.2e3 * ny), ny,
        FieldArray(np.array([400.0, 280.0]), "K", ("z",)), nz,
        horizontal_boundary_type="relaxed", nb=nb,
        horizontal_boundary_kwargs={"nr": nr},
        topography_type="gaussian",
        topography_kwargs={
            "max_height": FieldArray(np.asarray(500.0), "m", ()),
            "width_x": FieldArray(np.asarray(50e3), "m", ()),
            "width_y": FieldArray(np.asarray(50e3), "m", ()),
        },
    )
    g = domain.numerical_grid
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        g, datetime(2000, 1, 1),
        FieldArray(np.asarray(22.5), "m s^-1", ()),
        FieldArray(np.asarray(0.0), "m s^-1", ()),
        FieldArray(np.asarray(0.015), "s^-1", ()),
        moist=cli.moist,
        relative_humidity=0.5,
    )
    cfg = ShardedIsentropicConfig(
        nb=nb,
        dx=float(np.asarray(g.dx.data)),
        dy=float(np.asarray(g.dy.data)),
        dz=float(np.asarray(g.dz.data)),
        pt=float(np.asarray(state["air_pressure_on_interface_levels"].data)[0, 0, 0]),
        eps=0.5,
    )
    theta_s = float(np.asarray(g.z_on_interface_levels.data)[-1])
    vd = VerticalDamping.factory("rayleigh", g, damp_depth=15, damp_coeff_max=0.0005)
    gamma, mask = build_relaxed_gamma_mask(nx, ny, nb, nr)
    step, sh3, sh2 = make_sharded_dry_step(
        mesh, cfg, theta_s, vd._rmat[False],
        moist=cli.moist, diagnose_velocities=cli.moist,
    )

    dtype = np.float32
    put3 = lambda x: jax.device_put(jnp.asarray(np.asarray(x), dtype=dtype), sh3)
    put2 = lambda x: jax.device_put(jnp.asarray(np.asarray(x), dtype=dtype), sh2)
    s = put3(state["air_isentropic_density"].data)
    su = put3(state["x_momentum_isentropic"].data)
    sv = put3(state["y_momentum_isentropic"].data)
    hs = put2(np.asarray(g.topography.steady_profile.to_units("m").data))
    gam, msk = put2(gamma), put2(mask)
    s0, su0, sv0 = s, su, sv

    extra = ()
    if cli.moist:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh4 = NamedSharding(mesh, P(None, "x", "y", None))
        mf = (
            "mass_fraction_of_water_vapor_in_air",
            "mass_fraction_of_cloud_liquid_water_in_air",
            "mass_fraction_of_precipitation_water_in_air",
        )
        q = jax.device_put(
            jnp.stack([jnp.asarray(np.asarray(state[k].data), dtype=dtype) for k in mf]),
            sh4,
        )
        u_ref = put3(np.asarray(state["x_velocity_at_u_locations"].data)[:-1])
        v_ref = put3(np.asarray(state["y_velocity_at_v_locations"].data)[:, :-1])
        extra = (q, q, u_ref, v_ref)

    probe = jax.jit(lambda x: jnp.sum(x))
    dt = 5.0

    def run_once():
        nonlocal extra
        out = step(s, su, sv, hs, gam, msk, s0, su0, sv0, dt, *extra)
        if cli.moist:
            extra = (out[3], extra[1], extra[2], extra[3])
        return out[0], out[1], out[2]

    t0 = time.perf_counter()
    s_, su_, sv_ = run_once()
    float(probe(s_))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    for _ in range(cli.niter):
        s, su, sv = run_once()
    float(probe(s))
    elapsed = time.perf_counter() - t0

    u = np.asarray(su) / np.asarray(s)
    print(f"Validation: umax = {u.max():.5f}")
    gps = nx * ny * nz * cli.niter / elapsed
    print(f"Compute time: {elapsed:.3f} s; throughput: {gps:.3e} gridpoints/s")
    return {"gps": gps, "elapsed": elapsed}


if __name__ == "__main__":
    main()
