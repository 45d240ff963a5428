"""Sharded isentropic core on the 8-device virtual mesh: steady-state
preservation + qualitative agreement with the single-device core."""

from datetime import datetime, timedelta

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tasmania_tpu.domain import Domain
from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.isentropic import (
    IsentropicDynamicalCore,
    get_isentropic_state_from_brunt_vaisala_frequency,
)
from tasmania_tpu.parallel import make_mesh
from tasmania_tpu.parallel.isentropic import (
    ShardedIsentropicConfig,
    build_relaxed_gamma_mask,
    make_sharded_dry_step,
)


def make_case(nx=32, ny=32, nz=8, topo_height=0.0):
    topo_kwargs = None
    topo = "flat"
    if topo_height > 0:
        topo = "gaussian"
        topo_kwargs = {
            "max_height": FieldArray(np.asarray(topo_height), "m", ()),
            "width_x": FieldArray(np.asarray(2e4), "m", ()),
            "width_y": FieldArray(np.asarray(2e4), "m", ()),
        }
    domain = Domain(
        (0.0, 1e5), nx, (0.0, 1e5), ny,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), nz,
        horizontal_boundary_type="relaxed", nb=3,
        horizontal_boundary_kwargs={"nr": 6},
        topography_type=topo, topography_kwargs=topo_kwargs,
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, datetime(2000, 1, 1),
        FieldArray(np.asarray(10.0), "m s^-1", ()),
        FieldArray(np.asarray(0.0), "m s^-1", ()),
        FieldArray(np.asarray(0.01), "s^-1", ()),
    )
    domain.horizontal_boundary.reference_state = state
    return domain, state


def build_sharded(domain, state, n_devices=8):
    g = domain.numerical_grid
    mesh = make_mesh(jax.devices()[:n_devices])
    cfg = ShardedIsentropicConfig(
        nb=3,
        dx=float(np.asarray(g.dx.data)),
        dy=float(np.asarray(g.dy.data)),
        dz=float(np.asarray(g.dz.data)),
        pt=float(np.asarray(state["air_pressure_on_interface_levels"].data)[0, 0, 0]),
        eps=0.5,
    )
    theta_s = float(np.asarray(g.z_on_interface_levels.data)[-1])
    # Rayleigh damping profile matching the single-device dwarf
    from tasmania_tpu.dwarfs.vertical_damping import VerticalDamping

    vd = VerticalDamping.factory("rayleigh", g, damp_depth=3, damp_coeff_max=0.0002)
    rmat = vd._rmat[False]
    gamma, mask = build_relaxed_gamma_mask(g.nx, g.ny, 3, 6)
    step, sh3, sh2 = make_sharded_dry_step(mesh, cfg, theta_s, rmat)

    def put3(x):
        return jax.device_put(jnp.asarray(np.asarray(x)), sh3)

    def put2(x):
        return jax.device_put(jnp.asarray(np.asarray(x)), sh2)

    args = dict(
        s=put3(state["air_isentropic_density"].data),
        su=put3(state["x_momentum_isentropic"].data),
        sv=put3(state["y_momentum_isentropic"].data),
        hs=put2(np.asarray(g.topography.profile.to_units("m").data)),
        gamma=put2(gamma),
        mask=put2(mask),
        s_ref=put3(state["air_isentropic_density"].data),
        su_ref=put3(state["x_momentum_isentropic"].data),
        sv_ref=put3(state["y_momentum_isentropic"].data),
    )
    return step, args


class TestShardedDryCore:
    def test_steady_state_on_mesh(self):
        domain, state = make_case()
        step, a = build_sharded(domain, state)
        s, su, sv = a["s"], a["su"], a["sv"]
        for _ in range(5):
            s, su, sv = step(
                s, su, sv, a["hs"], a["gamma"], a["mask"],
                a["s_ref"], a["su_ref"], a["sv_ref"], 20.0,
            )
        np.testing.assert_allclose(np.asarray(s), np.asarray(a["s"]), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(su), np.asarray(a["su"]), rtol=1e-10)

    def test_mountain_wave_matches_single_device(self):
        """Same mountain case through the sharded step and the single-device
        dycore: interior fields agree closely after a few steps."""
        domain, state = make_case(topo_height=150.0)
        # single-device run
        pt = float(np.asarray(state["air_pressure_on_interface_levels"].data)[0, 0, 0])
        core = IsentropicDynamicalCore(
            domain,
            moist=False,
            time_integration_scheme="rk3ws_si",
            horizontal_flux_scheme="third_order_upwind",
            time_integration_properties={"pt": pt, "eps": 0.5},
            damp=True, damp_depth=3, damp_max=0.0002, damp_at_every_stage=False,
            smooth=False,
        )
        from tasmania_tpu.isentropic.dynamics.diagnostics import (
            IsentropicDiagnostics as DynDiag,
        )

        dyn_diag = DynDiag(domain.numerical_grid)
        cur = dict(state)
        nt, dt = 5, 10.0
        for _ in range(nt):
            cur = core(cur, {}, timedelta(seconds=dt))
            # refresh the Montgomery potential from the stepped density, as the
            # driver's diagnostics component does between steps
            mtg = dyn_diag.get_montgomery_potential(
                cur["air_isentropic_density"].data, pt
            )
            cur["montgomery_potential"] = cur["montgomery_potential"].with_data(mtg)
        s_single = np.asarray(cur["air_isentropic_density"].data)
        su_single = np.asarray(cur["x_momentum_isentropic"].data)

        # sharded run
        step, a = build_sharded(domain, state)
        s, su, sv = a["s"], a["su"], a["sv"]
        for _ in range(nt):
            s, su, sv = step(
                s, su, sv, a["hs"], a["gamma"], a["mask"],
                a["s_ref"], a["su_ref"], a["sv_ref"], dt,
            )
        s_shard = np.asarray(s)
        su_shard = np.asarray(su)

        # both perturbed away from the initial state...
        s0 = np.asarray(state["air_isentropic_density"].data)
        assert np.abs(s_single - s0).max() > 1e-6
        # ...and agreeing with each other to ~0.2%: the sharded path diagnoses
        # face velocities from momenta each stage, while the single-device path
        # carries staggered velocities in the state (with edge pinning), so the
        # two closures differ at O(boundary-coupling), not O(roundoff)
        s_scale = np.abs(s_single).max()
        np.testing.assert_allclose(s_shard / s_scale, s_single / s_scale, atol=2e-2)
        su_scale = np.abs(su_single).max()
        np.testing.assert_allclose(su_shard / su_scale, su_single / su_scale, atol=2e-2)


mfwv = "mass_fraction_of_water_vapor_in_air"
mfcw = "mass_fraction_of_cloud_liquid_water_in_air"
mfpw = "mass_fraction_of_precipitation_water_in_air"


class TestMoistShardedCore:
    def test_moist_steady_state_on_mesh(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        domain, state = make_case()
        g = domain.numerical_grid
        mesh = make_mesh(jax.devices()[:8])
        cfg = ShardedIsentropicConfig(
            nb=3,
            dx=float(np.asarray(g.dx.data)),
            dy=float(np.asarray(g.dy.data)),
            dz=float(np.asarray(g.dz.data)),
            pt=float(np.asarray(state["air_pressure_on_interface_levels"].data)[0, 0, 0]),
            eps=0.5,
        )
        theta_s = float(np.asarray(g.z_on_interface_levels.data)[-1])
        from tasmania_tpu.dwarfs.vertical_damping import VerticalDamping

        vd = VerticalDamping.factory("rayleigh", g, damp_depth=3)
        gamma, mask = build_relaxed_gamma_mask(g.nx, g.ny, 3, 6)
        step, sh3, sh2 = make_sharded_dry_step(
            mesh, cfg, theta_s, vd._rmat[False], moist=True
        )
        sh4 = NamedSharding(mesh, P(None, "x", "y", None))
        put3 = lambda x: jax.device_put(jnp.asarray(np.asarray(x)), sh3)
        put2 = lambda x: jax.device_put(jnp.asarray(np.asarray(x)), sh2)
        s = put3(state["air_isentropic_density"].data)
        su = put3(state["x_momentum_isentropic"].data)
        sv = put3(state["y_momentum_isentropic"].data)
        shp = np.asarray(state["air_isentropic_density"].data).shape
        q0 = np.stack([np.full(shp, c) for c in (1e-3, 5e-4, 1e-4)])
        q = jax.device_put(jnp.asarray(q0), sh4)
        hs = put2(np.zeros((g.nx, g.ny)))
        for _ in range(3):
            s, su, sv, q = step(
                s, su, sv, hs, put2(gamma), put2(mask), s, su, sv, 20.0, q, q
            )
        np.testing.assert_allclose(np.asarray(q), q0, rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(state["air_isentropic_density"].data), rtol=1e-10
        )

    def test_moist_mountain_matches_single_device(self):
        """Full-fidelity moist sharded step (mass-fraction conversion +
        velocity diagnosis with edge pinning) against the single-device moist
        dycore on a mountain-wave case."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        nx = ny = 32
        nz = 8
        topo_kwargs = {
            "max_height": FieldArray(np.asarray(150.0), "m", ()),
            "width_x": FieldArray(np.asarray(2e4), "m", ()),
            "width_y": FieldArray(np.asarray(2e4), "m", ()),
        }
        domain = Domain(
            (0.0, 1e5), nx, (0.0, 1e5), ny,
            FieldArray(np.array([400.0, 300.0]), "K", ("z",)), nz,
            horizontal_boundary_type="relaxed", nb=3,
            horizontal_boundary_kwargs={"nr": 6},
            topography_type="gaussian", topography_kwargs=topo_kwargs,
        )
        state = get_isentropic_state_from_brunt_vaisala_frequency(
            domain.numerical_grid, datetime(2000, 1, 1),
            FieldArray(np.asarray(10.0), "m s^-1", ()),
            FieldArray(np.asarray(0.0), "m s^-1", ()),
            FieldArray(np.asarray(0.01), "s^-1", ()),
            moist=True, relative_humidity=0.5,
        )
        domain.horizontal_boundary.reference_state = state
        pt = float(np.asarray(state["air_pressure_on_interface_levels"].data)[0, 0, 0])

        # single-device moist run
        core = IsentropicDynamicalCore(
            domain, moist=True,
            time_integration_scheme="rk3ws_si",
            horizontal_flux_scheme="third_order_upwind",
            time_integration_properties={"pt": pt, "eps": 0.5},
            damp=True, damp_depth=3, damp_max=0.0002, damp_at_every_stage=False,
            smooth=False,
        )
        from tasmania_tpu.isentropic.dynamics.diagnostics import (
            IsentropicDiagnostics as DynDiag,
        )

        dyn_diag = DynDiag(domain.numerical_grid)
        cur = dict(state)
        nt, dt = 5, 10.0
        for _ in range(nt):
            cur = core(cur, {}, timedelta(seconds=dt))
            mtg = dyn_diag.get_montgomery_potential(
                cur["air_isentropic_density"].data, pt
            )
            cur["montgomery_potential"] = cur["montgomery_potential"].with_data(mtg)

        # sharded moist run with velocity diagnosis
        g = domain.numerical_grid
        mesh = make_mesh(jax.devices()[:8])
        cfg = ShardedIsentropicConfig(
            nb=3,
            dx=float(np.asarray(g.dx.data)),
            dy=float(np.asarray(g.dy.data)),
            dz=float(np.asarray(g.dz.data)),
            pt=pt, eps=0.5,
        )
        theta_s = float(np.asarray(g.z_on_interface_levels.data)[-1])
        from tasmania_tpu.dwarfs.vertical_damping import VerticalDamping

        vd = VerticalDamping.factory(
            "rayleigh", g, damp_depth=3, damp_coeff_max=0.0002
        )
        gamma, mask = build_relaxed_gamma_mask(nx, ny, 3, 6)
        step, sh3, sh2 = make_sharded_dry_step(
            mesh, cfg, theta_s, vd._rmat[False],
            moist=True, diagnose_velocities=True,
        )
        sh4 = NamedSharding(mesh, P(None, "x", "y", None))
        put3 = lambda x: jax.device_put(jnp.asarray(np.asarray(x)), sh3)
        put2 = lambda x: jax.device_put(jnp.asarray(np.asarray(x)), sh2)
        s = put3(state["air_isentropic_density"].data)
        su = put3(state["x_momentum_isentropic"].data)
        sv = put3(state["y_momentum_isentropic"].data)
        q0 = np.stack([np.asarray(state[k].data) for k in (mfwv, mfcw, mfpw)])
        q = jax.device_put(jnp.asarray(q0), sh4)
        u_ref_full = np.asarray(state["x_velocity_at_u_locations"].data)
        v_ref_full = np.asarray(state["y_velocity_at_v_locations"].data)
        u_ref = put3(u_ref_full[:-1])
        v_ref = put3(v_ref_full[:, :-1])
        hs = put2(np.asarray(g.topography.profile.to_units("m").data))
        args_tail = (
            put3(state["air_isentropic_density"].data),
            put3(state["x_momentum_isentropic"].data),
            put3(state["y_momentum_isentropic"].data),
        )
        q_ref = jax.device_put(jnp.asarray(q0), sh4)
        for _ in range(nt):
            s, su, sv, q, u, v = step(
                s, su, sv, hs, put2(gamma), put2(mask), *args_tail, dt,
                q, q_ref, u_ref, v_ref,
            )

        s_single = np.asarray(cur["air_isentropic_density"].data)
        su_single = np.asarray(cur["x_momentum_isentropic"].data)
        qv_single = np.asarray(cur[mfwv].data)
        u_single = np.asarray(cur["x_velocity_at_u_locations"].data)
        v_single = np.asarray(cur["y_velocity_at_v_locations"].data)

        s_scale = np.abs(s_single).max()
        np.testing.assert_allclose(
            np.asarray(s) / s_scale, s_single / s_scale, atol=2e-2
        )
        su_scale = np.abs(su_single).max()
        np.testing.assert_allclose(
            np.asarray(su) / su_scale, su_single / su_scale, atol=2e-2
        )
        qv_scale = np.abs(qv_single).max()
        np.testing.assert_allclose(
            np.asarray(q[0]) / qv_scale, qv_single / qv_scale, atol=2e-2
        )
        # velocities: cell-anchored output vs the single-device staggered
        # fields (faces 0..nx-1); outermost faces pinned identically
        u_scale = np.abs(u_single).max()
        np.testing.assert_allclose(
            np.asarray(u) / u_scale, u_single[:-1] / u_scale, atol=2e-2
        )
        v_scale = np.abs(v_single).max()
        np.testing.assert_allclose(
            np.asarray(v) / v_scale, v_single[:, :-1] / v_scale, atol=2e-2
        )
        np.testing.assert_allclose(np.asarray(u)[0], u_ref_full[0], rtol=1e-12)
