"""Whole-stage Pallas fusion vs the reference-ordered unfused stage.

The fused-epilogue fast path (``IsentropicDynamicalCore._stage_fused`` →
``IsentropicPrognostic.stage_call_fused_epilogue`` →
``ops/advection_step.fused_momentum_epilogue``) folds the dycore stage
epilogue — mass fractions, double lateral-BC enforcement (reference
``dycore.py:811`` after ``rk3ws_si.py:183``), Rayleigh damping
(``dycore.py:817-819``) — into the two stage kernels.  It must reproduce the
unfused stage (``_stage_moist``/``_stage_dry``) to machine precision: same
arithmetic, different fusion.

Regression: the ``bc=`` plumb-through of ``_step_density_and_water`` was once
accepted but not forwarded to the kernel dispatch, silently skipping the
in-kernel enforcement of the stepped density (s_e fed to the Montgomery scan
and the q division un-enforced) — caught only by this machine-precision
stage-level comparison.
"""

from datetime import datetime, timedelta

import numpy as np
import pytest

import jax.numpy as jnp

from tasmania_tpu.domain import Domain
from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.isentropic import (
    IsentropicDynamicalCore,
    get_isentropic_state_from_brunt_vaisala_frequency,
)


def build(moist, damp, backend="pallas:interpret"):
    domain = Domain(
        (0.0, 1e5), 19, (0.0, 1e5), 21,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), 8,
        horizontal_boundary_type="relaxed", nb=3,
        horizontal_boundary_kwargs={"nr": 6},
        topography_type="gaussian",
        topography_kwargs={
            "max_height": FieldArray(np.asarray(200.0), "m", ()),
            "width_x": FieldArray(np.asarray(2e4), "m", ()),
            "width_y": FieldArray(np.asarray(2e4), "m", ()),
        },
        backend=backend,
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, datetime(2000, 1, 1),
        FieldArray(np.asarray(8.0), "m s^-1", ()),
        FieldArray(np.asarray(2.0), "m s^-1", ()),
        FieldArray(np.asarray(0.01), "s^-1", ()),
        moist=moist,
        backend=backend,
    )
    domain.horizontal_boundary.reference_state = state
    pt = float(np.asarray(state["air_pressure_on_interface_levels"].data)[0, 0, 0])
    core = IsentropicDynamicalCore(
        domain, moist=moist,
        time_integration_scheme="rk3ws_si",
        horizontal_flux_scheme="fifth_order_upwind",
        time_integration_properties={"pt": pt, "eps": 0.5},
        damp=damp, damp_depth=4, smooth=False,
        backend=backend,
    )
    return core, state


def _raw_inputs(core, state, rng):
    raw = {}
    for k, p in core.stage_input_properties.items():
        arr = jnp.asarray(state[k].to_units(p["units"]).data)
        # perturb so the relaxation band and the damper have real work to do
        raw[k] = arr + 1e-3 * jnp.asarray(rng.normal(size=arr.shape)) * jnp.max(
            jnp.abs(arr)
        )
    return raw


@pytest.mark.parametrize("moist,damp,with_tnd", [
    (True, True, False),
    (True, False, True),
    (False, True, False),
])
def test_fused_stage_matches_unfused(moist, damp, with_tnd, rng, monkeypatch):
    # stages compared in ISOLATION on the same raw inputs: disable the
    # derive-velocities optimization, whose contract (u/v == divide of the
    # int state) only holds in a chained run — the chained equivalence is
    # pinned by tests/test_si_stage.py::test_derive_velocities_chain_bitwise
    monkeypatch.setenv("TASMANIA_DERIVE_UV", "0")
    core, state = build(moist, damp)
    assert core._can_fuse_stage(), "fused-epilogue path must be active"
    raw = _raw_inputs(core, state, rng)

    tnds = {}
    if with_tnd:
        shape = raw["air_isentropic_density"].shape
        tnds = {
            "x_momentum_isentropic":
                1e-4 * jnp.asarray(rng.normal(size=shape)),
            "air_isentropic_density":
                1e-6 * jnp.asarray(rng.normal(size=shape)),
        }
        if moist:
            tnds["mass_fraction_of_water_vapor_in_air"] = (
                1e-9 * jnp.asarray(rng.normal(size=shape))
            )

    dt = 10.0
    for stage in range(core.stages):
        fused = core._stage_fused(stage, dict(raw), dict(tnds), dt)
        unfused = (
            core._stage_moist(stage, dict(raw), dict(tnds), dt)
            if moist
            else core._stage_dry(stage, dict(raw), dict(tnds), dt)
        )
        assert set(fused) == set(unfused)
        for name in fused:
            a = np.asarray(fused[name])
            b = np.asarray(unfused[name])
            scale = np.max(np.abs(b)) or 1.0
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-14,
                err_msg=f"{name} at stage {stage}",
            )
