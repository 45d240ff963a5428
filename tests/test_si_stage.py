"""Whole-stage single-kernel path (ops/si_stage) vs the two-kernel path.

``fused_si_stage`` (TASMANIA_FUSE_STAGE=2) must reproduce the two-kernel
fused-epilogue implementation (TASMANIA_FUSE_STAGE=1) to machine precision:
same slicing algebra, the same column-local Montgomery recurrences, and
band/slab reference restrictions that only skip exact identities
(enforcement where gamma == 0, damping where rmat == 0).  The only permitted
deviation is ~1 ulp in the Montgomery contraction — the in-kernel scan
matmul groups TX+2 columns where the standalone kernel groups TX, and gemm
accumulation grouping may differ by shape.  Both paths run in interpret mode
through the REAL dycore stage entry point.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests.test_fused_epilogue import _raw_inputs, build


def _stage_outputs(core, raw, dt, mode):
    # TASMANIA_DERIVE_UV=0: these checks feed the SAME raw inputs to every
    # stage in isolation, where the derive-velocities contract (u/v == divide
    # of the int state) does not hold; the derive path is covered by the
    # chained test_derive_velocities_chain_bitwise below.
    os.environ["TASMANIA_FUSE_STAGE"] = mode
    os.environ["TASMANIA_DERIVE_UV"] = "0"
    try:
        outs = []
        for stage in range(core.stages):
            outs.append(core._stage_fused(stage, dict(raw), {}, dt))
        return outs
    finally:
        os.environ["TASMANIA_FUSE_STAGE"] = "1"
        del os.environ["TASMANIA_DERIVE_UV"]


@pytest.mark.parametrize("moist,damp", [
    (True, True),
    (True, False),
    (False, True),
])
def test_stage_v2_bitwise_vs_v1(moist, damp, rng):
    core, state = build(moist, damp)
    raw = _raw_inputs(core, state, rng)
    v1 = _stage_outputs(core, raw, 10.0, "1")
    os.environ["TASMANIA_FUSE_STAGE"] = "2"
    try:
        assert core._prognostic._supports_stage_v2(raw, {})
    finally:
        os.environ["TASMANIA_FUSE_STAGE"] = "1"
    v2 = _stage_outputs(core, raw, 10.0, "2")
    for stage, (a, b) in enumerate(zip(v1, v2)):
        assert set(a) == set(b)
        for name in sorted(a):
            x = np.asarray(a[name])
            y = np.asarray(b[name])
            scale = np.max(np.abs(y)) or 1.0
            np.testing.assert_allclose(
                x / scale, y / scale, atol=5e-14,
                err_msg=f"{name} at stage {stage}",
            )


def test_stage_v2_ragged_tiles(rng):
    """Interior width not divisible by the tile (nx=19 -> NXI=13, TX=8):
    the clamped overlapping last tile must reproduce identical values."""
    os.environ["TASMANIA_TILE_X"] = "8"
    try:
        core, state = build(True, True)
        raw = _raw_inputs(core, state, rng)
        v1 = _stage_outputs(core, raw, 10.0, "1")
        v2 = _stage_outputs(core, raw, 10.0, "2")
    finally:
        del os.environ["TASMANIA_TILE_X"]
    for stage, (a, b) in enumerate(zip(v1, v2)):
        for name in sorted(a):
            x = np.asarray(a[name])
            y = np.asarray(b[name])
            scale = np.max(np.abs(y)) or 1.0
            np.testing.assert_allclose(
                x / scale, y / scale, atol=5e-14,
                err_msg=f"{name} at stage {stage}",
            )


def test_stage_v2_falls_back_with_tendencies(rng):
    """Dycore tendencies are not supported by the single-kernel path; the
    dispatch must fall back (not crash) and still match v1."""
    import jax.numpy as jnp

    core, state = build(True, True)
    raw = _raw_inputs(core, state, rng)
    shape = raw["air_isentropic_density"].shape
    tnds = {"x_momentum_isentropic": 1e-4 * jnp.asarray(rng.normal(size=shape))}
    assert not core._prognostic._supports_stage_v2(raw, tnds)
    os.environ["TASMANIA_FUSE_STAGE"] = "2"
    try:
        out = core._stage_fused(0, dict(raw), dict(tnds), 10.0)
    finally:
        os.environ["TASMANIA_FUSE_STAGE"] = "1"
    ref = core._stage_fused(0, dict(raw), dict(tnds), 10.0)
    for name in sorted(ref):
        np.testing.assert_array_equal(
            np.asarray(out[name]), np.asarray(ref[name]), err_msg=name
        )


def test_stage_v2_with_velocities_flag():
    """``with_velocities=True`` (off by default: measured slower on chip,
    BENCH_NOTES r3_negative_results) must leave the prognostic outputs
    identical and produce u/v equal to ``get_velocity_components`` of the
    final fields (outermost faces zero)."""
    import jax.numpy as jnp
    import numpy as np

    from tasmania_tpu.ops.si_stage import fused_si_stage

    rng = np.random.default_rng(7)
    nx, ny, nz, nb, nr, e = 24, 20, 6, 3, 6, 3

    def f(*shape, lo=0.5, hi=1.5):
        return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

    u = f(nx + 1, ny, nz)
    v = f(nx, ny + 1, nz)
    s, si = f(nx, ny, nz, lo=5, hi=10), f(nx, ny, nz, lo=5, hi=10)
    qn = tuple(f(nx, ny, nz, lo=0, hi=1e-3) for _ in range(3))
    qi = tuple(f(nx, ny, nz, lo=0, hi=1e-3) for _ in range(3))
    su, sv, sui, svi = (f(nx, ny, nz) for _ in range(4))
    mtg = f(nx, ny, nz, lo=1e5, hi=3e5)
    hs = f(nx, ny, lo=0, hi=300)
    theta = jnp.linspace(400.0, 300.0, nz + 1, dtype=jnp.float32)[None, :]
    gamma = jnp.zeros((nx, ny), jnp.float32).at[:nr].set(0.4).at[-nr:].set(0.4)
    gamma = gamma.at[:, :nr].set(0.4).at[:, -nr:].set(0.4)
    rmat = jnp.zeros((1, nz), jnp.float32).at[:, :2].set(0.05)

    kw = dict(
        order=5, nb=nb, nr=nr, dt=7.0, dtf=21.0, dx=1e3, dy=1e3, eps=0.5,
        pt=2000.0, dz=10.0, g=9.80665, cp=1004.0, rd=287.05, pref=1e5,
        nq=3, do_damp=True, dd=2, interpret=True,
    )
    args = (u, v, s, si, qn, qi, su, sv, sui, svi, mtg, hs, theta, gamma,
            si, su, sv, qn, rmat)
    base = fused_si_stage(*args, **kw)
    wv = fused_si_stage(*args, with_velocities=True, **kw)
    assert len(base) == 6 and len(wv) == 8
    for a, b in zip(base, wv[:6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    s_f, su_f, sv_f = (np.asarray(x) for x in wv[:3])
    u_ref = (su_f[:-1] + su_f[1:]) / (s_f[:-1] + s_f[1:])
    v_ref = (sv_f[:, :-1] + sv_f[:, 1:]) / (s_f[:, :-1] + s_f[:, 1:])
    u_o, v_o = np.asarray(wv[6]), np.asarray(wv[7])
    np.testing.assert_allclose(u_o[1:nx], u_ref, rtol=1e-6)
    np.testing.assert_allclose(v_o[:, 1:ny], v_ref, rtol=1e-6)
    assert np.all(u_o[0] == 0) and np.all(u_o[nx] == 0)
    assert np.all(v_o[:, 0] == 0) and np.all(v_o[:, ny] == 0)



def test_derive_velocities_chain_bitwise(rng):
    """TASMANIA_DERIVE_UV=1 (stages >= 1 reconstruct the advective velocities
    inside the whole-stage kernel) must reproduce the refresh-every-stage
    chain BITWISE through the real 3-stage dycore step — the consumed faces
    are pure staggered divides of the previous stage's finished fields in
    both paths (ops/si_stage.py derive_velocities)."""
    from datetime import timedelta

    from tasmania_tpu.framework.field import FieldArray

    core, state = build(True, True)
    names = sorted(k for k in state if k != "time")

    def run(flag):
        os.environ["TASMANIA_FUSE_STAGE"] = "2"
        os.environ["TASMANIA_DERIVE_UV"] = flag
        try:
            out = core(dict(state), {}, 10.0)
        finally:
            os.environ["TASMANIA_FUSE_STAGE"] = "1"
            del os.environ["TASMANIA_DERIVE_UV"]
        return {k: np.asarray(out[k].data) for k in names if k in out}

    a = run("0")
    b = run("1")
    assert set(a) == set(b)
    for name in sorted(a):
        np.testing.assert_array_equal(a[name], b[name], err_msg=name)


@pytest.mark.parametrize("nx", [25, 33])
def test_pipeline_chain_bitwise_geometries(nx, rng):
    """The r5 frame pipeline (band_ik + overlay + deferred paste) vs the
    paste-every-stage chain, BITWISE through the real 3-stage dycore step.

    nx=25 pins the r5 NaN regression: with TX=16 the INTERIOR tile's stencil
    window reaches the left frame columns (NXI - TX < window reach), so the
    overlay must be global-coordinate, not first/last-tile conditioned.
    nx=33 covers the clean multi-tile case.  (The nx=19 build() geometry has
    NXI - TX < BW, which disables band_ik entirely — pipeline off.)"""
    from datetime import datetime

    import jax.numpy as jnp

    from tasmania_tpu.domain import Domain
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.isentropic.dynamics.dycore import IsentropicDynamicalCore
    from tasmania_tpu.isentropic.state import (
        get_isentropic_state_from_brunt_vaisala_frequency,
    )

    domain = Domain(
        (0.0, 1e5), nx, (0.0, 1e5), 25,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), 8,
        horizontal_boundary_type="relaxed", nb=3,
        horizontal_boundary_kwargs={"nr": 6},
        topography_type="gaussian",
        topography_kwargs={
            "max_height": FieldArray(np.asarray(200.0), "m", ()),
            "width_x": FieldArray(np.asarray(2e4), "m", ()),
            "width_y": FieldArray(np.asarray(2e4), "m", ()),
        },
        backend="pallas:interpret",
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, datetime(2000, 1, 1),
        FieldArray(np.asarray(8.0), "m s^-1", ()),
        FieldArray(np.asarray(2.0), "m s^-1", ()),
        FieldArray(np.asarray(0.01), "s^-1", ()),
        moist=True, backend="pallas:interpret",
    )
    domain.horizontal_boundary.reference_state = state
    core = IsentropicDynamicalCore(
        domain, moist=True, backend="pallas:interpret",
        damp=True, damp_type="rayleigh", damp_depth=3,
        damp_max=0.0002, damp_at_every_stage=False,
        time_integration_scheme="rk3ws_si",
        horizontal_flux_scheme="fifth_order_upwind",
    )
    names = sorted(k for k in state if k != "time")

    def run(pipeline):
        os.environ["TASMANIA_FUSE_STAGE"] = "2"
        os.environ["TASMANIA_FRAME_PIPELINE"] = "1" if pipeline else "0"
        try:
            out = core(dict(state), {}, 10.0)
        finally:
            os.environ["TASMANIA_FUSE_STAGE"] = "1"
            del os.environ["TASMANIA_FRAME_PIPELINE"]
        return {k: np.asarray(out[k].data) for k in names if k in out}

    a = run(False)
    b = run(True)
    assert set(a) == set(b)
    for name in sorted(a):
        assert np.isfinite(a[name]).all(), f"non-finite reference: {name}"
        np.testing.assert_array_equal(a[name], b[name], err_msg=name)
