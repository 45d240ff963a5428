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
    os.environ["TASMANIA_FUSE_STAGE"] = mode
    try:
        outs = []
        for stage in range(core.stages):
            outs.append(core._stage_fused(stage, dict(raw), {}, dt))
        return outs
    finally:
        os.environ["TASMANIA_FUSE_STAGE"] = "1"


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
