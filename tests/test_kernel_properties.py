"""Hypothesis-drawn shape/parameter sweeps for the fused Pallas kernels
(VERDICT r4 next #5; reference test style ``tests/strategies.py:569`` —
drawn grids per component).

Every property compares the PALLAS path (interpret mode) against the pure-jax
stage/component implementation on freshly drawn (nx, ny, nz, nb, nr, order,
…) within Mosaic-legal bounds — ragged interior widths, nb != 3, nr != 6 and
both flux orders are all in the drawn space.  Tolerance is scaled machine
precision: the kernels use the same slicing algebra, so only re-association
noise (the in-kernel Montgomery MXU grouping) is allowed.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from tasmania_tpu.domain import Domain
from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.isentropic import (
    IsentropicDynamicalCore,
    get_isentropic_state_from_brunt_vaisala_frequency,
)

hyp = settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


def _build(nx, ny, nz, nb, nr, order, moist, damp, damp_depth, backend, eps):
    domain = Domain(
        (0.0, 1e5), nx, (0.0, 1e5), ny,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), nz,
        horizontal_boundary_type="relaxed", nb=nb,
        horizontal_boundary_kwargs={"nr": nr},
        topography_type="gaussian",
        topography_kwargs={
            "max_height": FieldArray(np.asarray(150.0), "m", ()),
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
    scheme = {3: "third_order_upwind", 5: "fifth_order_upwind"}[order]
    core = IsentropicDynamicalCore(
        domain, moist=moist,
        time_integration_scheme="rk3ws_si",
        horizontal_flux_scheme=scheme,
        time_integration_properties={
            "pt": FieldArray(np.asarray(pt), "Pa", ()), "eps": eps,
        },
        damp=damp, damp_depth=damp_depth, smooth=False,
        backend=backend,
    )
    return core, state


def _raw(core, state, seed):
    rng = np.random.default_rng(seed)
    raw = {}
    for k, p in core.stage_input_properties.items():
        arr = jnp.asarray(state[k].to_units(p["units"]).data)
        raw[k] = arr + 1e-3 * jnp.asarray(
            rng.normal(size=arr.shape)
        ) * jnp.max(jnp.abs(arr))
    return raw


def _stages(core, raw, fuse_mode):
    os.environ["TASMANIA_FUSE_STAGE"] = fuse_mode
    os.environ["TASMANIA_DERIVE_UV"] = "0"
    try:
        return [
            core.stage_array_call(s, dict(raw), {}, 10.0)
            for s in range(core.stages)
        ]
    finally:
        del os.environ["TASMANIA_FUSE_STAGE"]
        del os.environ["TASMANIA_DERIVE_UV"]


def _compare(a_list, b_list, atol=2e-13):
    for stage, (a, b) in enumerate(zip(a_list, b_list)):
        assert set(a) == set(b)
        for name in sorted(a):
            x = np.asarray(a[name])
            y = np.asarray(b[name])
            scale = float(np.max(np.abs(y))) or 1.0
            np.testing.assert_allclose(
                x / scale, y / scale, atol=atol,
                err_msg=f"{name} at stage {stage}",
            )


# drawn grids: nb covers e..4 (nb != 3 included), nr covers nb..8 (nr != 6
# included), nx draws ragged interiors vs the TX=16 stage tile
grids = st.tuples(
    st.integers(15, 26),   # nx
    st.integers(16, 24),   # ny
    st.integers(4, 9),     # nz
    st.integers(0, 2),     # nb - e
    st.integers(0, 3),     # nr - nb (clamped to 8)
    st.sampled_from([3, 5]),
    st.integers(0, 2**31 - 1),
)


def _params(g):
    nx, ny, nz, dnb, dnr, order, seed = g
    e = 2 if order == 3 else 3
    nb = min(e + dnb, 4)
    nr = min(nb + dnr, 8, nx // 2 - 1, ny // 2 - 1)
    return nx, ny, nz, nb, max(nr, nb), order, seed


@given(g=grids, eps=st.floats(0.0, 1.0))
@hyp
def test_whole_stage_kernel_vs_jax_dry(g, eps):
    """Property 1: the single-kernel whole-stage path (pallas interpret) vs
    the pure-jax dry stage on drawn grids/orders/nb/nr/eps."""
    nx, ny, nz, nb, nr, order, seed = _params(g)
    jc, js = _build(nx, ny, nz, nb, nr, order, False, True, min(4, nz - 1),
                    "jax", eps)
    pc, ps = _build(nx, ny, nz, nb, nr, order, False, True, min(4, nz - 1),
                    "pallas:interpret", eps)
    raw = _raw(jc, js, seed)
    ref = _stages(jc, raw, "0")
    assert pc._prognostic._supports_stage_v2(raw, {})
    out = _stages(pc, raw, "2")
    _compare(out, ref)


@given(g=grids)
@hyp
def test_whole_stage_kernel_vs_jax_moist(g):
    """Property 2: moist (3 water species in-kernel) vs jax, drawn grids."""
    nx, ny, nz, nb, nr, order, seed = _params(g)
    jc, js = _build(nx, ny, nz, nb, nr, order, True, True, min(3, nz - 1),
                    "jax", 0.5)
    pc, ps = _build(nx, ny, nz, nb, nr, order, True, True, min(3, nz - 1),
                    "pallas:interpret", 0.5)
    raw = _raw(jc, js, seed)
    ref = _stages(jc, raw, "0")
    out = _stages(pc, raw, "2")
    _compare(out, ref)


@given(g=grids)
@hyp
def test_two_kernel_path_vs_jax(g):
    """Property 3: the two-kernel pair (advection+BC, momentum+epilogue) vs
    jax on drawn grids (TASMANIA_FUSE_STAGE=1)."""
    nx, ny, nz, nb, nr, order, seed = _params(g)
    jc, js = _build(nx, ny, nz, nb, nr, order, True, False, 2, "jax", 0.5)
    pc, ps = _build(nx, ny, nz, nb, nr, order, True, False, 2,
                    "pallas:interpret", 0.5)
    raw = _raw(jc, js, seed)
    ref = _stages(jc, raw, "0")
    out = _stages(pc, raw, "1")
    _compare(out, ref)


@given(g=grids, tile=st.sampled_from([4, 6, 8, 12]))
@hyp
def test_whole_stage_kernel_drawn_tiles(g, tile):
    """Property 4: drawn stage tile widths (clamped overlapping last tile on
    ragged interiors) — the tile choice must be value-invariant."""
    import importlib

    import tasmania_tpu.ops.si_stage as si_mod

    nx, ny, nz, nb, nr, order, seed = _params(g)
    pc, ps = _build(nx, ny, nz, nb, nr, order, False, True, 2,
                    "pallas:interpret", 0.5)
    raw = _raw(pc, ps, seed)
    base = _stages(pc, raw, "2")
    old = os.environ.get("TASMANIA_TILE_X_STAGE")
    os.environ["TASMANIA_TILE_X_STAGE"] = str(tile)
    try:
        importlib.reload(si_mod)
        out = _stages(pc, raw, "2")
    finally:
        if old is None:
            os.environ.pop("TASMANIA_TILE_X_STAGE", None)
        else:
            os.environ["TASMANIA_TILE_X_STAGE"] = old
        importlib.reload(si_mod)
    # tiles only regroup the Montgomery MXU contraction: allow re-association
    _compare(out, base, atol=5e-13)


@given(
    shape=st.tuples(st.integers(8, 20), st.integers(8, 20), st.integers(4, 10)),
    moist=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@hyp
def test_vertical_advection_kernel_drawn_shapes(shape, moist, seed):
    """Property 5: the fused RK3WS vertical-advection kernel vs the generic
    stepper path at drawn (nx, ny, nz)."""
    from tasmania_tpu.framework.steppers import TendencyStepper
    from tasmania_tpu.isentropic.physics import IsentropicVerticalAdvection

    nx, ny, nz = shape
    domain = Domain(
        (0.0, 1e5), nx, (0.0, 1e5), ny,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), nz,
        horizontal_boundary_type="identity", nb=3,
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, None, FieldArray(np.array(10.0), "m s^-1", ()),
        FieldArray(np.array(2.0), "m s^-1", ()),
        FieldArray(np.array(0.01), "s^-1", ()), moist=True,
    )
    state.pop("time", None)
    rng = np.random.default_rng(seed)
    shp = np.asarray(state["air_isentropic_density"].data).shape
    state["tendency_of_air_potential_temperature"] = FieldArray(
        jnp.asarray(rng.normal(scale=1e-2, size=shp)), "K s^-1", ("x", "y", "z")
    )
    outs = {}
    for backend in ("jax", "pallas:interpret"):
        va = IsentropicVerticalAdvection(
            domain, flux_scheme="upwind", moist=moist, backend=backend
        )
        _, outs[backend] = TendencyStepper.factory("rk3ws", va)(state, 7.0)
    a, b = outs["pallas:interpret"], outs["jax"]
    assert set(a) == set(b)
    for name in sorted(a):
        if name == "time":
            continue
        np.testing.assert_allclose(
            np.asarray(a[name].data), np.asarray(b[name].data),
            rtol=1e-6, atol=1e-10, err_msg=name,
        )


@given(
    shape=st.tuples(st.integers(9, 24), st.integers(9, 24), st.integers(3, 8)),
    nb=st.integers(1, 4),
    order=st.sampled_from(["first_order", "second_order", "third_order"]),
    seed=st.integers(0, 2**31 - 1),
)
@hyp
def test_smoothing_kernel_drawn_shapes(shape, nb, order, seed):
    """Property 6: the fused horizontal-smoothing kernel vs the numpy dwarf
    at drawn shapes/orders/nb."""
    from tasmania_tpu.dwarfs.horizontal_smoothing import HorizontalSmoothing
    from tasmania_tpu.ops.smoothing_step import fused_smoothing

    nx, ny, nz = shape
    ext = {"first_order": 1, "second_order": 2, "third_order": 3}[order]
    nb = max(nb, ext)
    if nx < 2 * nb + 3 or ny < 2 * nb + 3:
        return
    rng = np.random.default_rng(seed)
    fields = tuple(
        jnp.asarray(rng.normal(size=(nx, ny, nz))) for _ in range(2)
    )
    sm = HorizontalSmoothing.factory(
        order, (nx, ny, nz), 0.7, 1.0, min(3, nz), nb
    )
    gamma = jnp.stack(
        [jnp.asarray(sm._gamma, dtype=np.float64).reshape(-1)] * 2
    )
    out = fused_smoothing(fields, gamma, order=ext, nb=nb, interpret=True)
    for f, o in zip(fields, out):
        ref = np.asarray(sm(f))
        np.testing.assert_allclose(np.asarray(o), ref, atol=1e-13)


@given(
    shape=st.tuples(
        st.integers(17, 41), st.integers(15, 33), st.integers(4, 10)
    ),
    order=st.integers(1, 3),
    tile_x=st.sampled_from([8, 16, 24]),
    seed=st.integers(0, 2**31 - 1),
)
@hyp
def test_smoothing_smagorinsky_merged_drawn_shapes(shape, order, tile_x, seed):
    """Property 7 (r5): the merged [smoothing -> Smagorinsky rk2] kernel vs
    the two-kernel sequence at drawn shapes/orders/tiles (bitwise: identical
    expression trees)."""
    from tasmania_tpu.ops.smagorinsky_step import (
        fused_smagorinsky_rk2,
        fused_smoothing_smagorinsky_rk2,
    )
    from tasmania_tpu.ops.smoothing_step import fused_smoothing

    from hypothesis import assume

    nx, ny, nz = shape
    nb = 3
    assume(nx >= max(2 * nb + 3, 8 + 2 * order + 5) and ny >= 2 * nb + 3)
    rng = np.random.default_rng(seed)
    fields = tuple(
        jnp.asarray(
            1.0 + 0.1 * rng.standard_normal((nx, ny, nz)), dtype=jnp.float32
        )
        for _ in range(6)
    )
    gamma = jnp.asarray(0.2 + 0.5 * rng.random((6, nz)), dtype=jnp.float32)
    dx = dy = 1500.0
    cs = 0.18
    dt = 9.0
    sm = fused_smoothing(fields, gamma, order=order, nb=nb, tile_x=tile_x,
                         interpret=True)
    su2, sv2 = fused_smagorinsky_rk2(
        sm[0], sm[1], sm[2], dx=dx, dy=dy, cs=cs, nb=nb, dt=dt,
        tile_x=tile_x, interpret=True,
    )
    ref = [sm[0], su2, sv2, sm[3], sm[4], sm[5]]
    outs = fused_smoothing_smagorinsky_rk2(
        fields, gamma, order=order, nb=nb, dx=dx, dy=dy, cs=cs, dt=dt,
        tile_x=tile_x, interpret=True,
    )
    for nm, a, b in zip("s su sv qv qc qr".split(), ref, outs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7, err_msg=nm
        )


@given(
    shape=st.tuples(
        st.integers(9, 33), st.integers(8, 24), st.integers(8, 20)
    ),
    vorder=st.integers(1, 3),
    sorder=st.integers(1, 2),
    vt_mode=st.sampled_from(["stage", "step"]),
    tile_x=st.sampled_from([4, 8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
@hyp
def test_vadv_sed_merged_drawn_shapes(
    shape, vorder, sorder, vt_mode, tile_x, seed
):
    """Property 8 (r5): the merged [vertical advection -> sedimentation]
    RK3WS kernel vs the two fused kernels applied in sequence, at drawn
    shapes/orders/modes."""
    from tasmania_tpu.ops.sedimentation_step import fused_sedimentation_rk3ws
    from tasmania_tpu.ops.vertical_advection_step import (
        fused_vadv_sedimentation_rk3ws,
        fused_vertical_advection_rk3ws,
    )

    from hypothesis import assume

    nx, ny, nz = shape
    assume(nz >= 2 * {1: 1, 2: 1, 3: 2}[vorder] + 2 and nz > sorder + 1)
    rng = np.random.default_rng(seed)

    def f32(scale=1.0, base=0.0, shp=(nx, ny, nz)):
        return jnp.asarray(
            base + scale * rng.random(shp), dtype=jnp.float32
        )

    w = jnp.asarray(
        1e-2 * rng.standard_normal((nx, ny, nz)), dtype=jnp.float32
    )
    s = f32(2.0, 20.0)
    su = f32(40.0, -20.0)
    sv = f32(40.0, -20.0)
    qv, qc, qr = f32(1e-2), f32(1e-3), f32(1e-3)
    rho = f32(1.0, 0.3)
    h_if = jnp.asarray(
        np.sort(1e4 * rng.random((nx, ny, nz + 1)), axis=-1)[..., ::-1].copy(),
        dtype=jnp.float32,
    )
    dt, dz = 6.0, 1.2

    adv = fused_vertical_advection_rk3ws(
        w, s, su, sv, qv, qc, qr, order=vorder, dt=dt, dz=dz,
        tile_x=tile_x, interpret=True,
    )
    q_ref, vt_ref = fused_sedimentation_rk3ws(
        rho, h_if, adv[5], order=sorder, dt=dt, tile_x=tile_x,
        vt_mode=vt_mode, interpret=True,
    )
    ref = list(adv[:5]) + [q_ref, vt_ref]

    outs = fused_vadv_sedimentation_rk3ws(
        w, s, su, sv, qv, qc, qr, rho, h_if,
        vorder=vorder, sorder=sorder, dt=dt, dz=dz, vt_mode=vt_mode,
        tile_x=tile_x, interpret=True,
    )
    for nm, a, b in zip("s su sv qv qc qr vt".split(), ref, outs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-9, err_msg=nm
        )
