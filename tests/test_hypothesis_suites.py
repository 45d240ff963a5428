"""Property-based suite coverage: hypothesis-drawn domains, boundaries,
staggered fields, out-buffers, topographies and vertical coordinates driven
through the reusable test harness (VERDICT r3 item 6 — the conversion of the
suite apparatus from fixed seeds to hypothesis draws, with NON-identity
boundaries exercised in the stepper suites).

Modeled on the reference's strategy-driven suites
(``tests/suites/steppers.py:123,194``, ``tests/strategies.py:569,1169,1724``).
"""

from datetime import datetime, timedelta

import numpy as np
import pytest
from hypothesis import given, settings, strategies as hyp_st

import jax.numpy as jnp

from tasmania_tpu.framework import TendencyComponent
from tasmania_tpu.framework.field import FieldArray, field_dims, field_shape

from strategies import (
    st_atmosphere_column,
    st_domain,
    st_domain_suite,
    st_field_properties,
    st_linear_tendency_components,
    st_mesh_shape,
    st_out_buffers,
    st_raw_field,
    st_staggered_field,
    st_timestep,
    st_topography,
    st_vertical_coordinate_grid,
)
from suites import (
    SequentialTendencyStepperTestSuite,
    TendencyStepperTestSuite,
)
from test_suites_harness import Decay, DecaySuite, Doubler, DoublerSuite

hyp = settings(max_examples=5, deadline=None)
DIMS3 = ("x", "y", "z")


class Quadratic(TendencyComponent):
    def __init__(self, domain, a=0.3, **kwargs):
        super().__init__(domain, "numerical", **kwargs)
        self.a = a

    @property
    def input_properties(self):
        return {"phi": {"dims": DIMS3, "units": "m s^-1"}}

    @property
    def tendency_properties(self):
        return {"phi": {"dims": DIMS3, "units": "m s^-2"}}

    def array_call(self, state):
        return {"phi": self.a * state["phi"] * state["phi"]}, {}


# --------------------------------------------------------------------------- #
# stepper suites over DRAWN boundaries (identity/periodic/relaxed/dirichlet)   #
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("scheme", ["forward_euler", "rk2", "rk2sa", "rk3ws"])
@hyp
@given(data=hyp_st.data())
def test_tendency_stepper_suite_drawn_boundary(scheme, data):
    ds = data.draw(st_domain_suite())
    a = data.draw(hyp_st.floats(-0.5, 0.5, allow_subnormal=False))
    dt = data.draw(st_timestep(0.1, 10.0))
    suite = TendencyStepperTestSuite(
        ds,
        lambda dom: Quadratic(dom, a, backend=ds.backend),
        lambda p: a * p * p,
        units="m s^-1",
        enforce_hb=True,
    )
    suite.run(scheme, dt_s=dt)


@pytest.mark.parametrize("scheme", ["forward_euler", "rk2", "rk3ws"])
@hyp
@given(data=hyp_st.data())
def test_sts_stepper_suite_drawn_boundary(scheme, data):
    ds = data.draw(st_domain_suite())
    a = data.draw(hyp_st.floats(-0.5, 0.5, allow_subnormal=False))
    dt = data.draw(st_timestep(0.1, 10.0))
    suite = SequentialTendencyStepperTestSuite(
        ds,
        lambda dom: Quadratic(dom, a, backend=ds.backend),
        lambda p: a * p * p,
        units="m s^-1",
        enforce_hb=True,
    )
    suite.run(scheme, dt_s=dt)


# --------------------------------------------------------------------------- #
# component suites: drawn domains + out-buffer path                            #
# --------------------------------------------------------------------------- #


@hyp
@given(data=hyp_st.data())
def test_diagnostic_suite_drawn(data):
    ds = data.draw(st_domain_suite(boundary_types=("identity", "periodic")))
    with_out = data.draw(hyp_st.booleans())
    DoublerSuite(ds, Doubler(ds.domain, "numerical")).run_diagnostic(
        with_out=with_out
    )


@hyp
@given(data=hyp_st.data())
def test_tendency_suite_drawn(data):
    ds = data.draw(st_domain_suite(boundary_types=("identity", "periodic")))
    with_out = data.draw(hyp_st.booleans())
    DecaySuite(ds, Decay(ds.domain, "numerical")).run_tendency(
        with_out=with_out
    )


@hyp
@given(data=hyp_st.data())
def test_out_buffers_strategy_overwritten(data):
    """Junk-prefilled drawn out-buffers are fully overwritten on declared
    fields and the sentinel survives the merge."""
    ds = data.draw(st_domain_suite(boundary_types=("identity",)))
    comp = Doubler(ds.domain, "numerical")
    state = {
        "time": datetime(2000, 1, 1),
        "phi": ds.random_field("phi", "m", 0.5, 2.0),
    }
    out_buf = data.draw(
        st_out_buffers(ds.grid, comp.diagnostic_properties, backend=ds.backend)
    )
    out = comp(state, out=out_buf)
    assert "__sentinel__" in out
    np.testing.assert_allclose(
        np.asarray(out["psi"].data),
        2.0 * np.asarray(state["phi"].data),
        atol=1e-12,
    )
    assert float(np.max(np.asarray(out["psi"].data))) > -1e2  # junk gone


# --------------------------------------------------------------------------- #
# staggered fields & boundaries                                                #
# --------------------------------------------------------------------------- #


@hyp
@given(data=hyp_st.data())
def test_staggered_field_strategy_shapes(data):
    domain = data.draw(st_domain(boundary_types=("identity",)))
    g = domain.numerical_grid
    name, fld = data.draw(st_staggered_field(g))
    assert fld.data.shape == field_shape(name, (g.nx, g.ny, g.nz))
    assert fld.dims == field_dims(name)


@hyp
@given(data=hyp_st.data())
def test_boundary_enforce_laws(data):
    """Per-type enforcement laws on drawn boundaries and fields:
    identity/periodic/dirichlet enforcement is a projection (idempotent);
    relaxed enforcement is a relaxation, NOT a projection (reference
    ``boundaries/relaxed.py:133`` blends toward the reference state), so the
    laws checked are: the reference state is a fixed point, and cells beyond
    the nr-band are untouched."""
    domain = data.draw(
        st_domain(boundary_types=("identity", "periodic", "relaxed", "dirichlet"))
    )
    hb = domain.horizontal_boundary
    g = domain.numerical_grid
    refphi = np.asarray(
        data.draw(st_raw_field((g.nx, g.ny, g.nz), 0.5, 2.0, backend="numpy"))
    )
    ref = {
        "time": datetime(2000, 1, 1),
        "phi": FieldArray(jnp.asarray(refphi), "m", DIMS3),
    }
    hb.reference_state = ref
    phi = data.draw(st_raw_field((g.nx, g.ny, g.nz), -1.0, 1.0))
    once = np.asarray(hb.enforce_field(phi, field_name="phi", field_units="m"))
    if type(hb).__name__.lower().startswith("relaxed"):
        fixed = np.asarray(
            hb.enforce_field(
                jnp.asarray(refphi), field_name="phi", field_units="m"
            )
        )
        np.testing.assert_allclose(fixed, refphi, rtol=1e-12)
        nr = hb.kwargs.get("nr", 8) if hasattr(hb, "kwargs") else 8
        interior = np.asarray(phi)[nr:-nr, nr:-nr]
        np.testing.assert_array_equal(once[nr:-nr, nr:-nr], interior)
    else:
        twice = np.asarray(
            hb.enforce_field(
                jnp.asarray(once), field_name="phi", field_units="m"
            )
        )
        np.testing.assert_allclose(twice, once, rtol=0, atol=0)


@hyp
@given(data=hyp_st.data())
def test_numerical_physical_roundtrip(data):
    """get_physical_field(get_numerical_field(x)) == x for every boundary
    type (the numerical<->physical mapping the reference pins in
    ``horizontal_boundary.py:242-272``)."""
    domain = data.draw(
        st_domain(boundary_types=("identity", "periodic", "relaxed", "dirichlet"))
    )
    hb = domain.horizontal_boundary
    pg = domain.physical_grid
    phi = data.draw(st_raw_field((pg.nx, pg.ny, pg.nz), -5.0, 5.0))
    num = hb.get_numerical_field(phi, field_name="phi")
    back = hb.get_physical_field(num, field_name="phi")
    np.testing.assert_array_equal(np.asarray(back), np.asarray(phi))


# --------------------------------------------------------------------------- #
# topography & vertical coordinates                                            #
# --------------------------------------------------------------------------- #


@hyp
@given(data=hyp_st.data())
def test_topography_growth_law(data):
    """Drawn topography: profile ramps linearly over ``time`` and saturates at
    the steady profile (reference ``domain/topography.py:106-117``)."""
    from tasmania_tpu.domain.topography import PhysicalTopography
    from tasmania_tpu.domain.grid import PhysicalGrid

    topo_type, kwargs = data.draw(st_topography(types=("gaussian", "schaer")))
    grid = PhysicalGrid(
        (0.0, 1e5),
        9,
        (0.0, 1e5),
        9,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)),
        4,
        topography_type=topo_type,
        topography_kwargs=kwargs,
    )
    topo = grid.topography
    steady = np.asarray(topo.steady_profile.to_units("m").data)
    if topo.time.total_seconds() > 0.0:
        t_half = topo.time / 2
        topo.update(t_half)
        np.testing.assert_allclose(
            # rtol 1e-6: timedelta quantizes to microseconds, so time/2 over
            # a drawn float-second growth time is not exactly half
            np.asarray(topo.profile.to_units("m").data), 0.5 * steady, rtol=1e-6
        )
        topo.update(topo.time * 3)
        np.testing.assert_allclose(
            np.asarray(topo.profile.to_units("m").data), steady, rtol=0, atol=0
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(topo.profile.to_units("m").data), steady
        )


@hyp
@given(data=hyp_st.data())
def test_vertical_coordinate_grid_metric_consistency(data):
    """Drawn sigma/SLEVE/Gal-Chen grid over a drawn mountain: interface
    heights decrease with k (COSMO ordering, top->surface), the surface level
    equals the topography, and the top is flat."""
    grid = data.draw(st_vertical_coordinate_grid())
    grid.update_topography(timedelta(hours=10))
    zhl = np.asarray(grid.height_on_interface_levels.to_units("m").data)
    hs = np.asarray(grid.topography_height)
    assert np.all(np.diff(zhl, axis=-1) <= 1e-9), "heights must decrease with k"
    np.testing.assert_allclose(zhl[..., -1], hs, atol=1e-6)
    assert np.ptp(zhl[..., 0]) < 1e-6, "model top must be flat"


# --------------------------------------------------------------------------- #
# coupler laws over drawn component lists                                      #
# --------------------------------------------------------------------------- #


@hyp
@given(data=hyp_st.data())
def test_concurrent_coupling_linear_sum(data):
    """CC over N drawn linear components produces the summed tendency under
    BOTH execution policies (linearity makes serial == as_parallel)."""
    from tasmania_tpu.framework import ConcurrentCoupling

    domain = data.draw(st_domain(boundary_types=("identity",), nz_range=(1, 4)))
    comps, coeffs = data.draw(st_linear_tendency_components(domain))
    g = domain.numerical_grid
    phi = data.draw(st_raw_field((g.nx, g.ny, g.nz), 0.5, 2.0))
    state = {
        "time": datetime(2000, 1, 1),
        "phi": FieldArray(phi, "m s^-1", DIMS3),
    }
    for policy in ("serial", "as_parallel"):
        cc = ConcurrentCoupling(*comps, execution_policy=policy)
        tends, _ = cc(state, 1.0)
        np.testing.assert_allclose(
            np.asarray(tends["phi"].data),
            sum(coeffs) * np.asarray(phi),
            rtol=1e-12,
            err_msg=policy,
        )


@hyp
@given(data=hyp_st.data())
def test_parallel_splitting_linear_increments(data):
    """ParallelSplitting over drawn linear components: all processes consume
    the SAME input state, increments accumulate onto the provisional state
    (reference ``framework/parallel_splitting.py:54`` semantics)."""
    from tasmania_tpu.framework import (
        ParallelSplitting,
        TimeIntegrationOptions,
    )

    domain = data.draw(st_domain(boundary_types=("identity",), nz_range=(1, 3)))
    comps, coeffs = data.draw(st_linear_tendency_components(domain))
    dt = data.draw(st_timestep(0.5, 5.0))
    g = domain.numerical_grid
    phi = np.asarray(data.draw(st_raw_field((g.nx, g.ny, g.nz), 0.5, 2.0)))
    state = {
        "time": datetime(2000, 1, 1),
        "phi": FieldArray(jnp.asarray(phi), "m s^-1", DIMS3),
    }
    prv_phi = np.asarray(data.draw(st_raw_field((g.nx, g.ny, g.nz), 0.5, 2.0)))
    prv = {
        "time": datetime(2000, 1, 1),
        "phi": FieldArray(jnp.asarray(prv_phi), "m s^-1", DIMS3),
    }
    ps = ParallelSplitting(
        *[
            TimeIntegrationOptions(c, scheme="forward_euler")
            for c in comps
        ],
    )
    td = timedelta(seconds=dt)
    _, prv_out = ps(state, prv, td)
    dt_q = td.total_seconds()  # microsecond-quantized, like the stepper sees
    expected = prv_phi + sum(a * dt_q * phi for a in coeffs)
    np.testing.assert_allclose(
        np.asarray(prv_out["phi"].data), expected, rtol=1e-12
    )


# --------------------------------------------------------------------------- #
# strategy self-checks & decomposition arithmetic                              #
# --------------------------------------------------------------------------- #


@hyp
@given(data=hyp_st.data())
def test_field_properties_strategy_consistent(data):
    props = data.draw(st_field_properties())
    assert 1 <= len(props) <= 4
    for name, p in props.items():
        assert p["dims"] == field_dims(name)
        sx = "at_u_locations" in name
        assert ("x_at_u_locations" in p["dims"]) == sx


@hyp
@given(data=hyp_st.data())
def test_atmosphere_column_strategy_plausible(data):
    rho, h, qr = data.draw(st_atmosphere_column((4, 3, 8)))
    assert np.all(np.asarray(rho) > 0.0)
    assert np.all(np.diff(np.asarray(h), axis=-1) <= 0.0)
    assert np.all(np.asarray(qr) >= 0.0)
    assert np.asarray(h).shape == (4, 3, 9)


@hyp
@given(data=hyp_st.data())
def test_mesh_decomposition_partitions_domain(data):
    """Drawn 2-D factorization of 8: CartesianDecomposition block extents
    tile the physical domain exactly."""
    import jax

    from tasmania_tpu.parallel import make_mesh
    from tasmania_tpu.parallel.mesh import CartesianDecomposition

    px, py = data.draw(st_mesh_shape(8))
    nx = px * data.draw(hyp_st.integers(4, 7))
    ny = py * data.draw(hyp_st.integers(4, 7))
    mesh = make_mesh(jax.devices()[:8], shape=(px, py))
    dec = CartesianDecomposition(nx, ny, mesh, nb=2)
    assert dec.bx * px == nx and dec.by * py == ny


@hyp
@given(data=hyp_st.data())
def test_fall_velocity_formula_on_drawn_columns(data):
    """Kessler fall velocity on drawn plausible columns matches the WRF/Doms
    formula (reference ``physics/microphysics/kessler.py:1198-1203``) and is
    zero exactly where qr <= 0."""
    from tasmania_tpu.physics.microphysics.kessler import KesslerFallVelocity
    from tasmania_tpu.domain import Domain

    rho, h, qr = data.draw(st_atmosphere_column((5, 4, 6)))
    domain = Domain(
        (0.0, 1e5),
        5,
        (0.0, 1e5),
        4,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)),
        6,
        horizontal_boundary_type="identity",
        nb=1,
    )
    comp = KesslerFallVelocity(domain, "numerical")
    state = {
        "time": datetime(2000, 1, 1),
        "air_density": FieldArray(rho, "kg m^-3", DIMS3),
        "mass_fraction_of_precipitation_water_in_air": FieldArray(
            qr, "g g^-1", DIMS3
        ),
    }
    out = comp(state)
    vt = np.asarray(out["raindrop_fall_velocity"].data)
    rho_np = np.asarray(rho)
    qr_np = np.asarray(qr)
    expected = (
        36.34
        * (1.0e-3 * rho_np * np.maximum(qr_np, 0.0)) ** 0.1346
        * np.sqrt(rho_np[..., -1:] / rho_np)
    )
    np.testing.assert_allclose(vt, expected, rtol=1e-6)
    assert np.all(vt[qr_np <= 0.0] == 0.0)
