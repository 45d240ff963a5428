"""Pallas fused-kernel tests (interpret mode on CPU; the compiled path is
exercised by the TPU bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tasmania_tpu.isentropic.dynamics.horizontal_fluxes import (
    IsentropicMinimalHorizontalFlux,
)
from tasmania_tpu.ops import fused_advection_step


@pytest.mark.parametrize(
    "order,scheme", [(3, "third_order_upwind"), (5, "fifth_order_upwind")]
)
@pytest.mark.parametrize("with_tnd", [False, True])
def test_fused_advection_matches_flux_library(order, scheme, with_tnd):
    rng = np.random.default_rng(0)
    nx, ny, nz, nb, F = 21, 17, 6, 3, 3
    dt, dx, dy = 2.0, 100.0, 120.0
    u = jnp.asarray(rng.normal(size=(nx + 1, ny, nz)))
    v = jnp.asarray(rng.normal(size=(nx, ny + 1, nz)))
    now = jnp.asarray(rng.normal(size=(F, nx, ny, nz)))
    phi = jnp.asarray(rng.normal(size=(F, nx, ny, nz)))
    tnd = jnp.asarray(rng.normal(size=(F, nx, ny, nz))) if with_tnd else None

    out = np.asarray(
        fused_advection_step(
            u, v, now, phi, tnd,
            order=order, nb=nb, dt=dt, dx=dx, dy=dy, tile_x=8, interpret=True,
        )
    )

    flux = IsentropicMinimalHorizontalFlux.factory(scheme)
    e = flux.extent
    iin, jin = slice(nb, nx - nb), slice(nb, ny - nb)
    ip = slice(nb - e + 1, nb - e + 1 + nx - 2 * nb)
    im = slice(nb - e, nb - e + nx - 2 * nb)
    jp = slice(nb - e + 1, nb - e + 1 + ny - 2 * nb)
    jm = slice(nb - e, nb - e + ny - 2 * nb)
    for f in range(F):
        fx = np.asarray(flux.flux_x(u, phi[f]))
        fy = np.asarray(flux.flux_y(v, phi[f]))
        div = (fx[ip, jin] - fx[im, jin]) / dx + (fy[iin, jp] - fy[iin, jm]) / dy
        rhs = div - np.asarray(tnd)[f][iin, jin] if with_tnd else div
        expected = np.asarray(now)[f].copy()
        expected[iin, jin] -= dt * rhs
        np.testing.assert_allclose(out[f], expected, rtol=1e-12, err_msg=f"field {f}")


def test_frame_untouched():
    rng = np.random.default_rng(1)
    nx, ny, nz, nb = 15, 15, 4, 3
    u = jnp.asarray(rng.normal(size=(nx + 1, ny, nz)))
    v = jnp.asarray(rng.normal(size=(nx, ny + 1, nz)))
    now = jnp.asarray(rng.normal(size=(1, nx, ny, nz)))
    phi = jnp.asarray(rng.normal(size=(1, nx, ny, nz)))
    out = np.asarray(
        fused_advection_step(u, v, now, phi, order=3, nb=nb, interpret=True)
    )
    np.testing.assert_allclose(out[0, :nb], np.asarray(now)[0, :nb])
    np.testing.assert_allclose(out[0, -nb:], np.asarray(now)[0, -nb:])
    np.testing.assert_allclose(out[0, :, :nb], np.asarray(now)[0, :, :nb])
    np.testing.assert_allclose(out[0, :, -nb:], np.asarray(now)[0, :, -nb:])


@pytest.mark.parametrize("scheme", ["upwind", "centered", "third_order_upwind",
                                    "fifth_order_upwind"])
@pytest.mark.parametrize("moist", [False, True])
def test_fused_vertical_advection_rk3ws_matches_generic_stepper(scheme, moist):
    """The whole-RK3WS Pallas kernel must reproduce the generic stepper
    (rk3ws fma algebra over the component's tendencies) bit-for-bit-ish."""
    from tasmania_tpu.domain import Domain
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.framework.steppers import TendencyStepper
    from tasmania_tpu.isentropic import (
        get_isentropic_state_from_brunt_vaisala_frequency,
    )
    from tasmania_tpu.isentropic.physics import IsentropicVerticalAdvection

    domain = Domain(
        (0.0, 1e5), 13, (0.0, 1e5), 11,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), 9,
        horizontal_boundary_type="identity", nb=3,
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, None, FieldArray(np.array(10.0), "m s^-1", ()),
        FieldArray(np.array(2.0), "m s^-1", ()),
        FieldArray(np.array(0.01), "s^-1", ()), moist=True,
    )
    state.pop("time", None)
    rng = np.random.default_rng(3)
    shp = np.asarray(state["air_isentropic_density"].data).shape
    state["tendency_of_air_potential_temperature"] = FieldArray(
        jnp.asarray(rng.normal(scale=1e-2, size=shp)), "K s^-1", ("x", "y", "z")
    )
    dt = 7.0

    va_ref = IsentropicVerticalAdvection(
        domain, flux_scheme=scheme, moist=moist, backend="jax"
    )
    va_fused = IsentropicVerticalAdvection(
        domain, flux_scheme=scheme, moist=moist, backend="pallas:interpret"
    )
    ref_stepper = TendencyStepper.factory("rk3ws", va_ref)
    fused_stepper = TendencyStepper.factory("rk3ws", va_fused)

    diags_ref, out_ref = ref_stepper(state, dt)
    diags_fused, out_fused = fused_stepper(state, dt)

    assert set(out_ref) == set(out_fused)
    assert diags_fused == {} or set(diags_fused) <= set(diags_ref)
    for name in out_ref:
        if name == "time":
            continue
        np.testing.assert_allclose(
            np.asarray(out_fused[name].data),
            np.asarray(out_ref[name].data),
            rtol=1e-6, atol=1e-10, err_msg=name,
        )


@pytest.mark.parametrize("order", ["first_order", "second_order", "third_order"])
def test_fused_smoothing_matches_dwarf(order):
    from tasmania_tpu.dwarfs.horizontal_smoothing import HorizontalSmoothing
    from tasmania_tpu.ops.smoothing_step import fused_smoothing

    rng = np.random.default_rng(7)
    F, nx, ny, nz, nb = 4, 21, 17, 6, 3
    fields = tuple(
        jnp.asarray(rng.normal(size=(nx, ny, nz)), dtype=jnp.float32)
        for _ in range(F)
    )
    n = {"first_order": 1, "second_order": 2, "third_order": 3}[order]

    core = HorizontalSmoothing.factory(
        order, (nx, ny, nz), 0.4, 0.9, 3, nb
    )
    gamma = jnp.stack([jnp.asarray(core._gamma, jnp.float32).reshape(-1)] * F)
    out = fused_smoothing(fields, gamma, order=n, nb=nb, tile_x=8, interpret=True)
    for f in range(F):
        expected = np.asarray(core(fields[f]))
        np.testing.assert_allclose(np.asarray(out[f]), expected, rtol=2e-6,
                                   atol=1e-6, err_msg=f"field {f}")


def test_isentropic_smoothing_fused_matches_jax():
    from tasmania_tpu.domain import Domain
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.isentropic import (
        get_isentropic_state_from_brunt_vaisala_frequency,
    )
    from tasmania_tpu.isentropic.physics import IsentropicHorizontalSmoothing

    domain = Domain(
        (0.0, 1e5), 13, (0.0, 1e5), 11,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), 7,
        horizontal_boundary_type="identity", nb=3,
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, None, FieldArray(np.array(10.0), "m s^-1", ()),
        FieldArray(np.array(1.0), "m s^-1", ()),
        FieldArray(np.array(0.01), "s^-1", ()), moist=True,
    )
    kw = dict(
        smooth_type="second_order", smooth_coeff=0.7, smooth_coeff_max=1.0,
        smooth_damp_depth=2, moist=True, smooth_moist_coeff=0.3,
    )
    ref = IsentropicHorizontalSmoothing(domain, backend="jax", **kw)
    fused = IsentropicHorizontalSmoothing(domain, backend="pallas:interpret", **kw)
    d_ref = ref(state)
    d_fused = fused(state)
    assert set(d_ref) == set(d_fused)
    for k in d_ref:
        np.testing.assert_allclose(
            np.asarray(d_fused[k].data), np.asarray(d_ref[k].data),
            rtol=2e-6, atol=1e-7, err_msg=k,
        )


@pytest.mark.parametrize("mode", ["mtg", "dry", "moist"])
def test_fused_diagnostics_matches_jnp(mode):
    """The MXU triangular-contraction diagnostics must match the jnp cumsum
    path (same recurrences, different summation association)."""
    from tasmania_tpu.domain import Domain
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.isentropic.dynamics.diagnostics import IsentropicDiagnostics

    domain = Domain(
        (0.0, 1e5), 13, (0.0, 1e5), 11,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), 9,
        horizontal_boundary_type="identity", nb=3,
        topography_type="gaussian",
        topography_kwargs={
            "max_height": FieldArray(np.array(500.0), "m", ()),
            "width_x": FieldArray(np.array(2.5e4), "m", ()),
            "width_y": FieldArray(np.array(2.5e4), "m", ()),
        },
    )
    grid = domain.numerical_grid
    rng = np.random.default_rng(11)
    s = jnp.asarray(
        50.0 + 5.0 * rng.random((grid.nx, grid.ny, grid.nz)), dtype=jnp.float32
    )
    pt = 2000.0

    ref = IsentropicDiagnostics(grid, backend="jax")
    fused = IsentropicDiagnostics(grid, backend="pallas:interpret")

    if mode == "mtg":
        a = [ref.get_montgomery_potential(s, pt)]
        b = [fused.get_montgomery_potential(s, pt)]
    else:
        moist = mode == "moist"
        a = list(ref.get_diagnostic_variables(s, pt, moist=moist))
        b = list(fused.get_diagnostic_variables(s, pt, moist=moist))
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=3e-6, atol=1e-4, err_msg=f"out {i}"
        )


def _small_moist_setup(nz=9):
    from tasmania_tpu.domain import Domain
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.isentropic import (
        get_isentropic_state_from_brunt_vaisala_frequency,
    )

    domain = Domain(
        (0.0, 1e5), 13, (0.0, 1e5), 11,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), nz,
        horizontal_boundary_type="identity", nb=3,
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, None, FieldArray(np.array(10.0), "m s^-1", ()),
        FieldArray(np.array(2.0), "m s^-1", ()),
        FieldArray(np.array(0.01), "s^-1", ()), moist=True,
    )
    state.pop("time", None)
    return domain, state


@pytest.mark.parametrize("scheme", ["first_order_upwind", "second_order_upwind"])
def test_fused_sedimentation_chain_matches_generic(scheme):
    """[FallVelocity -> Sedimentation] under rk3ws: the registered chain fuser
    must reproduce the generic coupled stepper."""
    from tasmania_tpu.framework.steppers import TendencyStepper
    from tasmania_tpu.isentropic.dynamics.diagnostics import IsentropicDiagnostics
    from tasmania_tpu.physics import KesslerFallVelocity, KesslerSedimentation

    domain, state = _small_moist_setup()
    grid = domain.numerical_grid
    # add rho/h diagnostics + some rain
    dd = IsentropicDiagnostics(grid, backend="jax")
    s = state["air_isentropic_density"].data
    import jax.numpy as jnp2
    from tasmania_tpu.framework.field import FieldArray
    p, exn, mtg, h, rho, t = dd.get_diagnostic_variables(
        jnp.asarray(s), 2000.0, moist=True
    )
    state["air_density"] = FieldArray(rho, "kg m^-3", ("x", "y", "z"))
    state["height_on_interface_levels"] = FieldArray(
        h, "m", ("x", "y", "z_on_interface_levels")
    )
    rng = np.random.default_rng(5)
    state["mass_fraction_of_precipitation_water_in_air"] = FieldArray(
        jnp.asarray(1e-3 * rng.random(rho.shape), dtype=jnp.float32),
        "g g^-1", ("x", "y", "z"),
    )
    dt = 7.0

    def build(backend):
        fv = KesslerFallVelocity(domain, "numerical", backend=backend)
        sd = KesslerSedimentation(
            domain, "numerical", sedimentation_flux_scheme=scheme, backend=backend
        )
        return TendencyStepper.factory("rk3ws", fv, sd, execution_policy="serial")

    d_ref, o_ref = build("jax")(state, dt)
    d_fus, o_fus = build("pallas:interpret")(state, dt)
    assert set(o_ref) == set(o_fus)
    for k in o_ref:
        np.testing.assert_allclose(
            np.asarray(o_fus[k].data), np.asarray(o_ref[k].data),
            rtol=1e-5, atol=1e-12, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(d_fus["raindrop_fall_velocity"].data),
        np.asarray(d_ref["raindrop_fall_velocity"].data),
        rtol=1e-5, atol=1e-10,
    )


@pytest.mark.parametrize("order", [1, 2])
def test_fused_sedimentation_vt_step_mode(order):
    """vt_mode="step" (the flagship namelist's setting, VERDICT r4 next #2)
    freezes the stage-1 ``qr^0.1346`` fall-velocity power for all three RK3WS
    stages; oracle = the same frozen-vt algebra in plain numpy slicing."""
    from tasmania_tpu.ops.sedimentation_step import (
        _dfdz,
        _fall_velocity,
        fused_sedimentation_rk3ws,
    )

    rng = np.random.default_rng(11)
    nx, ny, nz = 9, 8, 16
    rho = jnp.asarray(
        0.4 + 1.2 * rng.random((nx, ny, nz)), dtype=jnp.float32
    )
    h_if = jnp.asarray(
        np.sort(1e4 * rng.random((nx, ny, nz + 1)), axis=-1)[..., ::-1].copy(),
        dtype=jnp.float32,
    )
    qr = jnp.asarray(1e-3 * rng.random((nx, ny, nz)), dtype=jnp.float32)
    dt = 7.0

    h = 0.5 * (h_if[..., :-1] + h_if[..., 1:])
    vt1 = _fall_velocity(rho, qr)

    def tendency(qi):
        d = _dfdz(order, rho, h, qi, vt1) / rho[..., order:]
        z = jnp.zeros(d.shape[:-1] + (order,), d.dtype)
        return jnp.concatenate([z, d], axis=-1)

    q1 = qr + dt / 3.0 * tendency(qr)
    q2 = qr + dt / 2.0 * tendency(q1)
    q_ref = qr + dt * tendency(q2)

    q_out, vt_out = fused_sedimentation_rk3ws(
        rho, h_if, qr, order=order, dt=dt, vt_mode="step", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(q_out), np.asarray(q_ref), rtol=2e-5, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(vt_out), np.asarray(vt1), rtol=1e-6, atol=1e-10
    )


@pytest.mark.parametrize("order", [1, 2, 3])
def test_fused_smoothing_smagorinsky_matches_sequence(order):
    """The merged [smoothing -> Smagorinsky rk2] kernel (r5) must reproduce
    the two-kernel sequence bitwise: same smoothing expression tree, same
    RK2 ring algebra on the smoothed fields."""
    from tasmania_tpu.ops.smagorinsky_step import (
        fused_smagorinsky_rk2,
        fused_smoothing_smagorinsky_rk2,
    )
    from tasmania_tpu.ops.smoothing_step import fused_smoothing

    rng = np.random.default_rng(3)
    nx, ny, nz = 33, 21, 8  # nx >= TX + 8: the single-kernel smag RK2 path
    nb = 3
    fields = tuple(
        jnp.asarray(1.0 + 0.1 * rng.standard_normal((nx, ny, nz)),
                    dtype=jnp.float32)
        for _ in range(6)
    )
    gamma = jnp.asarray(
        0.2 + 0.5 * rng.random((6, nz)), dtype=jnp.float32
    )
    dx = dy = 1000.0
    cs = 0.18
    dt = 9.0

    sm = fused_smoothing(fields, gamma, order=order, nb=nb, tile_x=16,
                         interpret=True)
    su2, sv2 = fused_smagorinsky_rk2(
        sm[0], sm[1], sm[2], dx=dx, dy=dy, cs=cs, nb=nb, dt=dt, tile_x=16,
        interpret=True,
    )
    ref = [sm[0], su2, sv2, sm[3], sm[4], sm[5]]

    outs = fused_smoothing_smagorinsky_rk2(
        fields, gamma, order=order, nb=nb, dx=dx, dy=dy, cs=cs, dt=dt,
        tile_x=16, interpret=True,
    )
    for nm, a, b in zip("s su sv qv qc qr".split(), ref, outs):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=nm
        )


def test_smooth_smag_pair_fuser_in_sus_chain():
    """The SUS process-pair [IsentropicHorizontalSmoothing ->
    Smagorinsky(rk2)] must fuse (plan picks the pair) and reproduce the
    unfused chain exactly."""
    import os

    from tasmania_tpu.framework.options import TimeIntegrationOptions
    from tasmania_tpu.framework.splitting import SequentialUpdateSplitting
    from tasmania_tpu.isentropic.physics.horizontal_smoothing import (
        IsentropicHorizontalSmoothing,
    )
    from tasmania_tpu.isentropic.physics.turbulence import IsentropicSmagorinsky

    domain, state = _small_moist_setup()

    def run(fuse):
        sm = IsentropicHorizontalSmoothing(
            domain, "second_order", smooth_coeff=0.2, smooth_coeff_max=0.5,
            smooth_damp_depth=5, moist=True, smooth_moist_coeff=0.1,
            backend="pallas:interpret",
        )
        sg = IsentropicSmagorinsky(
            domain, smagorinsky_constant=0.18, backend="pallas:interpret"
        )
        sus = SequentialUpdateSplitting(
            TimeIntegrationOptions(component=sm),
            TimeIntegrationOptions(component=sg, scheme="rk2"),
        )
        os.environ["TASMANIA_FUSE_PAIRS"] = "1" if fuse else "0"
        os.environ["TASMANIA_FUSE_SMOOTH_SMAG"] = "1" if fuse else "0"
        try:
            out = sus(dict(state), 10.0)
        finally:
            os.environ.pop("TASMANIA_FUSE_PAIRS", None)
            os.environ.pop("TASMANIA_FUSE_SMOOTH_SMAG", None)
        return {k: np.asarray(v.data) for k, v in out.items() if k != "time"}

    a = run(False)
    b = run(True)
    assert set(a) == set(b)
    for k in sorted(a):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_vadv_sed_pair_fuser_in_sus_chain():
    """The SUS process-pair [IsentropicVerticalAdvection(rk3ws) ->
    [FallVelocity -> Sedimentation](rk3ws)] must fuse into one kernel and
    reproduce the unfused chain exactly."""
    import os

    from tasmania_tpu.framework.concurrent_coupling import ConcurrentCoupling
    from tasmania_tpu.framework.options import TimeIntegrationOptions
    from tasmania_tpu.framework.splitting import SequentialUpdateSplitting
    from tasmania_tpu.isentropic.dynamics.diagnostics import IsentropicDiagnostics
    from tasmania_tpu.isentropic.physics.vertical_advection import (
        IsentropicVerticalAdvection,
    )
    from tasmania_tpu.physics import KesslerFallVelocity, KesslerSedimentation

    domain, state = _small_moist_setup()
    grid = domain.numerical_grid
    dd = IsentropicDiagnostics(grid, backend="jax")
    from tasmania_tpu.framework.field import FieldArray

    s = jnp.asarray(state["air_isentropic_density"].data)
    p, exn, mtg, h, rho, t = dd.get_diagnostic_variables(s, 2000.0, moist=True)
    state["air_density"] = FieldArray(rho, "kg m^-3", ("x", "y", "z"))
    state["height_on_interface_levels"] = FieldArray(
        h, "m", ("x", "y", "z_on_interface_levels")
    )
    rng = np.random.default_rng(9)
    state["mass_fraction_of_precipitation_water_in_air"] = FieldArray(
        jnp.asarray(1e-3 * rng.random(rho.shape), dtype=jnp.float32),
        "g g^-1", ("x", "y", "z"),
    )
    state["tendency_of_air_potential_temperature"] = FieldArray(
        jnp.asarray(1e-3 * rng.standard_normal(rho.shape), dtype=jnp.float32),
        "K s^-1", ("x", "y", "z"),
    )

    def run(fuse):
        va = IsentropicVerticalAdvection(
            domain, flux_scheme="third_order_upwind", moist=True,
            tendency_of_air_potential_temperature_on_interface_levels=False,
            backend="pallas:interpret",
        )
        fv = KesslerFallVelocity(domain, "numerical", backend="pallas:interpret")
        sd = KesslerSedimentation(
            domain, "numerical",
            sedimentation_flux_scheme="second_order_upwind",
            vt_mode="step", backend="pallas:interpret",
        )
        sus = SequentialUpdateSplitting(
            TimeIntegrationOptions(component=va, scheme="rk3ws"),
            TimeIntegrationOptions(
                component=ConcurrentCoupling(fv, sd, execution_policy="serial"),
                scheme="rk3ws",
            ),
        )
        os.environ["TASMANIA_FUSE_PAIRS"] = "1" if fuse else "0"
        os.environ["TASMANIA_FUSE_VADV_SED"] = "1" if fuse else "0"
        try:
            out = sus(dict(state), 8.0)
        finally:
            os.environ.pop("TASMANIA_FUSE_PAIRS", None)
            os.environ.pop("TASMANIA_FUSE_VADV_SED", None)
        return {k: np.asarray(v.data) for k, v in out.items() if k != "time"}

    a = run(False)
    b = run(True)
    assert set(a) == set(b)
    for k in sorted(a):
        if k in (
            "mass_fraction_of_precipitation_water_in_air",
            "raindrop_fall_velocity",
        ):
            # the sedimentation algebra runs on the advected qr as an
            # in-kernel VALUE: same expression tree, but the different
            # fusion context licenses different fma contractions (~ulp)
            np.testing.assert_allclose(
                a[k], b[k], rtol=1e-5, atol=1e-12, err_msg=k
            )
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_fused_smagorinsky_rk2_matches_generic():
    from tasmania_tpu.framework.steppers import TendencyStepper
    from tasmania_tpu.isentropic.physics import IsentropicSmagorinsky

    domain, state = _small_moist_setup()
    dt = 7.0

    def build(backend):
        return TendencyStepper.factory(
            "rk2", IsentropicSmagorinsky(domain, 0.18, backend=backend)
        )

    d_ref, o_ref = build("jax")(state, dt)
    d_fus, o_fus = build("pallas:interpret")(state, dt)
    assert set(o_ref) == set(o_fus)
    for k in o_ref:
        np.testing.assert_allclose(
            np.asarray(o_fus[k].data), np.asarray(o_ref[k].data),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_fused_kessler_rk2_chain_matches_generic():
    from tasmania_tpu.framework.steppers import TendencyStepper
    from tasmania_tpu.isentropic.utils import (
        AirPotentialTemperatureToDiagnostic,
        AirPotentialTemperatureToTendency,
    )
    from tasmania_tpu.physics import (
        KesslerMicrophysics,
        KesslerSaturationAdjustmentPrognostic,
    )

    domain, state = _small_moist_setup()

    rng = np.random.default_rng(9)
    shp = np.asarray(state["air_isentropic_density"].data).shape
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.isentropic.dynamics.diagnostics import IsentropicDiagnostics
    dd = IsentropicDiagnostics(domain.numerical_grid, backend="jax")
    p, exn, mtg, h, rho, t = dd.get_diagnostic_variables(
        jnp.asarray(state["air_isentropic_density"].data), 2000.0, moist=True
    )
    state["air_density"] = FieldArray(rho, "kg m^-3", ("x", "y", "z"))
    state["air_temperature"] = FieldArray(t, "K", ("x", "y", "z"))
    state["air_pressure_on_interface_levels"] = FieldArray(
        p, "Pa", ("x", "y", "z_on_interface_levels")
    )
    state["exner_function_on_interface_levels"] = FieldArray(
        exn, "J K^-1 kg^-1", ("x", "y", "z_on_interface_levels")
    )
    state["mass_fraction_of_precipitation_water_in_air"] = FieldArray(
        jnp.asarray(1e-3 * rng.random(shp), dtype=jnp.float32), "g g^-1", ("x", "y", "z")
    )
    state["mass_fraction_of_cloud_liquid_water_in_air"] = FieldArray(
        jnp.asarray(2e-3 * rng.random(shp), dtype=jnp.float32), "g g^-1", ("x", "y", "z")
    )
    state["tendency_of_air_potential_temperature"] = FieldArray(
        jnp.asarray(1e-3 * rng.standard_normal(shp), dtype=jnp.float32),
        "K s^-1", ("x", "y", "z"),
    )
    dt = 7.0

    def build_chain_a(backend):
        ke = KesslerMicrophysics(
            domain, "numerical", air_pressure_on_interface_levels=True,
            tendency_of_air_potential_temperature_in_diagnostics=False,
            rain_evaporation=True, backend=backend,
        )
        t2d = AirPotentialTemperatureToDiagnostic(domain, "numerical", backend=backend)
        return TendencyStepper.factory("rk2", ke, t2d, execution_policy="serial")

    def build_chain_b(backend):
        d2t = AirPotentialTemperatureToTendency(domain, "numerical", backend=backend)
        sa = KesslerSaturationAdjustmentPrognostic(
            domain, "numerical", air_pressure_on_interface_levels=True,
            saturation_rate=0.3, backend=backend,
        )
        t2d = AirPotentialTemperatureToDiagnostic(domain, "numerical", backend=backend)
        return TendencyStepper.factory("rk2", d2t, sa, t2d, execution_policy="serial")

    for build in (build_chain_a, build_chain_b):
        d_ref, o_ref = build("jax")(state, dt)
        d_fus, o_fus = build("pallas:interpret")(state, dt)
        assert set(o_ref) == set(o_fus), build.__name__
        for k in o_ref:
            np.testing.assert_allclose(
                np.asarray(o_fus[k].data), np.asarray(o_ref[k].data),
                rtol=1e-5, atol=1e-10, err_msg=f"{build.__name__}:{k}",
            )
        np.testing.assert_allclose(
            np.asarray(d_fus["tendency_of_air_potential_temperature"].data),
            np.asarray(d_ref["tendency_of_air_potential_temperature"].data),
            rtol=1e-5, atol=1e-9, err_msg=build.__name__,
        )


def test_smag_rk2_single_kernel_matches_two_launch():
    """The whole-RK2 single-kernel Smagorinsky path (r5) is bitwise equal to
    the two-launch pair: same per-column arithmetic, the su1/sv1
    intermediates just never leave VMEM."""
    import os

    from tasmania_tpu.ops.smagorinsky_step import (
        _smag_rk2_fused,
        _smag_stage,
    )

    rng = np.random.default_rng(11)
    nx, ny, nz = 27, 21, 5
    s = jnp.asarray(rng.uniform(40.0, 60.0, (nx, ny, nz)))
    su = jnp.asarray(rng.normal(500.0, 50.0, (nx, ny, nz)))
    sv = jnp.asarray(rng.normal(100.0, 40.0, (nx, ny, nz)))
    kw = dict(dx=2200.0, dy=2200.0, cs=0.18, nb=3, interpret=True)

    su1, sv1 = _smag_stage(s, su, sv, su, sv, c=0.5 * 5.0, tile_x=8, **kw)
    ref = _smag_stage(s, su1, sv1, su, sv, c=5.0, tile_x=8, **kw)
    out = _smag_rk2_fused(s, su, sv, dt=5.0, tile_x=8, **kw)
    for name, a, b in zip(("su", "sv"), out, ref):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
