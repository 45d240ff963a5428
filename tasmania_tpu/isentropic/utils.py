"""Isentropic-model promoters (reference ``src/tasmania/isentropic/utils.py:27,46``)."""

from __future__ import annotations

from tasmania_tpu.framework.promoter import (
    FromDiagnosticToTendency,
    FromTendencyToDiagnostic,
)

DIMS = ("x", "y", "z")


class AirPotentialTemperatureToDiagnostic(FromTendencyToDiagnostic):
    """Expose the θ-tendency as the state diagnostic
    ``tendency_of_air_potential_temperature``."""

    @property
    def input_tendency_properties(self):
        return {
            "air_potential_temperature": {
                "dims": DIMS,
                "units": "K s^-1",
                "diagnostic_name": "tendency_of_air_potential_temperature",
            }
        }


class AirPotentialTemperatureToTendency(FromDiagnosticToTendency):
    """Demote the diagnostic ``tendency_of_air_potential_temperature`` back to
    a tendency on ``air_potential_temperature``."""

    @property
    def input_properties(self):
        return {
            "tendency_of_air_potential_temperature": {
                "dims": DIMS,
                "units": "K s^-1",
                "tendency_name": "air_potential_temperature",
            }
        }


# ------------------------------------------------------------------------------ #
# chain fusers: the SUS driver's RK2 Kessler / saturation-adjustment bundles     #
# (reference drivers/benchmarking/isentropic_moist/driver_namelist_sus.py        #
#  :257-341) — pure pointwise chains fused over both RK stages in VMEM           #
# ------------------------------------------------------------------------------ #

mfwv = "mass_fraction_of_water_vapor_in_air"
mfcw = "mass_fraction_of_cloud_liquid_water_in_air"
mfpw = "mass_fraction_of_precipitation_water_in_air"
_TTD = "tendency_of_air_potential_temperature"


def _kessler_chain_matches(components, scheme) -> bool:
    from tasmania_tpu.physics import KesslerMicrophysics

    return (
        scheme == "rk2"
        and len(components) == 2
        and isinstance(components[0], KesslerMicrophysics)
        and isinstance(components[1], AirPotentialTemperatureToDiagnostic)
        and components[0].backend.startswith("pallas")
        and components[0]._p_stg
        and components[0]._rain_evaporation
        and not components[0]._pttd
    )


def _kessler_chain_fuser(components, state, dt, output_properties):
    from tasmania_tpu.framework.field import FieldArray, get_array_dict
    from tasmania_tpu.ops.kessler_step import fused_kessler_rk2

    ke = components[0]
    raw = get_array_dict(state, ke.input_properties)
    rd = ke.rpc["gas_constant_of_dry_air"]
    rv = ke.rpc["gas_constant_of_water_vapor"]
    qv, qc, qr, th = fused_kessler_rk2(
        raw["air_density"],
        raw["air_temperature"],
        raw["air_pressure_on_interface_levels"],
        raw["exner_function_on_interface_levels"],
        raw[mfwv],
        raw[mfcw],
        raw[mfpw],
        a=ke._a,
        k1=ke._k1,
        k2=ke._k2,
        beta=rd / rv,
        lhvw=ke.rpc["latent_heat_of_vaporization_of_water"],
        dt=float(dt),
        interpret=ke.backend == "pallas:interpret",
    )
    out = {
        n: FieldArray(arr, output_properties[n]["units"], DIMS)
        for n, arr in ((mfwv, qv), (mfcw, qc), (mfpw, qr))
    }
    return {_TTD: FieldArray(th, "K s^-1", DIMS)}, out


def _satadj_chain_matches(components, scheme) -> bool:
    from tasmania_tpu.physics import KesslerSaturationAdjustmentPrognostic

    return (
        scheme == "rk2"
        and len(components) == 3
        and isinstance(components[0], AirPotentialTemperatureToTendency)
        and isinstance(components[1], KesslerSaturationAdjustmentPrognostic)
        and isinstance(components[2], AirPotentialTemperatureToDiagnostic)
        and components[1].backend.startswith("pallas")
        and components[1]._p_stg
    )


def _satadj_chain_fuser(components, state, dt, output_properties):
    from tasmania_tpu.framework.field import FieldArray, get_array_dict
    from tasmania_tpu.ops.kessler_step import fused_satadj_rk2

    sa = components[1]
    props = dict(sa.input_properties)
    props[_TTD] = {"dims": DIMS, "units": "K s^-1"}
    raw = get_array_dict(state, props)
    rd = sa.rpc["gas_constant_of_dry_air"]
    rv = sa.rpc["gas_constant_of_water_vapor"]
    qv, qc, th = fused_satadj_rk2(
        raw["air_temperature"],
        raw["air_pressure_on_interface_levels"],
        raw["exner_function_on_interface_levels"],
        raw[mfwv],
        raw[mfcw],
        raw[_TTD],
        sr=sa._sr,
        beta=rd / rv,
        lhvw=sa.rpc["latent_heat_of_vaporization_of_water"],
        cp=sa.rpc["specific_heat_of_dry_air_at_constant_pressure"],
        rv=rv,
        dt=float(dt),
        interpret=sa.backend == "pallas:interpret",
    )
    out = {
        n: FieldArray(arr, output_properties[n]["units"], DIMS)
        for n, arr in ((mfwv, qv), (mfcw, qc))
    }
    return {_TTD: FieldArray(th, "K s^-1", DIMS)}, out


# ------------------------------------------------------------------------------ #
# process-pair fuser: the two ADJACENT SUS processes [Kessler](rk2) then         #
# [SatAdj](rk2) in ONE kernel — the intermediate qv/qc and the Kessler           #
# θ-tendency never round-trip HBM, and t/p/exn are read once                     #
# ------------------------------------------------------------------------------ #


def _kessler_satadj_pair_matches(stepper_a, stepper_b) -> bool:
    return (
        getattr(stepper_a, "name", "") == "rk2"
        and getattr(stepper_b, "name", "") == "rk2"
        and not getattr(stepper_a, "_enforce_hb", True)
        and not getattr(stepper_b, "_enforce_hb", True)
        and _kessler_chain_matches(stepper_a._coupling.components, "rk2")
        and _satadj_chain_matches(stepper_b._coupling.components, "rk2")
    )


def _kessler_satadj_pair_fuser(stepper_a, stepper_b, state, td):
    from tasmania_tpu.framework.field import FieldArray, get_array_dict
    from tasmania_tpu.ops.kessler_step import fused_kessler_satadj_rk2

    ke = stepper_a._coupling.components[0]
    sa = stepper_b._coupling.components[1]
    raw = get_array_dict(state, ke.input_properties)
    rd = ke.rpc["gas_constant_of_dry_air"]
    rv = ke.rpc["gas_constant_of_water_vapor"]
    dt = td.total_seconds()
    qv, qc, qr, th = fused_kessler_satadj_rk2(
        raw["air_density"],
        raw["air_temperature"],
        raw["air_pressure_on_interface_levels"],
        raw["exner_function_on_interface_levels"],
        raw[mfwv],
        raw[mfcw],
        raw[mfpw],
        a=ke._a,
        k1=ke._k1,
        k2=ke._k2,
        sr=sa._sr,
        beta=rd / rv,
        lhvw=ke.rpc["latent_heat_of_vaporization_of_water"],
        cp=sa.rpc["specific_heat_of_dry_air_at_constant_pressure"],
        rv=rv,
        dt=float(dt),
        interpret=ke.backend == "pallas:interpret",
    )
    q_units = stepper_a.output_properties
    out = {
        n: FieldArray(arr, q_units[n]["units"], DIMS)
        for n, arr in ((mfwv, qv), (mfcw, qc), (mfpw, qr))
    }
    return {_TTD: FieldArray(th, "K s^-1", DIMS)}, out


def _register_kessler_chain_fusers() -> None:
    from tasmania_tpu.framework.concurrent_coupling import register_chain_fuser
    from tasmania_tpu.framework.splitting import register_process_pair_fuser

    register_chain_fuser(_kessler_chain_matches, _kessler_chain_fuser)
    register_chain_fuser(_satadj_chain_matches, _satadj_chain_fuser)
    register_process_pair_fuser(
        _kessler_satadj_pair_matches, _kessler_satadj_pair_fuser
    )


_register_kessler_chain_fusers()
