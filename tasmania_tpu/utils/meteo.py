"""Meteorological formulas (reference ``src/tasmania/utils/meteo.py:51,192,251,276``).

Ported verbatim (they are validation-critical): Tetens and Goff-Gratch
saturation vapor pressure, RH → water-vapor mixing ratio, and the isothermal
analytic mountain-wave solution.
"""

from __future__ import annotations

import numpy as np

from tasmania_tpu.utils.array import get_namespace


def tetens_formula(t):
    """Saturation vapor pressure over water [Pa] (reference ``meteo.py:251``)."""
    xp = get_namespace(t)
    pw, aw, tr, bw = 610.78, 17.27, 273.16, 35.86
    return pw * xp.exp(aw * (t - tr) / (t - bw))


def goff_gratch_formula(t):
    """Saturation vapor pressure over water [Pa] (reference ``meteo.py:276``)."""
    xp = get_namespace(t)
    c1, c2, c3, c4, c5, c6 = 7.90298, 5.02808, 1.3816e-7, 11.344, 8.1328e-3, 3.49149
    t_st, e_st = 373.15, 1013.25e2
    return e_st * 10 ** (
        -c1 * (t_st / t - 1.0)
        + c2 * xp.log10(t_st / t)
        - c3 * (10.0 ** (c4 * (1.0 - t / t_st)) - 1.0)
        + c5 * (10 ** (-c6 * (t_st / t - 1.0)) - 1.0)
    )


def convert_relative_humidity_to_water_vapor(method: str, p, t, rh):
    """RH → qv [g g^-1] on raw arrays in (Pa, K, 1) (reference ``meteo.py:192``)."""
    xp = get_namespace(p)
    if method == "tetens":
        p_sat = tetens_formula(t)
    elif method == "goff_gratch":
        p_sat = goff_gratch_formula(t)
    else:
        raise ValueError(f"unknown saturation formula {method!r}")
    pw = rh * p_sat
    B = 0.62198
    return xp.where(p_sat >= 0.616 * p, 0.0, B * pw / (p - pw))
