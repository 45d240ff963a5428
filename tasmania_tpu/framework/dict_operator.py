"""Bulk algebra over state dictionaries with unit conversion.

TPU-native re-design of reference ``src/tasmania/utils/xarrayx.py:41``
(``DataArrayDictOperator``).  Every op is functional (returns a new dict of
``FieldArray``); unit conversions lower to scalar multiplies and the whole dict
expression fuses inside an enclosing jit — the reference's per-op compiled
stencils (``xarrayx.py:77-857``) are unnecessary under XLA.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.utils.units import per_second


PropertyDict = Mapping[str, Mapping[str, Any]]


def _names(properties: Optional[PropertyDict], *dicts) -> tuple:
    if properties is not None:
        return tuple(properties.keys())
    seen = []
    for d in dicts:
        for k in d:
            if k != "time" and k not in seen:
                seen.append(k)
    return tuple(seen)


def _units(properties: Optional[PropertyDict], name: str, fallback: FieldArray) -> str:
    if properties is not None and name in properties and "units" in properties[name]:
        return properties[name]["units"]
    return fallback.units


class DictOperator:
    """Namespace of functional dict ops (kept class-shaped for API parity with
    the reference's ``DataArrayDictOperator``)."""

    def __init__(self, *args, **kwargs) -> None:  # backend args accepted, unused
        pass

    @staticmethod
    def copy(src: Mapping[str, Any], field_properties: Optional[PropertyDict] = None):
        out: Dict[str, Any] = {}
        for name in _names(field_properties, src):
            if name in src:
                fa = src[name]
                out[name] = fa.to_units(_units(field_properties, name, fa))
        if "time" in src:
            out["time"] = src["time"]
        return out

    @staticmethod
    def add(a, b, field_properties=None, unshared_variables_in_output=True):
        out: Dict[str, Any] = {}
        for name in _names(field_properties, a, b):
            if name in a and name in b:
                u = _units(field_properties, name, a[name])
                out[name] = FieldArray(
                    a[name].to_units(u).data + b[name].to_units(u).data,
                    u,
                    a[name].dims,
                )
            elif unshared_variables_in_output:
                if name in a:
                    out[name] = a[name]
                elif name in b:
                    out[name] = b[name]
        if "time" in a:
            out["time"] = a["time"]
        return out

    @staticmethod
    def sub(a, b, field_properties=None, unshared_variables_in_output=True):
        out: Dict[str, Any] = {}
        for name in _names(field_properties, a, b):
            if name in a and name in b:
                u = _units(field_properties, name, a[name])
                out[name] = FieldArray(
                    a[name].to_units(u).data - b[name].to_units(u).data,
                    u,
                    a[name].dims,
                )
            elif unshared_variables_in_output:
                if name in a:
                    out[name] = a[name]
                elif name in b:
                    b_fa = b[name]
                    out[name] = b_fa.with_data(-b_fa.data)
        if "time" in a:
            out["time"] = a["time"]
        return out

    @staticmethod
    def scale(a, factor: float, field_properties=None):
        out: Dict[str, Any] = {}
        for name in _names(field_properties, a):
            if name in a:
                u = _units(field_properties, name, a[name])
                fa = a[name].to_units(u)
                out[name] = fa.with_data(factor * fa.data)
        if "time" in a:
            out["time"] = a["time"]
        return out

    @staticmethod
    def addsub(a, b, c, field_properties=None):
        """out = a + b - c over shared fields (reference ``iaddsub``)."""
        out: Dict[str, Any] = {}
        for name in _names(field_properties, a):
            if name in a and name in b and name in c:
                u = _units(field_properties, name, a[name])
                out[name] = FieldArray(
                    a[name].to_units(u).data
                    + b[name].to_units(u).data
                    - c[name].to_units(u).data,
                    u,
                    a[name].dims,
                )
            elif name in a:
                out[name] = a[name]
        if "time" in a:
            out["time"] = a["time"]
        return out

    @staticmethod
    def fma(state, tendencies, dt: float, field_properties=None):
        """out = state + dt·tendency, tendency converted to (state units)/s
        (reference ``xarrayx.py:689``)."""
        out: Dict[str, Any] = {}
        for name in _names(field_properties, state):
            if name not in state:
                continue
            u = _units(field_properties, name, state[name])
            s = state[name].to_units(u)
            if name in tendencies:
                t = tendencies[name].to_units(per_second(u))
                out[name] = FieldArray(s.data + dt * t.data, u, s.dims)
            else:
                out[name] = s
        return out

    @staticmethod
    def sts_rk2_0(dt: float, state, state_prv, tendencies, field_properties=None):
        """out = ½(state + state_prv + dt·tnd) (reference ``sts_rk2_0``)."""
        out: Dict[str, Any] = {}
        for name in _names(field_properties, state):
            if name not in state or name not in state_prv:
                continue
            u = _units(field_properties, name, state[name])
            s = state[name].to_units(u)
            p = state_prv[name].to_units(u)
            t = tendencies[name].to_units(per_second(u))
            out[name] = FieldArray(0.5 * (s.data + p.data + dt * t.data), u, s.dims)
        return out

    @staticmethod
    def sts_rk3ws_0(dt: float, state, state_prv, tendencies, field_properties=None):
        """out = (2·state + state_prv + dt·tnd)/3 (reference ``sts_rk3ws_0``)."""
        out: Dict[str, Any] = {}
        for name in _names(field_properties, state):
            if name not in state or name not in state_prv:
                continue
            u = _units(field_properties, name, state[name])
            s = state[name].to_units(u)
            p = state_prv[name].to_units(u)
            t = tendencies[name].to_units(per_second(u))
            out[name] = FieldArray((2.0 * s.data + p.data + dt * t.data) / 3.0, u, s.dims)
        return out

    @staticmethod
    def update(state, other):
        """Functional dict.update (reference ``update_swap`` minus the swap —
        no buffer reuse is needed under XLA)."""
        out = dict(state)
        out.update({k: v for k, v in other.items() if k != "time"})
        return out
