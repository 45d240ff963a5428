"""Reusable component test harnesses.

TPU-native re-design of reference ``tests/suites/{domain,component,steppers}.py``
(SURVEY.md §4): compose a random domain + state, run a component, and validate
against a numpy re-derivation supplied by the concrete suite.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, Mapping, Optional

import numpy as np

import jax.numpy as jnp

from tasmania_tpu.domain import Domain
from tasmania_tpu.framework.field import FieldArray, field_shape


class DomainSuite:
    """Random-ish domain factory (reference ``suites/domain.py:35``)."""

    def __init__(
        self,
        rng: np.random.Generator,
        nx_range=(8, 20),
        ny_range=(8, 20),
        nz_range=(3, 8),
        boundary_type: str = "identity",
        nb: int = 1,
        boundary_kwargs: Optional[Dict[str, Any]] = None,
    ) -> None:
        nx = int(rng.integers(*nx_range))
        ny = int(rng.integers(*ny_range))
        nz = int(rng.integers(*nz_range))
        self.domain = Domain(
            (0.0, 1e4 * nx),
            nx,
            (0.0, 1e4 * ny),
            ny,
            FieldArray(np.array([400.0, 300.0]), "K", ("z",)),
            nz,
            horizontal_boundary_type=boundary_type,
            nb=nb,
            horizontal_boundary_kwargs=boundary_kwargs,
        )
        self.grid = self.domain.numerical_grid
        self.rng = rng

    def random_field(self, name: str, units: str, lo=-1.0, hi=1.0) -> FieldArray:
        shape = field_shape(name, (self.grid.nx, self.grid.ny, self.grid.nz))
        data = self.rng.uniform(lo, hi, size=shape)
        return FieldArray(jnp.asarray(data), units, ("x", "y", "z"))


class ComponentTestSuite:
    """Abstract harness (reference ``suites/component.py:39``): build a state
    from the component's declared inputs, run it, compare against
    :meth:`reference_call` (a numpy oracle the subclass provides)."""

    def __init__(self, ds: DomainSuite, component) -> None:
        self.ds = ds
        self.component = component

    def make_state(self, time: Optional[datetime] = None) -> Dict[str, Any]:
        state: Dict[str, Any] = {"time": time or datetime(2000, 1, 1)}
        for name, props in self.component.input_properties.items():
            state[name] = self.ds.random_field(name, props["units"], 0.5, 2.0)
        return state

    def raw(self, state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
        return {
            k: np.asarray(v.data)
            for k, v in state.items()
            if isinstance(v, FieldArray)
        }

    def reference_call(self, raw_state: Mapping[str, np.ndarray]):
        raise NotImplementedError

    def run_diagnostic(self, atol: float = 1e-10) -> None:
        state = self.make_state()
        out = self.component(state)
        expected = self.reference_call(self.raw(state))
        for name, exp in expected.items():
            np.testing.assert_allclose(
                np.asarray(out[name].data), exp, atol=atol, err_msg=name
            )

    def run_tendency(self, atol: float = 1e-10) -> None:
        state = self.make_state()
        tends, diags = self.component(state)
        exp_tends, exp_diags = self.reference_call(self.raw(state))
        for name, exp in exp_tends.items():
            np.testing.assert_allclose(
                np.asarray(tends[name].data), exp, atol=atol, err_msg=name
            )
        for name, exp in exp_diags.items():
            np.testing.assert_allclose(
                np.asarray(diags[name].data), exp, atol=atol, err_msg=name
            )
