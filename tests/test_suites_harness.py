"""Exercise the reusable suites with a concrete component oracle."""

import numpy as np

from tasmania_tpu.framework.core_components import DiagnosticComponent, TendencyComponent

from suites import ComponentTestSuite, DomainSuite


class Doubler(DiagnosticComponent):
    @property
    def input_properties(self):
        return {"phi": {"dims": ("x", "y", "z"), "units": "m"}}

    @property
    def diagnostic_properties(self):
        return {"psi": {"dims": ("x", "y", "z"), "units": "m"}}

    def array_call(self, state):
        return {"psi": 2.0 * state["phi"]}


class DoublerSuite(ComponentTestSuite):
    def reference_call(self, raw):
        return {"psi": 2.0 * raw["phi"]}


class Decay(TendencyComponent):
    @property
    def input_properties(self):
        return {"phi": {"dims": ("x", "y", "z"), "units": "m"}}

    @property
    def tendency_properties(self):
        return {"phi": {"dims": ("x", "y", "z"), "units": "m s^-1"}}

    def array_call(self, state):
        return {"phi": -0.5 * state["phi"]}, {}


class DecaySuite(ComponentTestSuite):
    def reference_call(self, raw):
        return {"phi": -0.5 * raw["phi"]}, {}


def test_diagnostic_suite():
    ds = DomainSuite(np.random.default_rng(0))
    DoublerSuite(ds, Doubler(ds.domain, "numerical")).run_diagnostic()


def test_tendency_suite():
    ds = DomainSuite(np.random.default_rng(1))
    DecaySuite(ds, Decay(ds.domain, "numerical")).run_tendency()
