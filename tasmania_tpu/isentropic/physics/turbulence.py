"""Smagorinsky turbulence in conservative (momentum) form for the isentropic
model (reference ``src/tasmania/isentropic/physics/turbulence.py:38``):
u = su/s, apply the velocity-form core, then scale tendencies by s."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tasmania_tpu.physics.turbulence import Smagorinsky2d, _frame_paste, smagorinsky_core
from tasmania_tpu.utils.array import get_namespace

DIMS = ("x", "y", "z")


class IsentropicSmagorinsky(Smagorinsky2d):
    @property
    def input_properties(self):
        return {
            "air_isentropic_density": {"dims": DIMS, "units": "kg m^-2 K^-1"},
            "x_momentum_isentropic": {"dims": DIMS, "units": "kg m^-1 K^-1 s^-1"},
            "y_momentum_isentropic": {"dims": DIMS, "units": "kg m^-1 K^-1 s^-1"},
        }

    @property
    def tendency_properties(self):
        return {
            "x_momentum_isentropic": {"dims": DIMS, "units": "kg m^-1 K^-1 s^-2"},
            "y_momentum_isentropic": {"dims": DIMS, "units": "kg m^-1 K^-1 s^-2"},
        }

    def fused_rk_step(self, scheme, state, dt, output_properties):
        """Whole-RK2 Pallas path (ops/smagorinsky_step): one fused
        evaluate-and-update kernel per stage.  Returns (diagnostics, out) or
        None when not applicable."""
        if scheme != "rk2" or not self.backend.startswith("pallas"):
            return None
        if not getattr(self.horizontal_boundary, "is_degenerate", True):
            # the fused RK2 kernel's frame protocol is local-coordinate; a
            # real DistributedBoundary routes through array_call, whose
            # restrict/refresh hooks are shard-aware
            return None
        from tasmania_tpu.framework.field import FieldArray, get_array_dict
        from tasmania_tpu.ops.smagorinsky_step import fused_smagorinsky_rk2

        raw = get_array_dict(state, self.input_properties)
        dx, dy = self._spacings()
        su_new, sv_new = fused_smagorinsky_rk2(
            raw["air_isentropic_density"],
            raw["x_momentum_isentropic"],
            raw["y_momentum_isentropic"],
            dx=dx,
            dy=dy,
            cs=self._cs,
            nb=self._nb,
            dt=float(dt),
            interpret=self.backend == "pallas:interpret",
        )
        out = {
            "x_momentum_isentropic": FieldArray(
                su_new, output_properties["x_momentum_isentropic"]["units"], DIMS
            ),
            "y_momentum_isentropic": FieldArray(
                sv_new, output_properties["y_momentum_isentropic"]["units"], DIMS
            ),
        }
        return {}, out

    def array_call(self, state):
        s = state["air_isentropic_density"]
        u = state["x_momentum_isentropic"] / s
        v = state["y_momentum_isentropic"] / s
        xp = get_namespace(s)
        dx, dy = self._spacings()
        nb = self._nb
        hb = self.horizontal_boundary
        u_tnd, v_tnd = smagorinsky_core(u, v, dx, dy, self._cs, nb)
        s_in = s[nb : s.shape[0] - nb, nb : s.shape[1] - nb]
        # distributed: global-frame zeroing + ONE fused halo refresh on the
        # tendencies (identity single-device; see Smagorinsky2d.array_call)
        out_su, out_sv = hb.refresh_halos_many(
            [
                hb.restrict_stencil_output(
                    _frame_paste(s.shape, nb, s_in * u_tnd, xp, s.dtype), nb=nb
                ),
                hb.restrict_stencil_output(
                    _frame_paste(s.shape, nb, s_in * v_tnd, xp, s.dtype), nb=nb
                ),
            ]
        )
        return (
            {"x_momentum_isentropic": out_su, "y_momentum_isentropic": out_sv},
            {},
        )
