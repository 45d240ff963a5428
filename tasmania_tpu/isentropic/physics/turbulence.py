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


# ------------------------------------------------------------------------------ #
# SUS process-pair fuser: [HorizontalSmoothing -> Smagorinsky(rk2)] (r5)         #
# ------------------------------------------------------------------------------ #


def _smooth_smag_pair_matches(comp_a, stepper_b) -> bool:
    import os

    from tasmania_tpu.isentropic.physics.horizontal_smoothing import (
        IsentropicHorizontalSmoothing,
    )

    # default OFF: measured ~-0.3% on chip vs the two-kernel pair
    # (BENCH_NOTES r5_smooth_smag) - available as an opt-in experiment
    if os.environ.get("TASMANIA_FUSE_SMOOTH_SMAG", "0") != "1":
        return False
    if not isinstance(comp_a, IsentropicHorizontalSmoothing):
        return False
    if not comp_a.backend.startswith("pallas") or comp_a._core.axis is not None:
        return False
    if getattr(stepper_b, "name", "") != "rk2" or getattr(
        stepper_b, "_enforce_hb", True
    ):
        return False
    comps = getattr(getattr(stepper_b, "_coupling", None), "components", ())
    if len(comps) != 1 or not isinstance(comps[0], IsentropicSmagorinsky):
        return False
    if not comps[0].backend.startswith("pallas"):
        return False
    hb = comp_a.horizontal_boundary
    if not getattr(hb, "is_degenerate", True):
        # the merged kernel's frame protocol is local-coordinate; distributed
        # runs keep the two shard-aware passes
        return False
    n = comp_a._core.order
    nb = hb.nb
    nx = comp_a.grid.nx
    return nb >= max(n, 2) and nx >= 2 * nb + 1 and nx >= 8 + 2 * n + 4


def _smooth_smag_pair_fuser(comp_a, stepper_b, state, td):
    """Run ``fused_smoothing_smagorinsky_rk2``: one kernel smooths every
    field and RK2-steps the momenta; the smoothed momenta (dead values in
    the sequential pair — Smagorinsky immediately overwrites them) never
    reach HBM."""
    import jax.numpy as jnp

    from tasmania_tpu.framework.field import FieldArray, get_array_dict
    from tasmania_tpu.ops.smagorinsky_step import fused_smoothing_smagorinsky_rk2

    smag = stepper_b._coupling.components[0]
    names = [
        "air_isentropic_density",
        "x_momentum_isentropic",
        "y_momentum_isentropic",
    ]
    gammas = [comp_a._core._gamma] * 3
    if comp_a._moist:
        from tasmania_tpu.isentropic.physics.horizontal_smoothing import (
            mfcw, mfpw, mfwv,
        )

        names += [mfwv, mfcw, mfpw]
        gammas += [comp_a._core_moist._gamma] * 3
    raw = get_array_dict(state, comp_a.input_properties)
    fields = tuple(raw[nm] for nm in names)
    gamma = jnp.stack(
        [jnp.asarray(g, dtype=fields[0].dtype).reshape(-1) for g in gammas]
    )
    dx, dy = smag._spacings()
    import os

    outs = fused_smoothing_smagorinsky_rk2(
        fields,
        gamma,
        order=comp_a._core.order,
        nb=comp_a.horizontal_boundary.nb,
        dx=dx,
        dy=dy,
        cs=smag._cs,
        dt=float(td.total_seconds()),
        # trace-time tuning knob (one variant per process); 24 on-chip tuned
        # (16: 6.824e8, 24: 6.882e8, 32: VMEM OOM — BENCH_NOTES r5_smooth_smag)
        tile_x=int(os.environ.get("TASMANIA_TILE_X_SMSM", "24")),
        interpret=comp_a.backend == "pallas:interpret",
    )
    dprops = comp_a.diagnostic_properties
    diagnostics = {
        names[0]: FieldArray(outs[0], dprops[names[0]]["units"], DIMS)
    }
    for i, nm in enumerate(names[3:]):
        diagnostics[nm] = FieldArray(outs[3 + i], dprops[nm]["units"], DIMS)
    oprops = stepper_b.output_properties
    stepped = {
        "x_momentum_isentropic": FieldArray(
            outs[1], oprops["x_momentum_isentropic"]["units"], DIMS
        ),
        "y_momentum_isentropic": FieldArray(
            outs[2], oprops["y_momentum_isentropic"]["units"], DIMS
        ),
    }
    return diagnostics, stepped


def _register_smooth_smag_pair_fuser() -> None:
    from tasmania_tpu.framework.splitting import register_process_pair_fuser

    register_process_pair_fuser(
        _smooth_smag_pair_matches, _smooth_smag_pair_fuser
    )


_register_smooth_smag_pair_fuser()
