"""Process-pair fusion: [Kessler](rk2) + [SatAdj](rk2) in one kernel.

The SUS executor may fuse two ADJACENT single-substep processes through the
``register_process_pair_fuser`` registry (``framework/splitting.py``).  The
Kessler + saturation-adjustment pair kernel
(``ops/kessler_step.fused_kessler_satadj_rk2``) must be BITWISE the two
separate fused processes — identical op sequence, the intermediate species
just never leave VMEM.  Driven through the REAL SUS driver model in
interpret mode, pairs on vs TASMANIA_FUSE_PAIRS=0.
"""

from __future__ import annotations

import importlib
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run_physics_steps(pairs_on: bool, nsteps=2):
    import jax
    import jax.numpy as jnp

    import drivers.namelist_sus as nl
    from drivers.driver_namelist_sus import build_domain_and_state, build_model
    from tasmania_tpu.framework.field import FieldArray
    from tasmania_tpu.framework.splitting import _pair_plan

    os.environ["TASMANIA_FUSE_PAIRS"] = "1" if pairs_on else "0"
    try:
        importlib.reload(nl)
        nl.nx = nl.ny = 17
        nl.nz = 8
        nl.backend = "pallas:interpret"
        domain, state, pt = build_domain_and_state(nl)
        dycore, physics = build_model(nl, domain, pt)
        # the pair must actually engage when enabled
        plan = _pair_plan(physics._steppers)
        n_pairs = sum(1 for e in plan if e[0] == "pair")
        assert n_pairs == (1 if pairs_on else 0), plan

        dt_s = nl.timestep.total_seconds()
        hs = jnp.asarray(
            np.asarray(
                domain.numerical_grid.topography.steady_profile.to_units("m").data
            ),
            dtype=nl.so.dtype,
        )
        names = sorted(k for k in state if k != "time")
        st = {k: state[k] for k in names}
        for _ in range(nsteps):
            full = dict(st)
            full["topography_height"] = FieldArray(hs, "m", ("x", "y"))
            full = physics(full, dt_s)
            st = {k: full[k] for k in names}
        return {k: np.asarray(st[k].data) for k in names}
    finally:
        os.environ.pop("TASMANIA_FUSE_PAIRS", None)


def test_kessler_satadj_pair_bitwise():
    a = _run_physics_steps(True)
    b = _run_physics_steps(False)
    assert set(a) == set(b)
    for k in sorted(a):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
