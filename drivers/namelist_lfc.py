"""Namelist for the moist isentropic LFC benchmark variant.

Mirrors reference ``drivers/benchmarking/isentropic_moist/namelist_lfc.py``:
identical constants to ``namelist_sus.py`` except there is NO separate
physics time-integration scheme — the physics chain runs inside the dycore's
(fast-)tendency concurrent coupling, so no physics stepper exists (verified by
diff against the reference pair: only ``physics_time_integration_scheme``
and the log path differ).
"""

from drivers.namelist_sus import *  # noqa: F401,F403

variant = "lfc"
physics_time_integration_scheme = None  # physics inside the dycore (lfc)
