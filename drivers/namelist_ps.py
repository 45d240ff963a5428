"""Namelist for the moist isentropic PS benchmark variant.

Mirrors reference ``drivers/benchmarking/isentropic_moist/namelist_ps.py``,
which is constant-for-constant identical to ``namelist_sus.py`` apart from
the output log path (verified by diff against the reference pair) — so this
module re-exports the shared parameter set.
"""

from drivers.namelist_sus import *  # noqa: F401,F403

variant = "ps"
