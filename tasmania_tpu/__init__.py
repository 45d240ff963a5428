"""tasmania-tpu: a TPU-native framework for composable finite-difference
weather/climate models (JAX / XLA / Pallas / shard_map).

Built from scratch with the capability surface of stubbiali/tasmania
(reference mounted at /root/reference); see SURVEY.md for the layer map.
"""

__version__ = "0.1.0"

from tasmania_tpu import burgers, domain, dwarfs, framework, isentropic, parallel, physics  # noqa: F401
from tasmania_tpu.framework.field import FieldArray  # noqa: F401
