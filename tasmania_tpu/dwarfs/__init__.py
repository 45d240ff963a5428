from tasmania_tpu.dwarfs.diagnostics import HorizontalVelocity, WaterConstituent
from tasmania_tpu.dwarfs.horizontal_diffusion import HorizontalDiffusion
from tasmania_tpu.dwarfs.horizontal_hyperdiffusion import HorizontalHyperDiffusion
from tasmania_tpu.dwarfs.horizontal_smoothing import HorizontalSmoothing
from tasmania_tpu.dwarfs.vertical_damping import VerticalDamping

__all__ = [
    "HorizontalVelocity",
    "WaterConstituent",
    "HorizontalDiffusion",
    "HorizontalHyperDiffusion",
    "HorizontalSmoothing",
    "VerticalDamping",
]
