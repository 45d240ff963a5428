from tasmania_tpu.burgers.dynamics.advection import BurgersAdvection
from tasmania_tpu.burgers.dynamics.dycore import BurgersDynamicalCore
from tasmania_tpu.burgers.dynamics.stepper import BurgersStepper
from tasmania_tpu.burgers.physics.diffusion import BurgersHorizontalDiffusion
from tasmania_tpu.burgers.state import ZhaoSolutionFactory, ZhaoStateFactory

__all__ = [
    "BurgersAdvection",
    "BurgersDynamicalCore",
    "BurgersStepper",
    "BurgersHorizontalDiffusion",
    "ZhaoSolutionFactory",
    "ZhaoStateFactory",
]
