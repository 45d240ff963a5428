import tasmania_tpu.framework.stencil_definitions  # noqa: F401  (register generic stencils)
from tasmania_tpu.framework.composite import DiagnosticComponentComposite
from tasmania_tpu.framework.concurrent_coupling import ConcurrentCoupling
from tasmania_tpu.framework.core_components import (
    DiagnosticComponent,
    ImplicitTendencyComponent,
    Stepper,
    TendencyComponent,
)
from tasmania_tpu.framework.dict_operator import DictOperator
from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.framework.options import (
    BackendOptions,
    StorageOptions,
    TimeIntegrationOptions,
)
from tasmania_tpu.framework.promoter import (
    FromDiagnosticToTendency,
    FromTendencyToDiagnostic,
)
from tasmania_tpu.framework.registry import Registry, factor_register, factorize
from tasmania_tpu.framework.splitting import (
    ParallelSplitting,
    SequentialTendencySplitting,
    SequentialUpdateSplitting,
)
from tasmania_tpu.framework.stencil import (
    StencilFactory,
    compile_stencil,
    compile_subroutine,
    stencil_definition,
    subroutine_definition,
)
from tasmania_tpu.framework.steppers import SequentialTendencyStepper, TendencyStepper

__all__ = [
    "DiagnosticComponentComposite",
    "ConcurrentCoupling",
    "DiagnosticComponent",
    "ImplicitTendencyComponent",
    "Stepper",
    "TendencyComponent",
    "DictOperator",
    "FieldArray",
    "BackendOptions",
    "StorageOptions",
    "TimeIntegrationOptions",
    "FromDiagnosticToTendency",
    "FromTendencyToDiagnostic",
    "Registry",
    "factor_register",
    "factorize",
    "ParallelSplitting",
    "SequentialTendencySplitting",
    "SequentialUpdateSplitting",
    "StencilFactory",
    "compile_stencil",
    "compile_subroutine",
    "stencil_definition",
    "subroutine_definition",
    "SequentialTendencyStepper",
    "TendencyStepper",
]
