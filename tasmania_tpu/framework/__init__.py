import tasmania_tpu.framework.stencil_definitions  # noqa: F401  (register generic stencils)
from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.framework.options import (
    BackendOptions,
    StorageOptions,
    TimeIntegrationOptions,
)
from tasmania_tpu.framework.registry import Registry, factor_register, factorize
from tasmania_tpu.framework.stencil import (
    StencilFactory,
    compile_stencil,
    compile_subroutine,
    stencil_definition,
    subroutine_definition,
)

__all__ = [
    "FieldArray",
    "BackendOptions",
    "StorageOptions",
    "TimeIntegrationOptions",
    "Registry",
    "factor_register",
    "factorize",
    "StencilFactory",
    "compile_stencil",
    "compile_subroutine",
    "stencil_definition",
    "subroutine_definition",
]
