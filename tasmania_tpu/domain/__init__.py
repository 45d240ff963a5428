from tasmania_tpu.domain import boundaries  # noqa: F401  (register subclasses)
from tasmania_tpu.domain.domain import Domain
from tasmania_tpu.domain.grid import Grid, NumericalGrid, PhysicalGrid
from tasmania_tpu.domain.horizontal_boundary import HorizontalBoundary
from tasmania_tpu.domain.horizontal_grid import (
    HorizontalGrid,
    NumericalHorizontalGrid,
    PhysicalHorizontalGrid,
)
from tasmania_tpu.domain.topography import (
    NumericalTopography,
    PhysicalTopography,
    Topography,
)

__all__ = [
    "Domain",
    "Grid",
    "NumericalGrid",
    "PhysicalGrid",
    "HorizontalBoundary",
    "HorizontalGrid",
    "NumericalHorizontalGrid",
    "PhysicalHorizontalGrid",
    "NumericalTopography",
    "PhysicalTopography",
    "Topography",
]
