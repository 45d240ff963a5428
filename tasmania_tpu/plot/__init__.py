from tasmania_tpu.plot.drawer import Drawer
from tasmania_tpu.plot.monitors import Plot, PlotComposite
from tasmania_tpu.plot.plot_utils import Animation
from tasmania_tpu.plot.patches import Annotation, Circle, Rectangle, Segment
from tasmania_tpu.plot.retrievers import DataRetriever, DataRetrieverComposite
from tasmania_tpu.plot.drawers import (
    CDF,
    Contour,
    Contourf,
    HovmollerDiagram,
    Line,
    LineProfile,
    Quiver,
    TimeSeries,
)

__all__ = [
    "Drawer",
    "Plot",
    "PlotComposite",
    "Animation",
    "DataRetriever",
    "DataRetrieverComposite",
    "CDF",
    "Contour",
    "Contourf",
    "HovmollerDiagram",
    "Line",
    "LineProfile",
    "Quiver",
    "TimeSeries",
    "Annotation",
    "Circle",
    "Rectangle",
    "Segment",
]
