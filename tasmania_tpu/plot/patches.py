"""Annotation patches: circles, rectangles, segments, text
(reference ``src/tasmania/plot/patches.py:37-97``)."""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

from tasmania_tpu.plot.drawer import Drawer


class Circle(Drawer):
    def __init__(self, center, radius, properties: Optional[Mapping[str, Any]] = None):
        super().__init__(properties)
        self._center, self._radius = center, radius

    def __call__(self, state, fig, ax):
        import matplotlib.patches as mpatches

        ax.add_patch(
            mpatches.Circle(
                self._center, self._radius, **self.properties.get("patch_kwargs", {})
            )
        )


class Rectangle(Drawer):
    def __init__(self, xy, width, height, properties: Optional[Mapping[str, Any]] = None):
        super().__init__(properties)
        self._xy, self._w, self._h = xy, width, height

    def __call__(self, state, fig, ax):
        import matplotlib.patches as mpatches

        ax.add_patch(
            mpatches.Rectangle(
                self._xy, self._w, self._h, **self.properties.get("patch_kwargs", {})
            )
        )


class Segment(Drawer):
    def __init__(self, x_data: Sequence, y_data: Sequence, properties=None):
        super().__init__(properties)
        self._x, self._y = x_data, y_data

    def __call__(self, state, fig, ax):
        ax.plot(self._x, self._y, **self.properties.get("line_kwargs", {}))


class Annotation(Drawer):
    def __init__(self, text: str, location, properties=None):
        super().__init__(properties)
        self._text, self._loc = text, location

    def __call__(self, state, fig, ax):
        ax.annotate(self._text, self._loc, **self.properties.get("text_kwargs", {}))
