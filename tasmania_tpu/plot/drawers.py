"""Concrete drawers: contour(f), quiver, profiles, time series, Hovmöller, CDF.

TPU-native re-design of reference ``src/tasmania/plot/{contour,contourf,quiver,
profile,trackers,spectrals,offline}.py`` — host-side matplotlib rendering of
numpy-pulled states, backend-agnostic (SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np

from tasmania_tpu.plot.drawer import Drawer
from tasmania_tpu.plot.retrievers import DataRetriever


def _axis_coords(grid, dims: str, field_name: str = ""):
    if dims == "x":
        src = grid.x_at_u_locations if "at_u_locations" in field_name else grid.x
    elif dims == "y":
        src = grid.y_at_v_locations if "at_v_locations" in field_name else grid.y
    else:
        src = (
            grid.z_on_interface_levels
            if "on_interface_levels" in field_name
            else grid.z
        )
    return np.asarray(src.data)


class Contour(Drawer):
    """Contour lines of a 2-D slice (reference ``plot/contour.py:37``)."""

    def __init__(self, grid, field_name, field_units=None, x=None, y=None, z=None, xaxis="x", yaxis="y", properties=None):
        super().__init__(properties)
        self._retriever = DataRetriever(grid, field_name, field_units, x, y, z)
        self._grid, self._xaxis, self._yaxis = grid, xaxis, yaxis
        self._field_name = field_name

    def __call__(self, state, fig, ax):
        data = self._retriever(state)
        xc = _axis_coords(self._grid, self._xaxis, self._field_name)
        yc = _axis_coords(self._grid, self._yaxis, self._field_name)
        cs = ax.contour(xc, yc, data.T, **self.properties.get("contour_kwargs", {}))
        if self.properties.get("clabel", False):
            ax.clabel(cs)


class Contourf(Drawer):
    """Filled contours (reference ``plot/contourf.py:37``)."""

    def __init__(self, grid, field_name, field_units=None, x=None, y=None, z=None, xaxis="x", yaxis="y", properties=None):
        super().__init__(properties)
        self._retriever = DataRetriever(grid, field_name, field_units, x, y, z)
        self._grid, self._xaxis, self._yaxis = grid, xaxis, yaxis
        self._field_name = field_name

    def __call__(self, state, fig, ax):
        data = self._retriever(state)
        xc = _axis_coords(self._grid, self._xaxis, self._field_name)
        yc = _axis_coords(self._grid, self._yaxis, self._field_name)
        cf = ax.contourf(xc, yc, data.T, **self.properties.get("contourf_kwargs", {}))
        if self.properties.get("cbar_on", True):
            fig.colorbar(cf, ax=ax)


class Quiver(Drawer):
    """Vector field arrows (reference ``plot/quiver.py:37``)."""

    def __init__(self, grid, x_field, y_field, field_units=None, x=None, y=None, z=None, properties=None):
        super().__init__(properties)
        self._rx = DataRetriever(grid, x_field, field_units, x, y, z)
        self._ry = DataRetriever(grid, y_field, field_units, x, y, z)
        self._grid = grid

    def __call__(self, state, fig, ax):
        u, v = self._rx(state), self._ry(state)
        xc = _axis_coords(self._grid, "x")
        yc = _axis_coords(self._grid, "y")
        ax.quiver(xc, yc, u.T, v.T, **self.properties.get("quiver_kwargs", {}))


class LineProfile(Drawer):
    """1-D profile along an axis (reference ``plot/profile.py:37``)."""

    def __init__(self, grid, field_name, field_units=None, x=None, y=None, z=None, axis="x", properties=None):
        super().__init__(properties)
        self._retriever = DataRetriever(grid, field_name, field_units, x, y, z)
        self._grid, self._axis = grid, axis
        self._field_name = field_name

    def __call__(self, state, fig, ax):
        data = self._retriever(state)
        coords = _axis_coords(self._grid, self._axis, self._field_name)
        kw = self.properties.get("line_kwargs", {})
        if self._axis == "z":
            ax.plot(data, coords[: data.shape[0]], **kw)
        else:
            ax.plot(coords[: data.shape[0]], data, **kw)


class TimeSeries(Drawer):
    """Scalar trace over successive states (reference ``plot/trackers.py:38``)."""

    def __init__(self, grid, field_name, field_units=None, x=None, y=None, z=None, properties=None):
        super().__init__(properties)
        self._retriever = DataRetriever(grid, field_name, field_units, x, y, z)
        self._times, self._values = [], []

    def __call__(self, state, fig, ax):
        self._times.append(state.get("time"))
        self._values.append(float(np.asarray(self._retriever(state))))
        ax.plot(self._times, self._values, **self.properties.get("line_kwargs", {}))


class HovmollerDiagram(Drawer):
    """Space–time diagram accumulated over calls (reference ``plot/trackers.py:142``)."""

    def __init__(self, grid, field_name, field_units=None, x=None, y=None, z=None, axis="x", properties=None):
        super().__init__(properties)
        self._retriever = DataRetriever(grid, field_name, field_units, x, y, z)
        self._grid, self._axis = grid, axis
        self._field_name = field_name
        self._slices, self._times = [], []

    def __call__(self, state, fig, ax):
        self._slices.append(np.asarray(self._retriever(state)).ravel())
        self._times.append(state.get("time"))
        data = np.stack(self._slices, axis=1)
        coords = _axis_coords(self._grid, self._axis, self._field_name)
        cf = ax.pcolormesh(
            np.arange(len(self._times)),
            coords[: data.shape[0]],
            data,
            **self.properties.get("pcolormesh_kwargs", {}),
        )


class CDF(Drawer):
    """Empirical cumulative distribution of a field
    (reference ``plot/spectrals.py:36``)."""

    def __init__(self, grid, field_name, field_units=None, properties=None):
        super().__init__(properties)
        self._retriever = DataRetriever(grid, field_name, field_units)

    def __call__(self, state, fig, ax):
        vals = np.sort(np.asarray(self._retriever(state)).ravel())
        cdf = np.arange(1, vals.size + 1) / vals.size
        ax.plot(vals, cdf, **self.properties.get("line_kwargs", {}))


class Line(Drawer):
    """Plot precomputed (x, y) data — offline drawer
    (reference ``plot/offline.py:36``)."""

    def __init__(self, x_data, y_data, properties=None):
        super().__init__(properties)
        self._x, self._y = np.asarray(x_data), np.asarray(y_data)

    def __call__(self, state, fig, ax):
        ax.plot(self._x, self._y, **self.properties.get("line_kwargs", {}))
