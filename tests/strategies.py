"""Hypothesis strategy library: random domains, grids, boundaries, fields and
model states.

TPU-native counterpart of the reference's strategy library
(reference ``tests/strategies.py:347,459,487,569,1169,1637`` — ``st_physical_grid``,
``st_horizontal_boundary``, ``st_domain``, ``st_raw_field``,
``st_isentropic_state_f``, ``st_burgers_state``): the same capability — every
suite-style test draws a random domain/boundary/state — expressed against this
framework's ``Domain``/``FieldArray`` API.  Random *values* come from a drawn
seed + ``default_rng`` (shrinkable through the seed, and orders of magnitude
faster to generate than element-wise array strategies).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Optional, Tuple

import numpy as np
from hypothesis import strategies as hyp_st

import jax.numpy as jnp

from tasmania_tpu.domain import Domain
from tasmania_tpu.framework.field import FieldArray, field_shape

#: backends every backend-parameterized suite runs over (the reference's
#: numpy/gt4py axis becomes numpy-oracle vs jax vs pallas-interpret)
BACKENDS = ("numpy", "jax")


@hyp_st.composite
def st_rng(draw) -> np.random.Generator:
    return np.random.default_rng(draw(hyp_st.integers(0, 2**32 - 1)))


@hyp_st.composite
def st_physical_grid_args(
    draw,
    nx_range: Tuple[int, int] = (7, 24),
    ny_range: Tuple[int, int] = (7, 24),
    nz_range: Tuple[int, int] = (2, 8),
):
    """(domain_x, nx, domain_y, ny, domain_z, nz) constructor arguments."""
    nx = draw(hyp_st.integers(*nx_range))
    ny = draw(hyp_st.integers(*ny_range))
    nz = draw(hyp_st.integers(*nz_range))
    x0 = draw(hyp_st.floats(-1e6, 1e6))
    dx = draw(hyp_st.floats(1e2, 1e5))
    y0 = draw(hyp_st.floats(-1e6, 1e6))
    dy = draw(hyp_st.floats(1e2, 1e5))
    ztop = draw(hyp_st.floats(330.0, 500.0))
    zsurf = draw(hyp_st.floats(270.0, 320.0))
    return (
        (x0, x0 + dx * (nx - 1)),
        nx,
        (y0, y0 + dy * (ny - 1)),
        ny,
        FieldArray(np.array([ztop, zsurf]), "K", ("z",)),
        nz,
    )


@hyp_st.composite
def st_domain(
    draw,
    nx_range: Tuple[int, int] = (7, 24),
    ny_range: Tuple[int, int] = (7, 24),
    nz_range: Tuple[int, int] = (2, 8),
    boundary_types: Tuple[str, ...] = ("identity", "periodic", "relaxed", "dirichlet"),
    nb_range: Tuple[int, int] = (1, 3),
    topography_types: Tuple[str, ...] = ("flat",),
    backend: str = "jax",
) -> Domain:
    """A random Domain: grid extents, boundary type + nb (+nr), topography
    (reference ``st_domain``, ``tests/strategies.py:487``)."""
    args = draw(st_physical_grid_args(nx_range, ny_range, nz_range))
    nx, ny = args[1], args[3]
    nb = draw(hyp_st.integers(*nb_range))
    hb_type = draw(hyp_st.sampled_from(boundary_types))
    hb_kwargs = {}
    if hb_type == "relaxed":
        nr_hi = min(8, nx // 2, ny // 2)
        nb = min(nb, nr_hi)
        hb_kwargs["nr"] = draw(hyp_st.integers(max(nb, 1), nr_hi))
    topo = draw(hyp_st.sampled_from(topography_types))
    topo_kwargs = None
    if topo == "gaussian":
        topo_kwargs = {
            "max_height": FieldArray(
                np.asarray(draw(hyp_st.floats(1.0, 1000.0))), "m", ()
            ),
            "width_x": FieldArray(np.asarray(draw(hyp_st.floats(1e3, 1e5))), "m", ()),
            "width_y": FieldArray(np.asarray(draw(hyp_st.floats(1e3, 1e5))), "m", ()),
        }
    return Domain(
        *args,
        horizontal_boundary_type=hb_type,
        nb=nb,
        horizontal_boundary_kwargs=hb_kwargs,
        topography_type=topo,
        topography_kwargs=topo_kwargs,
        backend=backend,
    )


@hyp_st.composite
def st_raw_field(
    draw,
    shape: Tuple[int, ...],
    lo: float = -1e3,
    hi: float = 1e3,
    backend: str = "jax",
    dtype=np.float64,
):
    """A random raw array of ``shape`` in [lo, hi) (reference ``st_raw_field``,
    ``tests/strategies.py:569``)."""
    rng = draw(st_rng())
    data = rng.uniform(lo, hi, size=shape).astype(dtype)
    return np.asarray(data) if backend == "numpy" else jnp.asarray(data)


@hyp_st.composite
def st_state(draw, grid, properties, lo: float = 0.5, hi: float = 2.0, backend="jax"):
    """A state dict matching a component's declared ``properties``."""
    state = {"time": datetime(2000, 1, 1, draw(hyp_st.integers(0, 23)))}
    for name, props in properties.items():
        shape = field_shape(name, (grid.nx, grid.ny, grid.nz))
        data = draw(st_raw_field(shape, lo, hi, backend=backend))
        state[name] = FieldArray(data, props["units"], props.get("dims", ("x", "y", "z")))
    return state


@hyp_st.composite
def st_isentropic_state(
    draw, grid, moist: bool = False, precipitation: bool = False, backend: str = "jax"
):
    """A balanced isentropic state from randomly-drawn Brunt–Väisälä frequency,
    background flow and humidity (reference ``st_isentropic_state_f``,
    ``tests/strategies.py:1169``) — built through the production state factory
    so hydrostatic/velocity consistency holds by construction."""
    from tasmania_tpu.isentropic import (
        get_isentropic_state_from_brunt_vaisala_frequency,
    )

    state = get_isentropic_state_from_brunt_vaisala_frequency(
        grid,
        datetime(2000, 1, 1, draw(hyp_st.integers(0, 23))),
        FieldArray(np.asarray(draw(hyp_st.floats(-30.0, 30.0))), "m s^-1", ()),
        FieldArray(np.asarray(draw(hyp_st.floats(-10.0, 10.0))), "m s^-1", ()),
        FieldArray(np.asarray(draw(hyp_st.floats(0.005, 0.02))), "s^-1", ()),
        moist=moist,
        precipitation=precipitation,
        relative_humidity=draw(hyp_st.floats(0.1, 0.95)),
        backend=backend,
    )
    return state


@hyp_st.composite
def st_burgers_state(draw, grid, backend: str = "jax"):
    """A random Burgers velocity state (reference ``st_burgers_state``,
    ``tests/strategies.py:1637``)."""
    shape = (grid.nx, grid.ny, 1)
    u = draw(st_raw_field(shape, -10.0, 10.0, backend=backend))
    v = draw(st_raw_field(shape, -10.0, 10.0, backend=backend))
    return {
        "time": datetime(2000, 1, 1),
        "x_velocity": FieldArray(u, "m s^-1", ("x", "y", "z")),
        "y_velocity": FieldArray(v, "m s^-1", ("x", "y", "z")),
    }


@hyp_st.composite
def st_timedelta(draw, lo: float = 0.1, hi: float = 120.0) -> timedelta:
    return timedelta(seconds=draw(hyp_st.floats(lo, hi)))


@hyp_st.composite
def st_horizontal_boundary(draw, grid, types=("identity", "periodic", "relaxed")):
    """A boundary over an existing physical grid (reference
    ``st_horizontal_boundary``, ``tests/strategies.py:459``)."""
    from tasmania_tpu.domain.horizontal_boundary import HorizontalBoundary

    hb_type = draw(hyp_st.sampled_from(types))
    nb_hi = max(1, min(3, grid.nx // 2 - 1, grid.ny // 2 - 1))
    nb = draw(hyp_st.integers(1, nb_hi))
    kwargs = {}
    if hb_type == "relaxed":
        kwargs["nr"] = draw(
            hyp_st.integers(nb, max(nb, min(8, grid.nx // 2, grid.ny // 2)))
        )
    return HorizontalBoundary.factory(hb_type, grid, nb, **kwargs)
