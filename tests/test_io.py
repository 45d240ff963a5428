"""Checkpoint/resume round-trip tests (reference test style: baseline NetCDF
fixture, SURVEY.md §5.4)."""

import os
import tempfile
from datetime import datetime

import numpy as np

import jax.numpy as jnp

from tasmania_tpu.domain import Domain
from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.framework.offline_diagnostics import RMSD, RRMSD, ColumnSum
from tasmania_tpu.isentropic import get_isentropic_state_from_brunt_vaisala_frequency
from tasmania_tpu.utils.iox import HDF5Monitor, load_hdf5_dataset


def make_setup():
    domain = Domain(
        (0.0, 1e5), 12, (0.0, 1e5), 10,
        FieldArray(np.array([400.0, 300.0]), "K", ("z",)), 6,
        horizontal_boundary_type="relaxed", nb=3,
        horizontal_boundary_kwargs={"nr": 5},
        topography_type="gaussian",
        topography_kwargs={
            "max_height": FieldArray(np.asarray(300.0), "m", ()),
            "width_x": FieldArray(np.asarray(3e4), "m", ()),
            "width_y": FieldArray(np.asarray(3e4), "m", ()),
        },
    )
    state = get_isentropic_state_from_brunt_vaisala_frequency(
        domain.numerical_grid, datetime(2000, 1, 1),
        FieldArray(np.asarray(10.0), "m s^-1", ()),
        FieldArray(np.asarray(0.0), "m s^-1", ()),
        FieldArray(np.asarray(0.01), "s^-1", ()),
    )
    return domain, state


def test_store_write_load_roundtrip():
    domain, state = make_setup()
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ck.h5")
        mon = HDF5Monitor(path, domain)
        mon.store(state)
        state2 = dict(state)
        state2["air_isentropic_density"] = state["air_isentropic_density"].with_data(
            state["air_isentropic_density"].data * 1.01
        )
        mon.store(state2)
        mon.write()

        domain2, grid_type, states = load_hdf5_dataset(path)
        assert len(states) == 2
        assert domain2.physical_grid.nx == 12
        assert domain2.horizontal_boundary.type == "relaxed"
        np.testing.assert_allclose(
            np.asarray(states[0]["air_isentropic_density"].data),
            np.asarray(state["air_isentropic_density"].data),
        )
        assert states[0]["air_isentropic_density"].units == "kg m^-2 K^-1"
        assert states[0]["time"] == datetime(2000, 1, 1)
        # gaussian topography restored
        h = np.asarray(domain2.physical_grid.topography.steady_profile.data)
        assert h.max() > 100.0


def test_offline_diagnostics():
    domain, state = make_setup()
    state2 = dict(state)
    state2["air_isentropic_density"] = state["air_isentropic_density"].with_data(
        state["air_isentropic_density"].data + 1.0
    )
    fields = {"air_isentropic_density": {"units": "kg m^-2 K^-1"}}
    rmsd = RMSD(domain.numerical_grid, fields)(state, state2)
    assert abs(rmsd["air_isentropic_density"] - 1.0) < 1e-10
    rrmsd = RRMSD(domain.numerical_grid, fields)(state, state2)
    assert rrmsd["air_isentropic_density"] > 0
    cs = ColumnSum(domain.numerical_grid, "air_isentropic_density", "kg m^-2 K^-1")(state)
    assert cs.shape == (12, 10)


def test_netcdf_store_write_load_roundtrip():
    """True NetCDF interop (reference ``NetCDFMonitor``/``load_netcdf_dataset``,
    ``utils/iox.py:47,299``): classic CDF container via scipy."""
    from tasmania_tpu.utils.iox import NetCDFMonitor, load_netcdf_dataset

    domain, state = make_setup()
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ck.nc")
        mon = NetCDFMonitor(path, domain)
        mon.store(state)
        state2 = dict(state)
        state2["time"] = state["time"] + __import__("datetime").timedelta(seconds=5)
        state2["air_isentropic_density"] = state["air_isentropic_density"].with_data(
            state["air_isentropic_density"].data * 1.01
        )
        mon.store(state2)
        mon.write()

        # the on-disk format really is NetCDF (classic 64-bit offset)
        with open(path, "rb") as fh:
            assert fh.read(3) == b"CDF"

        domain2, grid_type, states = load_netcdf_dataset(path)
        assert len(states) == 2
        assert domain2.physical_grid.nx == 12
        assert domain2.horizontal_boundary.type == "relaxed"
        assert states[0]["time"] == datetime(2000, 1, 1)
        assert states[1]["time"] == datetime(2000, 1, 1, 0, 0, 5)
        np.testing.assert_allclose(
            np.asarray(states[1]["air_isentropic_density"].data),
            np.asarray(state["air_isentropic_density"].data) * 1.01,
            rtol=1e-6,
        )
        assert states[0]["air_isentropic_density"].units == "kg m^-2 K^-1"
        assert states[0]["x_velocity_at_u_locations"].dims == (
            "x_at_u_locations", "y", "z",
        )
        h = np.asarray(domain2.physical_grid.topography.steady_profile.data)
        assert h.max() > 100.0


def test_netcdf4_h5_interop_load():
    """load_netcdf_dataset on a NetCDF-4 (HDF5) file written with the real
    dimension-scale machinery netCDF4/xarray writers produce (reference
    ``iox.py:47`` writes HDF5-based NetCDF-4; VERDICT r4 missing #1)."""
    import h5py

    from tasmania_tpu.utils.iox import load_netcdf_dataset

    rng = np.random.default_rng(0)
    nt, nx, ny, nz = 2, 5, 4, 3
    u = rng.normal(size=(nt, nx, ny, nz)).astype("f8")
    s = rng.normal(size=(nt, nx, ny, nz)).astype("f8") + 100.0

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ref_style.nc")
        with h5py.File(path, "w") as f:
            # netCDF-4 marker attribute (as the netcdf-c library writes)
            f.attrs["_NCProperties"] = np.bytes_(b"version=2,netcdf=4.9.0")
            f.attrs["grid_type"] = "numerical"
            tvar = f.create_dataset(
                "time", data=np.array([0.0, 30.0], dtype="f8")
            )
            tvar.attrs["units"] = np.bytes_(
                b"seconds since 2000-01-01T00:00:00"
            )
            tvar.make_scale("time")
            dims = {}
            for dname, size in (("x", nx), ("y", ny), ("z", nz)):
                d = f.create_dataset(
                    dname, data=np.arange(size, dtype="f8")
                )
                d.make_scale(dname)
                dims[dname] = d
            for name, arr, units in (
                ("x_velocity", u, b"m s^-1"),
                ("air_isentropic_density", s, b"kg m^-2 K^-1"),
            ):
                v = f.create_dataset(name, data=arr)
                v.attrs["units"] = np.bytes_(units)
                v.dims[0].attach_scale(tvar)
                for ax, dname in enumerate(("x", "y", "z")):
                    v.dims[1 + ax].attach_scale(dims[dname])

        domain, grid_type, states = load_netcdf_dataset(path)
        assert domain is None  # no domain attrs in this externally-made file
        assert grid_type == "numerical"
        assert len(states) == 2
        st = states[1]
        assert st["time"] == datetime(2000, 1, 1, 0, 0, 30)
        assert st["x_velocity"].units == "m s^-1"
        assert st["x_velocity"].dims == ("x", "y", "z")
        np.testing.assert_array_equal(np.asarray(st["x_velocity"].data), u[1])
        np.testing.assert_array_equal(
            np.asarray(st["air_isentropic_density"].data), s[1]
        )


def test_netcdf3_still_loads_after_fallback_change():
    """The scipy path is untouched: a NetCDFMonitor (NetCDF-3) file still
    round-trips through the probing loader."""
    from tasmania_tpu.utils.iox import NetCDFMonitor, load_netcdf_dataset

    domain, state = make_setup()
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "classic.nc")
        mon = NetCDFMonitor(path, domain)
        mon.store(state)
        mon.write()
        domain2, grid_type, states = load_netcdf_dataset(path)
        assert domain2.physical_grid.nx == 12
        assert len(states) == 1
        np.testing.assert_allclose(
            np.asarray(states[0]["air_isentropic_density"].data),
            np.asarray(state["air_isentropic_density"].data),
        )
