"""State I/O: store/load model states with grid metadata.

TPU-native re-design of reference ``src/tasmania/utils/iox.py:47,299``
(``NetCDFMonitor`` / ``load_netcdf_dataset``).  netCDF4 is not available in
this environment, so the container format is HDF5 (h5py) with the same
information content: per-snapshot field groups carrying units + dims
attributes, plus domain/topography/boundary attributes sufficient to rebuild
the ``Domain`` on load.  A NetCDF path can be added behind the same API when
the library is present.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

from tasmania_tpu.framework.field import FieldArray
from tasmania_tpu.utils.array import to_numpy


class HDF5Monitor:
    """Accumulate states and write them (reference ``NetCDFMonitor``,
    ``iox.py:47``)."""

    def __init__(
        self,
        filename: str,
        domain=None,
        grid_type: str = "numerical",
        store_names: Optional[Tuple[str, ...]] = None,
    ) -> None:
        self._filename = filename
        self._domain = domain
        self._grid_type = grid_type
        self._store_names = store_names
        self._states: List[Dict[str, Any]] = []

    def store(self, state: Mapping[str, Any]) -> None:
        snap: Dict[str, Any] = {}
        for name, fa in state.items():
            if name == "time":
                snap["time"] = state["time"]
                continue
            if self._store_names and name not in self._store_names:
                continue
            if isinstance(fa, FieldArray):
                snap[name] = (to_numpy(fa.data).copy(), fa.units, fa.dims)
            else:
                snap[name] = (to_numpy(fa).copy(), "1", ())
        self._states.append(snap)

    def write(self) -> None:
        import h5py

        with h5py.File(self._filename, "w") as f:
            if self._domain is not None:
                d = self._domain
                pg = d.physical_grid
                topo = pg.topography
                attrs = {
                    "nx": pg.nx,
                    "ny": pg.ny,
                    "nz": pg.nz,
                    "domain_x": [float(np.asarray(pg.x.data)[0]), float(np.asarray(pg.x.data)[-1])],
                    "x_units": pg.x.units,
                    "domain_y": [float(np.asarray(pg.y.data)[0]), float(np.asarray(pg.y.data)[-1])],
                    "y_units": pg.y.units,
                    "domain_z": [
                        float(np.asarray(pg.z_on_interface_levels.data)[0]),
                        float(np.asarray(pg.z_on_interface_levels.data)[-1]),
                    ],
                    "z_units": pg.z.units,
                    "topo_type": getattr(topo, "type", "flat") or "flat",
                    "topo_time_s": topo.time.total_seconds(),
                    "hb_type": d.horizontal_boundary.type,
                    "nb": d.horizontal_boundary.nb,
                    "hb_kwargs": json.dumps(
                        {
                            k: v
                            for k, v in d.horizontal_boundary.kwargs.items()
                            if isinstance(v, (int, float, str, bool))
                        }
                    ),
                    "topo_kwargs": json.dumps(
                        {
                            k: (
                                float(np.asarray(v.data))
                                if isinstance(v, FieldArray)
                                else v
                            )
                            for k, v in getattr(topo, "kwargs", {}).items()
                            if isinstance(v, (int, float, str, bool, FieldArray))
                        }
                    ),
                }
                for k, v in attrs.items():
                    f.attrs[k] = v
            for idx, snap in enumerate(self._states):
                grp = f.create_group(f"state_{idx:05d}")
                if "time" in snap:
                    grp.attrs["time"] = snap["time"].isoformat()
                for name, payload in snap.items():
                    if name == "time":
                        continue
                    arr, units, dims = payload
                    ds = grp.create_dataset(name, data=arr)
                    ds.attrs["units"] = units
                    ds.attrs["dims"] = json.dumps(list(dims))


def load_hdf5_dataset(filename: str):
    """(Domain, grid_type, [states]) from an :class:`HDF5Monitor` file
    (reference ``load_netcdf_dataset``, ``iox.py:299``)."""
    import h5py

    from tasmania_tpu.domain import Domain

    with h5py.File(filename, "r") as f:
        domain = None
        if "nx" in f.attrs:
            topo_kwargs = json.loads(f.attrs.get("topo_kwargs", "{}"))
            if f.attrs["topo_time_s"] > 0:
                topo_kwargs["time"] = timedelta(seconds=float(f.attrs["topo_time_s"]))
            for key in ("max_height", "width_x", "width_y", "center_x", "center_y"):
                if key in topo_kwargs:
                    units = "m"
                    topo_kwargs[key] = FieldArray(
                        np.asarray(topo_kwargs[key]), units, ()
                    )
            domain = Domain(
                FieldArray(np.asarray(f.attrs["domain_x"]), f.attrs["x_units"], ("x",)),
                int(f.attrs["nx"]),
                FieldArray(np.asarray(f.attrs["domain_y"]), f.attrs["y_units"], ("y",)),
                int(f.attrs["ny"]),
                FieldArray(np.asarray(f.attrs["domain_z"]), f.attrs["z_units"], ("z",)),
                int(f.attrs["nz"]),
                horizontal_boundary_type=f.attrs["hb_type"],
                nb=int(f.attrs["nb"]),
                horizontal_boundary_kwargs=json.loads(f.attrs.get("hb_kwargs", "{}")),
                topography_type=str(f.attrs["topo_type"]),
                topography_kwargs=topo_kwargs,
            )
        states = []
        for key in sorted(k for k in f.keys() if k.startswith("state_")):
            grp = f[key]
            state: Dict[str, Any] = {}
            if "time" in grp.attrs:
                state["time"] = datetime.fromisoformat(grp.attrs["time"])
            for name in grp.keys():
                ds = grp[name]
                state[name] = FieldArray(
                    np.asarray(ds),
                    ds.attrs.get("units", "1"),
                    tuple(json.loads(ds.attrs.get("dims", "[]"))),
                )
            states.append(state)
    return domain, "numerical", states
