"""Native sharded checkpoint / resume.

The reference's only persistence path is host-side NetCDF via ``NetCDFMonitor``
(reference ``src/tasmania/utils/iox.py:47,299``; mirrored here by
``utils/iox.HDF5Monitor``).  For multi-chip runs a gather-to-host snapshot
does not scale, so this module adds the TPU-native equivalent called for by
SURVEY.md §5.4: an orbax/tensorstore checkpoint where every device writes its
own shards, and restore can re-shard onto a *different* mesh topology
(elastic resume).

State layout on disk: an arrays pytree ``{field_name: jax.Array}`` plus a JSON
metadata item carrying units, dims and the model time — enough to rebuild the
``FieldArray`` state dict on load.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, Mapping, Optional

import jax

from tasmania_tpu.framework.field import FieldArray


def _split(state: Mapping[str, Any]):
    arrays: Dict[str, Any] = {}
    meta: Dict[str, Any] = {"fields": {}}
    for name, value in state.items():
        if name == "time":
            meta["time"] = value.isoformat()
            continue
        if isinstance(value, FieldArray):
            arrays[name] = value.data
            meta["fields"][name] = {"units": value.units, "dims": list(value.dims)}
        else:
            arrays[name] = value
            meta["fields"][name] = {"units": "1", "dims": []}
    return arrays, meta


def _join(arrays: Mapping[str, Any], meta: Mapping[str, Any]) -> Dict[str, Any]:
    state: Dict[str, Any] = {}
    if "time" in meta:
        state["time"] = datetime.fromisoformat(meta["time"])
    for name, arr in arrays.items():
        info = meta["fields"].get(name, {"units": "1", "dims": []})
        state[name] = FieldArray(arr, info["units"], tuple(info["dims"]))
    return state


class CheckpointManager:
    """Sharded save/restore of model states.

    ``save`` writes each device's shards directly (orbax/tensorstore OCDBT);
    ``restore`` accepts an optional ``sharding`` (a ``jax.sharding.Sharding``
    or a per-field dict of them) so a run checkpointed on one mesh can resume
    on another — including a single host.
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3) -> None:
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
            item_names=("state", "meta"),
        )

    def save(
        self,
        step: int,
        state: Mapping[str, Any],
        *,
        force: bool = False,
        wait: bool = False,
    ) -> bool:
        """``wait=True`` blocks until the shards are on disk — REQUIRED when
        the caller donates the same buffers to the next jitted step (XLA
        deletes them under the async serializer otherwise)."""
        ocp = self._ocp
        arrays, meta = _split(state)
        saved = self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(arrays),
                meta=ocp.args.JsonSave(meta),
            ),
            force=force,
        )
        if wait:
            self._mgr.wait_until_finished()
        return bool(saved)

    def restore(
        self,
        step: Optional[int] = None,
        *,
        sharding=None,
    ) -> Dict[str, Any]:
        """Restore the state dict at ``step`` (default: latest).

        ``sharding`` re-lays-out every field on load: pass a single
        ``jax.sharding.Sharding`` for all fields or ``{name: sharding}``.
        Without it, arrays restore with the layout recorded at save time
        (falling back to host-local numpy when those devices are absent).
        """
        ocp = self._ocp
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")

        meta = self._mgr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
        )["meta"]

        restore_args = None
        if sharding is not None:
            # build abstract arrays with the requested target layout
            shapes = self._mgr.item_metadata(step)["state"]
            abstract = {}
            for name, m in shapes.items():
                sh = sharding[name] if isinstance(sharding, dict) else sharding
                abstract[name] = jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh)
            restore_args = ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract)
            )
        else:
            restore_args = ocp.args.Composite(state=ocp.args.StandardRestore())

        arrays = self._mgr.restore(step, args=restore_args)["state"]
        return _join(arrays, meta)

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
