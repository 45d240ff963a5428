"""Distributed model runner: shard_map the REAL framework step over a 2-D mesh.

Builds the unmodified framework components (dycore + physics couplers) against
a per-shard :class:`~tasmania_tpu.parallel.distributed.LocalDomain` and traces
one full timestep inside ``shard_map``: pad + halo-exchange at entry, the
framework's own algorithm (with the DistributedBoundary supplying BC + halo
semantics at the ``enforce_*`` seams), crop at exit.  The user-facing state
stays GLOBAL: block-sharded ``jax.Array``s of the physical-domain shapes, with
staggered fields carried cell-anchored (face ``i`` of cell ``i``; the last
global face is pinned to the reference by the lateral BC — see
``assemble_staggered``).

This replaces the round-1 bespoke sharded step (``parallel/isentropic.py``):
the numerics here are the framework's own, so topology equivalence is
machine-precision by construction (tests/test_distributed_framework.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tasmania_tpu.framework.field import FieldArray, field_stagger_axes
from tasmania_tpu.parallel.distributed import DistributedBoundary, LocalDomain
from tasmania_tpu.parallel.halo import halo_exchange
from tasmania_tpu.parallel.mesh import CartesianDecomposition


def _pad_xy_edge(f, nb: int):
    pads = ((nb, nb), (nb, nb)) + ((0, 0),) * (f.ndim - 2)
    return jnp.pad(f, pads, mode="edge")


class DistributedModel:
    """One jitted, shard_map-distributed timestep of a framework model.

    Parameters
    ----------
    global_domain : the single-device Domain (source of grid geometry, the
        lateral-boundary type/kwargs, and the global reference state — set it
        on ``global_domain.horizontal_boundary`` before constructing this).
    global_state : the initial model state on the global numerical grid
        (FieldArray dict from the state factories).
    mesh : 2-D ``jax.sharding.Mesh`` with axes ``('x', 'y')``.
    model_factory : ``f(local_domain) -> (dycore, physics_or_None)`` building
        the framework components; called once against the per-shard domain.
    dt : timestep in seconds (static — compiled into the step).
    """

    def __init__(
        self,
        global_domain,
        global_state: Mapping[str, Any],
        mesh: Mesh,
        model_factory: Callable[[Any], Tuple[Any, Any]],
        dt: float,
        axis_names: Tuple[str, str] = ("x", "y"),
    ) -> None:
        gpg = global_domain.physical_grid
        ghb = global_domain.horizontal_boundary
        nb = ghb.nb
        self.mesh = mesh
        self.decomp = CartesianDecomposition(gpg.nx, gpg.ny, mesh, nb)
        self.hb = DistributedBoundary(global_domain, self.decomp, axis_names)
        self._axis_names = axis_names
        self._dt = float(dt)
        self._nb = nb
        self._periodic = self.hb._inner_type == "periodic"

        consts_host = self.hb.set_reference_state(ghb.reference_state)
        self.local_domain = LocalDomain(self.hb)
        self.dycore, self.physics = model_factory(self.local_domain)

        # field metadata from the global state
        self._names = sorted(
            k
            for k, v in global_state.items()
            if k != "time" and isinstance(v, FieldArray) and v.data.ndim >= 2
        )
        self._units = {k: global_state[k].units for k in self._names}
        self._dims = {k: global_state[k].dims for k in self._names}

        # shardings
        def spec_nd(ndim: int) -> P:
            return P(axis_names[0], axis_names[1], *([None] * (ndim - 2)))

        self._spec_nd = spec_nd
        self._field_sharding = {
            k: NamedSharding(mesh, spec_nd(global_state[k].data.ndim))
            for k in self._names
        }
        self._hs_sharding = NamedSharding(mesh, P(*axis_names))

        # per-shard constants: blocked host arrays -> sharded device arrays
        self._consts = {
            k: jax.device_put(v, NamedSharding(mesh, spec_nd(v.ndim)))
            for k, v in consts_host.items()
        }
        self._consts_specs = {k: spec_nd(v.ndim) for k, v in consts_host.items()}

        self._step = self._build_step()

    # -- state layout -------------------------------------------------------- #
    def scatter_state(self, global_state: Mapping[str, Any]) -> Dict[str, Any]:
        """Global FieldArray state -> sharded raw dict (staggered fields are
        cropped to their cell-anchored (nx, ny) representation)."""
        ghb = self.hb._global_hb
        out: Dict[str, Any] = {}
        for name in self._names:
            # crop numerical -> physical (identity except periodic), then
            # staggered -> cell-anchored
            d = jnp.asarray(ghb.get_physical_field(global_state[name].data, name))
            sx, sy, _ = field_stagger_axes(name)
            if sx:
                d = d[:-1]
            if sy:
                d = d[:, :-1]
            out[name] = jax.device_put(d, self._field_sharding[name])
        return out

    def gather_state(self, fields: Mapping[str, Any]) -> Dict[str, FieldArray]:
        """Sharded raw dict -> global host FieldArray state (staggered fields
        re-assembled; under relaxed/dirichlet BCs the last global face equals
        the reference by the outermost-layer pinning)."""
        ref = self.hb._global_hb.reference_state
        out: Dict[str, FieldArray] = {}
        for name in self._names:
            d = np.asarray(fields[name])
            sx, sy, _ = field_stagger_axes(name)
            if sx or sy:
                r = np.asarray(ref[name].to_units(self._units[name]).data)
                if sx:
                    d = np.concatenate([d, r[-1:, : d.shape[1]]], axis=0)
                if sy:
                    d = np.concatenate([d, r[: d.shape[0], -1:]], axis=1)
            out[name] = FieldArray(d, self._units[name], self._dims[name])
        return out

    # -- the traced step -------------------------------------------------------- #
    def _build_step(self):
        nb = self._nb
        bx, by = self.decomp.bx, self.decomp.by
        periodic = (self._periodic, self._periodic)
        axes = self._axis_names
        hb, dycore, physics = self.hb, self.dycore, self.physics
        names, units, dims = self._names, self._units, self._dims
        dt = self._dt

        def local_step(fields, consts, hs):
            from tasmania_tpu.parallel.halo import halo_exchange_multi

            hb.bind_local_constants(consts)

            # entry halo fill: ONE fused exchange for every field + topography
            padded = [_pad_xy_edge(fields[name], nb) for name in names]
            padded.append(_pad_xy_edge(hs, nb))
            exchanged = halo_exchange_multi(padded, nb, axes, periodic)
            hs_l = exchanged.pop()

            st: Dict[str, Any] = {}
            for name, f in zip(names, exchanged):
                sx, sy, _ = field_stagger_axes(name)
                # rebuild the local staggered view: the appended face is never
                # read (fluxes consume faces [e, lx-e] only; the outermost
                # global faces are pinned by set_outermost_layers_*)
                if sx:
                    f = jnp.concatenate([f, f[-1:]], axis=0)
                if sy:
                    f = jnp.concatenate([f, f[:, -1:]], axis=1)
                st[name] = FieldArray(f, units[name], dims[name])

            st["topography_height"] = FieldArray(hs_l, "m", ("x", "y"))

            st = dycore(st, {}, dt)
            if physics is not None:
                st = physics(st, dt)

            out = {}
            for name in names:
                d = st[name].data
                out[name] = d[nb : nb + bx, nb : nb + by]
            return out

        field_specs = {k: self._spec_nd(len(self._dims[k])) for k in names}
        sharded = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(field_specs, self._consts_specs, P(*axes)),
            out_specs=field_specs,
        )
        return jax.jit(sharded)

    def step(self, fields: Mapping[str, Any], hs) -> Dict[str, Any]:
        """Advance the sharded raw state one timestep.  ``hs`` is the global
        (possibly growing) topography height, sharded ``P('x','y')``."""
        return self._step(dict(fields), self._consts, hs)

    def put_topography(self, hs) -> Any:
        return jax.device_put(jnp.asarray(hs), self._hs_sharding)
