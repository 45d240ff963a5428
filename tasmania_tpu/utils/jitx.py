"""JAX tracing utilities.

``carry_read_set`` supports the fused time-stepping loop: a model step maps a
full state dict to a full state dict, but typically *reads* only the prognostic
fields and recomputes every diagnostic from scratch (the reference recomputes
them through ``IsentropicDiagnostics`` at the head of the physics chain,
reference ``drivers/benchmarking/isentropic_moist/driver_namelist_sus.py:183``).
Carrying the never-read fields through a ``lax.fori_loop`` forces XLA to
round-trip them through HBM every iteration; dropping them from the carry cuts
that traffic.  The last step of a loop should run the full function once so
the final state is complete.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Set

import jax


def carry_read_set(fn: Callable[..., Any], *example_args) -> Set[str]:
    """Names of the dict keys in ``example_args[0]`` that ``fn`` actually reads.

    ``fn``'s first argument must be a flat ``dict`` of arrays.  The function is
    traced (abstractly — no device compute) and the jaxpr is scanned for uses
    of each input variable; keys whose arrays never feed any equation or output
    are reported as unread and can be dropped from a loop carry.
    """
    from jax.extend.core import Literal  # stable-ish; jax>=0.4.33

    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr

    used_ids: Set[int] = set()

    # a top-level invar consumed anywhere (even inside a scan/cond body) shows
    # up as an operand of some top-level equation, so no recursion is needed;
    # inner-jaxpr dead operands are counted as reads, which is conservative
    for eqn in jaxpr.eqns:
        for v in eqn.invars:
            if not isinstance(v, Literal):
                used_ids.add(id(v))
    for v in jaxpr.outvars:
        if not isinstance(v, Literal):
            used_ids.add(id(v))

    state: Dict[str, Any] = example_args[0]
    leaves_per_key = {k: len(jax.tree_util.tree_leaves(v)) for k in state for v in [state[k]]}
    # invars are ordered by the flattened pytree of all args; the first arg's
    # leaves come first, ordered by sorted dict keys (jax dict flattening order)
    read: Set[str] = set()
    i = 0
    for k in sorted(state):
        n = leaves_per_key[k]
        if any(id(jaxpr.invars[i + j]) in used_ids for j in range(n)):
            read.add(k)
        i += n
    return read
