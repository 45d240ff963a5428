"""Array-namespace helpers so one definition serves numpy (oracle) and jax."""

from __future__ import annotations

import numpy as np


def get_namespace(x):
    """Return ``jax.numpy`` for jax arrays / tracers, ``numpy`` otherwise."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np
    import jax.numpy as jnp

    return jnp


def to_numpy(x) -> np.ndarray:
    """Pull any array to host numpy (blocks on device arrays)."""
    return np.asarray(x)
