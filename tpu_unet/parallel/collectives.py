"""Cross-host aggregation helpers (the 'communication layer' of SURVEY §2.14).

Within one GSPMD program, collectives are implicit (psum for gradients, global
BatchNorm statistics). These helpers cover the host-side seams of multi-host runs:

- ``all_gather_host_values``: gather per-host numpy payloads (eval scores, labels)
  so every process can compute the exact global AUROC/threshold sweep — the
  host-side analogue of the reference's single-process result concatenation.
- ``psum_scalar``: jitted cross-device scalar reduction for quick global stats.

Single-process runs are a no-op passthrough, so the same epoch drivers work from
one chip to a full multi-host slice.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def all_gather_host_values(values: np.ndarray) -> np.ndarray:
    """Concatenate a per-host (batch-leading) array across processes.

    Returns ``values`` unchanged in single-process runs.
    """
    if jax.process_count() == 1:
        return np.asarray(values)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.asarray(values), tiled=True)
    return np.asarray(gathered)


def psum_scalar(x, mesh, axis: str = "data"):
    """Sum a scalar across the mesh's data axis (one jitted collective)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def _sum(v):
        return jnp.sum(v)

    return float(_sum(jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))))


def broadcast_from_host0(tree: Any) -> Any:
    """Broadcast a host-0 pytree to all processes (config/threshold decisions)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
