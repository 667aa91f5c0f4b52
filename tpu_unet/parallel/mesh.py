"""Device mesh construction and sharding specs.

The reference is strictly single-device (SURVEY.md §2.13: no torch.distributed
anywhere); this module is the rebuild's first-class parallelism layer. Design:

- One logical program compiled by GSPMD: a ``Mesh`` with axes ``('data', 'space')``;
  the batch dimension is sharded over 'data' (data parallelism) and, optionally, the
  image height dimension over 'space' (spatial parallelism for the elongated
  KolektorSDD inputs — XLA inserts the conv halo exchanges automatically).
- Parameters and optimizer state are replicated; gradient all-reduce, BatchNorm
  cross-replica statistics, and eval-metric aggregation are all emitted implicitly
  by XLA as psum/all-gather collectives over ICI.
- Multi-host entry via ``jax.distributed.initialize`` (see ``maybe_initialize``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_space: int = 1, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'space') mesh — plus a trailing 'model' axis when
    ``n_model > 1`` (tensor parallelism, ``parallel/tensor.py``). Defaults to
    all devices on the data axis; the 2-axis shape is kept when ``n_model == 1``
    so existing meshes (and anything keyed on their axis names) are unchanged.
    """
    if n_space < 1 or n_model < 1 or (n_data is not None and n_data < 1):
        raise ValueError(
            f"mesh axis sizes must be >= 1 (got data={n_data}, space={n_space}, "
            f"model={n_model})")
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_space * n_model)
        if n_data < 1:
            raise ValueError(
                f"mesh needs at least {n_space * n_model} devices for "
                f"space={n_space} x model={n_model}, have {len(devices)}")
    need = n_data * n_space * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_space}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    if n_model > 1:
        devs = np.asarray(devices[:need]).reshape(n_data, n_space, n_model)
        return Mesh(devs, (DATA_AXIS, SPACE_AXIS, MODEL_AXIS))
    devs = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(devs, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """NHWC batch: N over 'data'; optionally H over 'space'."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Place a host batch (pytree of arrays with leading batch dim) onto the mesh.

    Multi-process: each process passes only its OWN contiguous block of the
    global batch (what DataLoader assembles per-process); the global jax.Array is
    formed from the per-process blocks without any host ever holding the full
    batch (``jax.make_array_from_process_local_data``).
    """
    sharding = batch_sharding(mesh, spatial)
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(x))
    else:
        put = lambda x: jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     auto: bool = False) -> None:
    """Initialize multi-host JAX when launched across hosts (no-op single-host).

    ``auto=True`` (the trainers' ``--multihost`` flag) calls the argless
    ``jax.distributed.initialize()``, which autodetects the coordinator and
    process topology from the TPU pod metadata — the standard Cloud TPU launch,
    where the same command runs on every host of the slice. Explicit
    coordinator/num_processes/process_id cover manual (CPU/GPU-style) launches.
    Must run before the first backend touch (any ``jax.devices()`` call).
    """
    if auto and num_processes is None:
        jax.distributed.initialize()
    elif num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None or process_id is not None:
        # A half-specified manual launch would silently run as N independent
        # single-host jobs; refuse instead.
        raise ValueError(
            "--coordinator_address/--process_id require --num_processes > 1 "
            f"(got num_processes={num_processes}); pass --num_processes, or use "
            "--multihost for TPU-pod autodetection")


def synced_timestamp(fmt: str = "%Y%m%d_%H%M%S") -> str:
    """Process-0's wall-clock timestamp, identical on every host.

    Experiment directories are named by timestamp; under multi-host launch each
    process must derive the SAME name or the coordinated checkpoint save (and its
    path-named barriers in train/checkpoint.py) would target mismatched paths.
    Single-process: plain local time, no device traffic.
    """
    import datetime
    ts = datetime.datetime.now().strftime(fmt)
    if jax.process_count() > 1:
        # Broadcast the FORMATTED string (process 0's clock AND timezone), not
        # the epoch — hosts with differing TZ settings would format the same
        # epoch to different strings, recreating the divergence.
        from jax.experimental import multihost_utils
        buf = np.zeros(64, np.uint8)
        raw = ts.encode()[:64]
        buf[: len(raw)] = np.frombuffer(raw, np.uint8)
        out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        ts = out.tobytes().rstrip(b"\0").decode()
    return ts
