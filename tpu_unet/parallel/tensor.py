"""Tensor (model) parallelism: Megatron-style channel sharding for the UNet.

The reference has no model parallelism of any kind (it is strictly
single-device; SURVEY.md §2.13). This module shards the model's CHANNEL
dimension over a third mesh axis ``'model'`` — the conv-net analogue of
Megatron-LM's column/row-parallel linear pairs, expressed purely as GSPMD
sharding annotations on the parameters (no hand-written collectives):

Every ``DoubleConv`` (models/blocks.py) is a conv1 -> bn1 -> relu -> conv2
pair, which maps exactly onto the Megatron pattern:

- **conv1 kernel (HWIO): C_out sharded** ("column parallel") — each device
  computes its own slice of the output channels; no communication.
- **bn1 scale/bias + running stats: sharded on C** — BatchNorm is per-channel,
  so it runs locally on each device's channel slice; relu likewise.
- **conv2 kernel (HWIO): C_in sharded** ("row parallel") — each device
  contracts its channel slice; GSPMD inserts ONE all-reduce over 'model' for
  the partial sums. bn2 and everything downstream see full activations.

Net cost: one all-reduce per DoubleConv, the Megatron minimum. ``Up`` blocks'
transposed convs are column-sharded too (output channels feed the next
DoubleConv's conv1, which is input-replicated — GSPMD gathers just-in-time);
the 1x1 output heads (C_out = num_classes) and any channel count not divisible
by the axis size stay replicated — small models degrade gracefully toward
plain DP rather than erroring.

When to use: channel-sharding splits the WEIGHTS' FLOPs per device, so it is
the lever when one chip cannot hold/feed a very wide model (--base_features
256+) at trainable batch sizes — complementary to 'space' (which splits
activations by image height) and to FSDP (which splits state STORAGE but not
compute). The three compose: ``make_mesh(n_data, n_space, n_model)`` with
``shard_state(mesh, state, fsdp=..., tp=True)`` — FSDP's leaf policy applies
over 'data' to every leaf tensor parallelism leaves replicated.

Numerics: per-channel partitioning is exact; the only float effect is the
summation order inside conv2's contraction (tests pin parity with unsharded
steps at the usual f32 reorder tolerances, tests/test_tensor_parallel.py).
"""

from __future__ import annotations

import re
from typing import List

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_unet.parallel.mesh import DATA_AXIS, MODEL_AXIS
from tpu_unet.parallel.fsdp import DEFAULT_MIN_SIZE, leaf_partition_spec

# Level-up ConvTranspose module names: 'up' (blocks.Up) and 'up{i}_{j}'
# (models/unetpp.py nested grid). Anchored so e.g. an 'upsample' module
# would NOT match.
_UP_NAME = re.compile(r"up(\d+_\d+)?")


def _path_names(path) -> List[str]:
    """Stringified key path (dict keys, attr names, tuple indices) for a leaf."""
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


def tp_leaf_spec(path, shape, n_model: int) -> P:
    """Tensor-parallel PartitionSpec for one state leaf, by its tree path.

    Applies to params, BN batch_stats, and (because Adam moments mirror the
    params tree, module names included) optimizer state. Leaves that don't
    match the column/row pattern — or whose channel dim is not divisible by
    the axis size — return the replicated spec.
    """
    if n_model <= 1 or not shape:
        return P()
    names = _path_names(path)
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""

    if parent == "conv1" and leaf == "kernel" and len(shape) == 4:
        if shape[3] % n_model == 0:
            return P(None, None, None, MODEL_AXIS)        # column: C_out
    elif parent == "conv2" and leaf == "kernel" and len(shape) == 4:
        if shape[2] % n_model == 0:
            return P(None, None, MODEL_AXIS, None)        # row: C_in
    elif parent == "bn1":
        # scale/bias (params) and mean/var (batch_stats): per-channel on the
        # column-sharded slice.
        if len(shape) == 1 and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
    elif _UP_NAME.fullmatch(parent):
        # ConvTranspose between pyramid levels ('up' in Up blocks, 'up{i}_{j}'
        # in the UNet++ nested grid): column-shard its output channels.
        if leaf == "kernel" and len(shape) == 4 and shape[3] % n_model == 0:
            return P(None, None, None, MODEL_AXIS)
        if leaf == "bias" and len(shape) == 1 and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
    return P()


def tp_state_sharding(mesh: Mesh, state, fsdp: bool = False,
                      fsdp_axis: str = DATA_AXIS,
                      min_size: int = DEFAULT_MIN_SIZE):
    """Pytree of NamedShardings for a train state under tensor parallelism.

    ``fsdp=True`` additionally applies the FSDP leaf policy over ``fsdp_axis``
    to every leaf the TP rules leave replicated (ZeRO + TP composition);
    leaves TP shards are left TP-only — double-sharding one tensor over both
    axes buys little at these sizes and complicates the update layout.
    """
    if MODEL_AXIS not in mesh.shape:
        raise ValueError(
            f"tensor parallelism needs a '{MODEL_AXIS}' mesh axis; build the "
            f"mesh with make_mesh(..., n_model=K) (got axes {mesh.axis_names})")
    n_model = mesh.shape[MODEL_AXIS]
    n_fsdp = mesh.shape.get(fsdp_axis, 1)

    def one(path, x):
        shape = getattr(x, "shape", ())
        spec = tp_leaf_spec(path, shape, n_model)
        if fsdp and spec == P():
            spec = leaf_partition_spec(shape, n_fsdp, fsdp_axis, min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)
