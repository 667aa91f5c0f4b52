"""Mixed-precision policy for TPU execution.

TPU-first design: parameters and batch-norm statistics live in float32; the
convolution compute path (the MXU-bound work) runs in bfloat16. This replaces the
reference's implicit full-float32 PyTorch execution (reference keeps everything in
f32; see /root/reference/src/model.py) with the idiomatic TPU split.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Precision policy threaded through all modules.

    Attributes:
      param_dtype:   dtype parameters are stored in (always f32 for stability).
      compute_dtype: dtype convolutions/matmuls run in (bf16 on TPU).
      norm_dtype:    dtype normalization layers compute in (f32: BN statistics are
                     variance-sensitive and cheap relative to the convs).
      output_dtype:  dtype model outputs are cast to (f32 so losses/metrics are exact).
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16)


def get_policy(name: str) -> Policy:
    """Resolve a policy by CLI name ('f32' | 'bf16')."""
    name = name.lower()
    if name in ("f32", "float32", "fp32"):
        return DEFAULT_POLICY
    if name in ("bf16", "bfloat16", "mixed"):
        return BF16_POLICY
    raise ValueError(f"Unknown precision policy: {name!r} (expected 'f32' or 'bf16')")
