"""Inference-time BatchNorm folding: bake BN into the preceding conv weights.

Every DoubleConv is Conv(no bias) -> BN -> ReLU. At inference BN is an affine map
with the *running* statistics, so it folds into the conv:

    w' = w * gamma / sqrt(var + eps)        (per output channel)
    b' = beta - gamma * mean / sqrt(var + eps)

The multiplicative normalization moves into the conv kernel; the additive term
stays as the bias of a residual identity-statistics BN (the DoubleConv convs are
bias-free, so the BN module is the natural home for b'). XLA then folds the
remaining affine into the conv epilogue — the serving path loses the per-channel
normalization math and the batch_stats reads. The fold is a pure pytree-to-pytree
transform consumed by the unmodified model definition.

Numerics: folding matches BN(conv(x)) in f32 to ~1e-6; tested in
tests/test_fold_bn.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _fold_pair(conv: Dict[str, Any], bn_params: Dict[str, Any],
               bn_stats: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fold one (conv, bn) pair; returns (new_conv, residual_bn_params).

    The convs are bias-free (DoubleConv), so the additive term lives in the
    residual BN's bias while its multiplicative work moves into the conv kernel.
    The residual BN (stats mean=0, var=1, scale=1) computes
    ``x / sqrt(1 + eps) + bias``; the kernel is pre-scaled by sqrt(1 + eps) so the
    composition is exactly BN(conv(x)) with the original running statistics.
    """
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    inv = gamma * jax.lax.rsqrt(var + _EPS)

    correction = jnp.sqrt(jnp.float32(1.0) + _EPS)
    new_conv = dict(conv)
    new_conv["kernel"] = conv["kernel"].astype(jnp.float32) * (inv * correction)
    if "bias" in conv:
        new_conv["bias"] = conv["bias"].astype(jnp.float32) * (inv * correction)

    residual_bn = {
        "scale": jnp.ones_like(gamma),
        "bias": beta - mean * inv,
    }
    return new_conv, residual_bn


def fold_batchnorm(params, batch_stats):
    """Return (folded_params, identity_batch_stats) for inference.

    Walks the param tree; wherever a module owns conv{i}/bn{i} sibling pairs
    (the DoubleConv layout), the BN is folded into the conv and replaced by an
    identity affine with zero-mean/unit-var statistics.
    """
    def fold_tree(p, s):
        if not isinstance(p, dict):
            return p, s
        p = dict(p)
        s = dict(s) if isinstance(s, dict) else {}
        for name in list(p.keys()):
            if name.startswith("conv") and name[4:].isdigit():
                bn_name = "bn" + name[4:]
                if bn_name in p and bn_name in s:
                    p[name], p[bn_name] = _fold_pair(p[name], p[bn_name], s[bn_name])
                    s[bn_name] = {
                        "mean": jnp.zeros_like(s[bn_name]["mean"]),
                        "var": jnp.ones_like(s[bn_name]["var"]),
                    }
        for name, child in p.items():
            # Recurse into every submodule that is not itself a parameter leaf
            # (leaf conv dicts hold 'kernel'). Keying on the NAME instead used
            # to skip Down/Up's DoubleConv child (named 'conv'), silently
            # leaving 16 of the 18 BN pairs unfolded.
            if isinstance(child, dict) and "kernel" not in child:
                child_stats = s.get(name, {})
                p[name], new_child_stats = fold_tree(child, child_stats)
                if isinstance(s, dict) and name in s:
                    s[name] = new_child_stats
        return p, s

    return fold_tree(params, batch_stats)
