"""BatchNorm folding: folded params must reproduce eval-mode forward numerics."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.models import UNet
from tpu_unet.ops.fold_bn import fold_batchnorm


@pytest.mark.slow
def test_folded_forward_matches_eval():
    model = UNet(n_classes=2, base_features=4)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)

    # Give the running stats non-trivial values by doing a few train-mode passes.
    v = variables
    for i in range(3):
        xi = jax.random.normal(jax.random.key(10 + i), (2, 32, 32, 3))
        _, mut = model.apply(v, xi, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": mut["batch_stats"]}

    ref = model.apply(v, x, train=False)

    folded_params, identity_stats = fold_batchnorm(v["params"], v["batch_stats"])
    out = model.apply({"params": folded_params, "batch_stats": identity_stats},
                      x, train=False)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fold_reaches_every_bn():
    """EVERY BN pair in the network must fold to identity stats — the recursion
    used to skip Down/Up's DoubleConv child (named 'conv'), leaving 16/18 BNs
    unfolded while numerics stayed correct (so the forward-parity test passed)."""
    from tpu_unet.models import AnomalyUNet

    for model, expect in [(UNet(n_classes=2, base_features=4), 18),
                          (AnomalyUNet(base_features=4), 26)]:
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
        stats = jax.tree_util.tree_map(lambda x: x + 0.25, v["batch_stats"])
        _, folded_stats = fold_batchnorm(v["params"], stats)
        n_id = n_tot = 0
        def walk(d):
            nonlocal n_id, n_tot
            for val in d.values():
                if isinstance(val, dict):
                    if "mean" in val and "var" in val:
                        n_tot += 1
                        if (float(jnp.abs(val["mean"]).max()) == 0.0
                                and float(jnp.abs(val["var"] - 1).max()) == 0.0):
                            n_id += 1
                    else:
                        walk(val)
        walk(folded_stats)
        assert (n_id, n_tot) == (expect, expect), (n_id, n_tot, expect)


def test_fold_preserves_param_structure():
    model = UNet(n_classes=1, base_features=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    folded, stats = fold_batchnorm(variables["params"], variables["batch_stats"])
    ref_paths = {jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_leaves_with_path(variables["params"])}
    new_paths = {jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_leaves_with_path(folded)}
    # The fold is structure-preserving: same param tree in and out.
    assert ref_paths == new_paths
