"""FSDP / ZeRO-style state sharding: leaf policy, placement, and numerics.

The claim under test: sharding params + Adam moments over the 'data' axis
(parallel/fsdp.py) is a pure placement change — GSPMD turns the DP grad
all-reduce into reduce-scatter + just-in-time weight all-gathers, the update
math is identical, and the compiled step keeps the state sharded across steps
(so the training loop never silently re-replicates).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpu_unet.models import AnomalyUNet
from tpu_unet.parallel import make_mesh, replicate, shard_batch
from tpu_unet.parallel.fsdp import (
    fsdp_sharding,
    leaf_partition_spec,
    per_device_state_bytes,
    shard_state,
    sharded_fraction,
)
from tpu_unet.train import (
    AugmentConfig,
    create_train_state,
    make_anomaly_eval_step,
    make_anomaly_train_step,
    make_optimizer,
)

# Whole-file slow tier: multi-device numerics / PTQ sweeps (see pyproject markers).
pytestmark = pytest.mark.slow

FAST_AUG = AugmentConfig(degrees=0.0, p_flip=0.0, brightness=0.0, contrast=0.0,
                         saturation=0.0, hue=0.0)


def anomaly_batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    msk = (rng.uniform(size=(n, 32, 32, 1)) > 0.9).astype(np.float32)
    return img, msk


class TestLeafPolicy:
    def test_small_leaves_stay_replicated(self):
        assert leaf_partition_spec((64,), 8) == P()          # BN vector
        assert leaf_partition_spec((), 8) == P()             # step counter
        assert leaf_partition_spec((3, 3, 3, 64), 8) == P()  # 1.7k stem kernel

    def test_conv_kernel_shards_largest_dim_tie_trailing(self):
        # HWIO with Cin == Cout: the tie must go to the TRAILING dim (C_out).
        assert leaf_partition_spec((3, 3, 512, 512), 8) == P(None, None, None, "data")
        # Cin larger than Cout: largest wins regardless of position.
        assert leaf_partition_spec((3, 3, 1024, 512), 8) == P(None, None, "data", None)

    def test_indivisible_shapes_degrade_to_replicated(self):
        assert leaf_partition_spec((3, 3, 100, 100), 8) == P()  # 8 divides nothing

    def test_divisible_but_not_largest_dim_still_picked(self):
        # Only the middle dim is divisible by 8; it must be chosen even though
        # the trailing dim is larger.
        assert leaf_partition_spec((5, 128, 129), 8) == P(None, "data", None)

    def test_single_shard_axis_is_replicated(self):
        assert leaf_partition_spec((3, 3, 512, 512), 1) == P()

    def test_full_size_unet_ladder_all_shards(self):
        # Every conv kernel of the production channel ladder (base_features=64)
        # from the second block up clears min_size and has an 8-divisible dim.
        for cin, cout in [(64, 128), (128, 256), (256, 512), (512, 1024),
                          (1024, 512), (512, 256)]:
            assert leaf_partition_spec((3, 3, cin, cout), 8) != P()


class TestPlacement:
    def test_fsdp_false_is_replicate(self, devices):
        mesh = make_mesh(n_data=8)
        tree = {"w": np.ones((8, 8192), np.float32)}
        placed = shard_state(mesh, tree, fsdp=False)
        assert placed["w"].sharding.is_fully_replicated

    def test_one_wide_axis_is_replicate_with_warning(self, devices):
        mesh = make_mesh(n_data=1, n_space=8)
        tree = {"w": np.ones((8, 8192), np.float32)}
        with pytest.warns(UserWarning, match="1-wide"):
            placed = shard_state(mesh, tree, fsdp=True)
        assert placed["w"].sharding.is_fully_replicated

    def test_state_shards_and_memory_drops(self, devices):
        mesh = make_mesh(n_data=8)
        model = AnomalyUNet(base_features=8)
        tx = make_optimizer("adam", 1e-3, 1e-4)
        state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        repl = replicate(mesh, state)
        fsdp = shard_state(mesh, state, fsdp=True)
        # Big leaves sharded, per-device bytes strictly below replicated.
        assert sharded_fraction(fsdp.params) > 0.5
        assert sharded_fraction(fsdp.opt_state) > 0.4  # mu/nu mirror params
        b_repl = per_device_state_bytes(repl.params)
        b_fsdp = per_device_state_bytes(fsdp.params)
        assert b_fsdp < 0.6 * b_repl
        # Values are placement-invariant.
        for a, b in zip(jax.tree_util.tree_leaves(repl.params),
                        jax.tree_util.tree_leaves(fsdp.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fsdp_sharding_mirrors_tree(self, devices):
        mesh = make_mesh(n_data=8)
        tree = {"big": np.zeros((16, 4096), np.float32),
                "small": np.zeros((16,), np.float32)}
        sh = fsdp_sharding(mesh, tree)
        assert sh["big"].spec == P(None, "data")  # 4096 is the largest dim
        assert sh["small"].spec == P()


class TestNumericsAndLayout:
    def _run(self, img, msk, mesh=None, fsdp=False, steps=3, opt="adam",
             lr=1e-2):
        model = AnomalyUNet(base_features=4)
        tx = make_optimizer(opt, lr, 1e-4)
        state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
        step = make_anomaly_train_step(aug_cfg=FAST_AUG, donate_state=False)
        bi, bm = img, msk
        if mesh is not None:
            state = shard_state(mesh, state, fsdp=fsdp)
            b = shard_batch(mesh, {"i": np.asarray(img), "m": np.asarray(msk)})
            bi, bm = b["i"], b["m"]
        losses = []
        for i in range(steps):
            state, ld = step(state, bi, bm, jax.random.key(i))
            losses.append(float(ld["total_loss"]))
        return losses, state

    def test_fsdp_matches_replicated_dp(self, devices):
        """FSDP vs replicated DP on the SAME mesh: a placement-only change.

        Step 1 is essentially bit-equal (identical grads; the update math is
        elementwise). The 3-step ADAM loss trajectory gets 5e-5: reduce-scatter
        reorders the f32 grad summation vs all-reduce (~1e-7 relative), and
        early Adam steps amplify any perturbation through m/(sqrt(v)+eps) while
        v is still noise-level. Per-PARAM trajectories are NOT compared under
        Adam — measured control: replicated 8-way DP vs single-device already
        drifts 3.7e-2 on near-zero-gradient params after 3 steps (loss equal to
        1e-4); FSDP-vs-DP drift is smaller than that. The SGD test below pins
        param-level parity where the optimizer doesn't amplify.
        """
        img, msk = anomaly_batch(n=8, seed=3)
        mesh = make_mesh(n_data=8)
        losses_dp, state_dp = self._run(img, msk, mesh=mesh, fsdp=False)
        losses_f, state_f = self._run(img, msk, mesh=mesh, fsdp=True)
        assert abs(losses_dp[0] - losses_f[0]) < 1e-6
        np.testing.assert_allclose(losses_dp, losses_f, rtol=0, atol=5e-5)

    def test_fsdp_sgd_params_match_single_device(self, devices):
        """3 SGD steps: 8-way FSDP == 1-device params to 1e-5 (SGD is linear in
        the grads, so summation-order noise stays at f32 epsilon level)."""
        img, msk = anomaly_batch(n=8, seed=3)
        losses1, state1 = self._run(img, msk, opt="sgd")
        mesh = make_mesh(n_data=8)
        losses8, state8 = self._run(img, msk, mesh=mesh, fsdp=True, opt="sgd")
        np.testing.assert_allclose(losses1, losses8, rtol=0, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                        jax.tree_util.tree_leaves(state8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_layout_stable_across_steps(self, devices):
        """The compiled step must RETURN the state still FSDP-sharded: a
        replicated output would silently defeat the memory saving on step 2+
        (and break buffer donation in the real loop)."""
        img, msk = anomaly_batch(n=8, seed=4)
        mesh = make_mesh(n_data=8)
        _, state = self._run(img, msk, mesh=mesh, fsdp=True, steps=2)
        assert sharded_fraction(state.params) > 0.5
        assert sharded_fraction(state.opt_state) > 0.4

    def test_eval_step_accepts_fsdp_state(self, devices):
        """Validation inside an FSDP training run reuses the sharded state."""
        img, msk = anomaly_batch(n=8, seed=5)
        mesh = make_mesh(n_data=8)
        _, state = self._run(img, msk, mesh=mesh, fsdp=True, steps=1)
        ev = make_anomaly_eval_step()
        b = shard_batch(mesh, {"i": img, "m": msk})
        out = ev(state, b["i"], b["m"])
        assert np.isfinite(float(out["losses"]["total_loss"]))
        assert out["score"].shape == (8,)

    @pytest.mark.slow
    def test_train_cli_fsdp_wiring(self, devices, tmp_path):
        """--fsdp reaches the placement through the real trainer: one epoch on
        synthetic data, checkpoint written, resume leg restores into the
        sharded layout without error."""
        import os

        from tests.test_data import make_mvtec
        from tpu_unet.cli.train_mvtec import main as train_main

        root = make_mvtec(str(tmp_path / "mvtec"), n_train=8, n_test_good=2,
                          n_broken=2, size=32)
        exp = train_main([
            "--data_root", root, "--category", "bottle", "--image_size", "32",
            "--epochs", "1", "--batch_size", "8", "--val_freq", "1",
            "--num_workers", "2", "--save_dir", str(tmp_path / "out"),
            "--base_features", "4", "--precision", "f32",
            "--n_devices", "8", "--fsdp",
        ])
        best = os.path.join(exp, "checkpoints", "best_model")
        assert os.path.isdir(best)
        exp2 = train_main([
            "--data_root", root, "--category", "bottle", "--image_size", "32",
            "--epochs", "2", "--batch_size", "8", "--val_freq", "2",
            "--num_workers", "2", "--save_dir", str(tmp_path / "out2"),
            "--base_features", "4", "--precision", "f32",
            "--n_devices", "8", "--fsdp", "--resume", best,
        ])
        assert exp2 is not None

    def test_fsdp_with_grad_accum(self, devices):
        """--fsdp composes with --grad_accum: the (G, B/G, ...) scan runs on
        sharded params and matches the unsharded accumulated step."""
        img, msk = anomaly_batch(n=8, seed=6)
        model = AnomalyUNet(base_features=4)
        tx = make_optimizer("adam", 1e-2, 1e-4)
        step = make_anomaly_train_step(aug_cfg=FAST_AUG, donate_state=False,
                                       grad_accum=2)

        def run(fsdp):
            state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), tx)
            bi, bm = img, msk
            if fsdp:
                mesh = make_mesh(n_data=4)
                state = shard_state(mesh, state, fsdp=True)
                b = shard_batch(mesh, {"i": img, "m": msk})
                bi, bm = b["i"], b["m"]
            state, ld = step(state, bi, bm, jax.random.key(9))
            return float(ld["total_loss"]), state

        l1, s1 = run(False)
        l4, s4 = run(True)
        assert abs(l1 - l4) < 1e-5
        a = jax.tree_util.tree_leaves(s1.params)[0]
        b = jax.tree_util.tree_leaves(s4.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
