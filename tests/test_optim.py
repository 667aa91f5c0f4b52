"""Optimizer and LR-schedule tests: torch-matching semantics on tiny params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.train.optim import (
    LRScheduler,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)

torch = pytest.importorskip("torch")


def tiny_params(seed=0):
    rng = np.random.default_rng(seed)
    return {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32)),
            "b": jnp.asarray(rng.standard_normal((4,)).astype(np.float32))}


def torch_params(params):
    # Iterate in sorted-key order: jax tree ops canonicalize dicts by sorted key.
    return {k: torch.nn.Parameter(torch.tensor(np.asarray(params[k])))
            for k in sorted(params)}


def run_optax(name, params, grads_seq, lr, wd):
    tx = make_optimizer(name, lr, wd)
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params


def run_torch(opt_name, tparams, grads_seq, lr, wd):
    plist = list(tparams.values())
    if opt_name == "adam":
        opt = torch.optim.Adam(plist, lr=lr, weight_decay=wd)
    elif opt_name == "adamw":
        opt = torch.optim.AdamW(plist, lr=lr, weight_decay=wd)
    else:
        opt = torch.optim.SGD(plist, lr=lr, momentum=0.9, weight_decay=wd)
    for g in grads_seq:
        opt.zero_grad()
        for k in tparams:
            tparams[k].grad = torch.tensor(np.asarray(g[k]))
        opt.step()
    return tparams


@pytest.mark.parametrize("name", ["adam", "adamw", "sgd"])
def test_optimizer_matches_torch(name):
    params = tiny_params()
    rng = np.random.default_rng(1)
    grads_seq = [
        {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal((4,)).astype(np.float32))}
        for _ in range(4)
    ]
    ours = run_optax(name, params, grads_seq, lr=1e-2, wd=1e-3)
    theirs = run_torch(name, torch_params(params), grads_seq, lr=1e-2, wd=1e-3)
    for k in params:
        np.testing.assert_allclose(np.asarray(ours[k]), theirs[k].detach().numpy(),
                                   rtol=2e-5, atol=2e-6, err_msg=f"{name}/{k}")


def test_set_learning_rate_roundtrip():
    tx = make_optimizer("adam", 1e-3, 0.0)
    state = tx.init(tiny_params())
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9  # f32 storage
    state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9


class TestSchedules:
    def test_cosine_matches_torch_formula(self):
        sched = LRScheduler("cosine", base_lr=1e-3, num_epochs=100, eta_min=1e-6)
        for e in (0, 25, 50, 99, 100):
            expect = 1e-6 + (1e-3 - 1e-6) * (1 + np.cos(np.pi * e / 100)) / 2
            assert abs(sched.lr_for_epoch(e) - expect) < 1e-12
        assert abs(sched.lr_for_epoch(0) - 1e-3) < 1e-12

    def test_step_matches_torch_formula(self):
        sched = LRScheduler("step", base_lr=1e-3, num_epochs=90)
        assert abs(sched.lr_for_epoch(0) - 1e-3) < 1e-15
        assert abs(sched.lr_for_epoch(30) - 1e-4) < 1e-15
        assert abs(sched.lr_for_epoch(60) - 1e-5) < 1e-15

    def test_plateau_reduces_after_patience(self):
        sched = LRScheduler("plateau", base_lr=1e-3, num_epochs=100,
                            plateau_patience=2, plateau_factor=0.5)
        assert sched.step_plateau(1.0) == 1e-3      # best
        assert sched.step_plateau(1.1) == 1e-3      # bad 1
        assert sched.step_plateau(1.1) == 1e-3      # bad 2
        assert sched.step_plateau(1.1) == 5e-4      # bad 3 > patience -> reduce
        assert sched.step_plateau(0.5) == 5e-4      # new best, no change

    def test_plateau_relative_threshold(self):
        """torch ReduceLROnPlateau parity: improvements smaller than the 1e-4
        relative threshold are BAD epochs — infinitesimal downward drift must
        still trigger the LR cut."""
        sched = LRScheduler("plateau", base_lr=1e-3, num_epochs=100,
                            plateau_patience=2, plateau_factor=0.5)
        assert sched.step_plateau(1.0) == 1e-3          # best
        assert sched.step_plateau(0.999999) == 1e-3     # <0.01% better: bad 1
        assert sched.step_plateau(0.999998) == 1e-3     # bad 2
        assert sched.step_plateau(0.999997) == 5e-4     # bad 3 > patience -> cut
        assert sched.step_plateau(0.99) == 5e-4         # real improvement: reset

    def test_none_schedule_constant(self):
        sched = LRScheduler("none", base_lr=1e-3, num_epochs=10)
        assert all(sched.lr_for_epoch(e) == 1e-3 for e in range(10))
