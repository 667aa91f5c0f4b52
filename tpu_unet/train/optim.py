"""Optimizers and LR schedules (optax), with torch-matching semantics.

Parity targets (/root/reference/src/train_utils.py:263-284):
- adam/adamw/sgd(momentum 0.9), weight_decay 1e-4. torch's Adam/SGD apply weight
  decay as L2 added to the gradient *before* the moment updates; AdamW is decoupled.
- schedulers step once per epoch: cosine (T_max=epochs, eta_min=1e-6),
  step (step_size=epochs//3, gamma=0.1), plateau (mode=min, patience=10, factor=0.5),
  or none.

The learning rate is injected via ``optax.inject_hyperparams`` so the host-side
``LRScheduler`` can set it once per epoch (including the stateful plateau rule)
without recompiling the jitted train step.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
import optax


def make_optimizer(name: str = "adam", learning_rate: float = 1e-3,
                   weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """Build the optimizer with an injectable 'learning_rate' hyperparameter."""
    name = name.lower()

    def build(learning_rate):
        if name == "adam":
            return optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(learning_rate),
            )
        if name == "adamw":
            return optax.chain(
                optax.scale_by_adam(),
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.scale_by_learning_rate(learning_rate),
            )
        if name == "sgd":
            return optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.trace(decay=0.9, nesterov=False),
                optax.scale_by_learning_rate(learning_rate),
            )
        raise ValueError(f"Unknown optimizer: {name!r}")

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with its injected learning rate replaced."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class LRScheduler:
    """Host-side per-epoch LR schedule with torch-matching rules."""

    def __init__(self, name: str = "cosine", base_lr: float = 1e-3,
                 num_epochs: int = 100, eta_min: float = 1e-6,
                 plateau_patience: int = 10, plateau_factor: float = 0.5):
        self.name = (name or "none").lower()
        self.base_lr = base_lr
        self.num_epochs = num_epochs
        self.eta_min = eta_min
        self.plateau_patience = plateau_patience
        self.plateau_factor = plateau_factor
        # plateau state
        self._lr = base_lr
        self._best: Optional[float] = None
        self._bad_epochs = 0

    def lr_for_epoch(self, epoch: int) -> float:
        """LR to use during ``epoch`` (cosine/step/none). Plateau uses step_plateau."""
        if self.name == "cosine":
            return self.eta_min + (self.base_lr - self.eta_min) * 0.5 * (
                1 + np.cos(np.pi * epoch / self.num_epochs))
        if self.name == "step":
            step_size = max(self.num_epochs // 3, 1)
            return self.base_lr * (0.1 ** (epoch // step_size))
        if self.name == "plateau":
            return self._lr
        return self.base_lr  # 'none'

    def step_plateau(self, val_loss: float) -> float:
        """ReduceLROnPlateau(mode=min): call after each validation; returns new LR.

        torch semantics incl. the default relative threshold 1e-4: an epoch only
        counts as an improvement if ``loss < best * (1 - 1e-4)`` — infinitesimal
        drifts downward are bad epochs and still trigger the LR cut.
        """
        if self._best is None or val_loss < self._best * (1.0 - 1e-4):
            self._best = val_loss
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.plateau_patience:
                self._lr *= self.plateau_factor
                self._bad_epochs = 0
        return self._lr
