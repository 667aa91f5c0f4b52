"""Training state: params + BatchNorm statistics + optimizer state, one pytree.

A functional replacement for the reference's mutable nn.Module + torch.optim pair:
the whole state flows through the jitted step and is donated, so updates happen
in-place in device memory.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, rng: jax.Array, input_shape, tx: optax.GradientTransformation,
                       train: bool = False) -> TrainState:
    """Initialize model variables and wrap them with the optimizer."""
    import jax.numpy as jnp

    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=train)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def num_params(state_or_params) -> int:
    params = getattr(state_or_params, "params", state_or_params)
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
