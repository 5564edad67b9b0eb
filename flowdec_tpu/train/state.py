"""Train state: params + EMA + optimizer state as one functional pytree.

Capability parity with the reference's EMA callback + EMA-aware checkpointing
(/root/reference/flowdec/callbacks/ema.py:30-233): a post-step exponential
moving average of the full parameter tree (decay 0.999), evaluated-with /
trained-without semantics, persisted alongside raw params. Here EMA is one
`tree_map` lerp fused into the jitted train step instead of a callback walking
state_dict tensors (the reference needed an apex multi_tensor fast path for
that; XLA fuses ours for free).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "trainable_mask", "masked_optimizer", "make_optimizer", "create_train_state"]


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any

    def eval_params(self, ema: bool = True):
        """Weights for evaluation: EMA by default (reference ema.py:166-180
        swaps EMA weights in for validation and restores after)."""
        return self.ema_params if ema else self.params


def trainable_mask(params) -> Any:
    """Pytree mask: False for frozen parameters.

    Frozen set (matching the reference's requires_grad=False params):
      * GaussianFourierProjection W (layerspp.py:47)
    sigma curves live outside params in this design, so nothing else freezes.
    """

    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: not any("fourier_proj" in part for part in k) for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def masked_optimizer(optimizer: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap an optimizer to skip frozen params. Must be used identically at
    state creation and in the train step (optax.masked with a callable mask)."""
    return optax.masked(optimizer, trainable_mask)


def make_optimizer(
    learning_rate: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam with the reference's defaults (config/optimizer/adam.yaml), plus an
    optional global-norm clip the reference lacks."""
    if weight_decay > 0:
        opt = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    else:
        opt = optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
    chain = [opt]
    if grad_clip_norm is not None:
        chain.insert(0, optax.clip_by_global_norm(grad_clip_norm))
    return optax.chain(*chain)


def create_train_state(
    model, key: jax.Array, optimizer: optax.GradientTransformation, *, frames: int = 64
) -> TrainState:
    params = model.init_params(key, frames=frames)
    masked_opt = masked_optimizer(optimizer)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=masked_opt.init(params),
    )
