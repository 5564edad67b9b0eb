"""Jitted, mesh-sharded train/eval steps.

The reference's hot loop (SURVEY.md §3.1) is Lightning: forward, backward,
Adam step, NCCL all-reduce, then a separate EMA callback. Here the whole step
— loss, grads, optimizer update, EMA lerp — is ONE jitted XLA program; under a
data-parallel mesh the gradient all-reduce is inserted by XLA from the
shardings (batch: P('data'), state: replicated).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowdec_tpu.parallel.mesh import DATA_AXIS
from flowdec_tpu.train.state import TrainState, masked_optimizer

__all__ = ["build_train_step", "make_train_step", "make_finetune_step", "make_eval_step", "fsdp_state_shardings", "tp_state_shardings"]


def build_train_step(model, optimizer: optax.GradientTransformation, *, ema_decay: float = 0.999):
    """Raw (unjitted) train step: (state, batch, key) → (state, metrics)."""
    opt = masked_optimizer(optimizer)

    def step_fn(state: TrainState, batch, key: jax.Array):
        def loss_fn(params):
            loss, aux = model.loss(params, key, batch, train=True)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # post-step EMA of the full tree (reference ema.py:93-100)
        new_ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params,
            new_params,
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )
        metrics = {
            "train_loss": loss,
            "grad_norm": optax.global_norm(grads),
            "n_nan": aux["n_nan"],
        }
        return new_state, metrics

    return step_fn


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    *,
    ema_decay: float = 0.999,
    mesh: Optional[Mesh] = None,
    fsdp: bool = False,
    fsdp_min_size: int = 2**16,
    tp: bool = False,
    example_state: Optional[TrainState] = None,
    donate: bool = True,
):
    """Jit a train step; with a mesh, pin DP shardings so XLA inserts the
    gradient all-reduce (the reference's NCCL DDP, TPU-native).

    batch is a (clean, coded) waveform tuple sharded on its leading axis.
    With fsdp=True (requires example_state for the tree structure), params /
    EMA / optimizer state are additionally sharded over the data axis
    (ZeRO-3-style; XLA all-gathers params and reduce-scatters grads).
    With tp=True (also requires example_state), params / EMA / Adam moments
    shard on their output-channel axis over the 'model' mesh axis
    (tensor parallelism; GSPMD places the channel collectives in both the
    forward and backward pass). fsdp and tp are mutually exclusive.
    """
    step_fn = build_train_step(model, optimizer, ema_decay=ema_decay)
    donate_args = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_args)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    assert not (fsdp and tp), "fsdp and tp are mutually exclusive"
    if fsdp:
        assert example_state is not None, "fsdp=True needs example_state"
        state_sh = fsdp_state_shardings(example_state, mesh, min_size=fsdp_min_size)
    elif tp:
        assert example_state is not None, "tp=True needs example_state"
        state_sh = tp_state_shardings(example_state, mesh)
    else:
        state_sh = repl
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=donate_args,
    )


def fsdp_state_shardings(example_state: TrainState, mesh: Mesh, *, min_size: int = 2**16) -> TrainState:
    """Sharding tree for a TrainState under FSDP: params/EMA sharded per
    fsdp_sharding, Adam moments following their params, the rest replicated.
    Use with jax.device_put(state, shardings) before a fsdp train step."""
    from flowdec_tpu.parallel.mesh import fsdp_sharding

    repl = NamedSharding(mesh, P())
    param_sh = fsdp_sharding(example_state.params, mesh, min_size=min_size)
    return TrainState(
        step=repl,
        params=param_sh,
        ema_params=fsdp_sharding(example_state.ema_params, mesh, min_size=min_size),
        opt_state=_match_opt_shardings(
            example_state.opt_state, example_state.params, param_sh, repl
        ),
    )


def tp_state_shardings(example_state: TrainState, mesh: Mesh) -> TrainState:
    """Sharding tree for a TrainState under tensor parallelism: params/EMA
    channel-sharded per tp_param_shardings, Adam moments following their
    params, the rest replicated."""
    from flowdec_tpu.parallel.tensor import tp_param_shardings

    repl = NamedSharding(mesh, P())
    param_sh = tp_param_shardings(example_state.params, mesh)
    return TrainState(
        step=repl,
        params=param_sh,
        ema_params=tp_param_shardings(example_state.ema_params, mesh),
        opt_state=_match_opt_shardings(
            example_state.opt_state, example_state.params, param_sh, repl
        ),
    )


def _match_opt_shardings(opt_state, params, param_shardings, repl):
    """Give Adam's mu/nu the same shardings as their parameters; everything
    else (counts, masks) replicated."""
    import flax

    flat_params = flax.traverse_util.flatten_dict(
        params, keep_empty_nodes=True, sep="/"
    )
    flat_shard = flax.traverse_util.flatten_dict(
        param_shardings, keep_empty_nodes=True, sep="/"
    )

    def map_leafdict(tree):
        # tree with the same structure as params → use param shardings
        flat = flax.traverse_util.flatten_dict(tree, keep_empty_nodes=True, sep="/")
        if set(flat) == set(flat_params):
            return flax.traverse_util.unflatten_dict(
                {k: flat_shard[k] for k in flat}, sep="/"
            )
        return jax.tree.map(lambda _: repl, tree)

    def walk(node):
        if isinstance(node, dict):
            return map_leafdict(node)
        if isinstance(node, tuple) and not hasattr(node, "shape"):
            if hasattr(node, "_fields"):  # namedtuple (e.g. ScaleByAdamState)
                return type(node)(*(walk(v) for v in node))
            return tuple(walk(v) for v in node)
        if hasattr(node, "shape"):
            return repl
        return repl

    return walk(opt_state)


def make_finetune_step(
    model,
    optimizer: optax.GradientTransformation,
    aux_losses,
    aux_weights=(),
    aux_weight: float = 1.0,
    *,
    ema_decay: float = 0.999,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
):
    """Train step using FlowModel.finetune_loss (CFM + waveform-domain aux
    losses on the one-step reconstruction — the reference's stripped
    finetuning stage, wired). batch = (x, y, speech_mask)."""
    opt = masked_optimizer(optimizer)
    aux_losses = tuple(aux_losses)
    aux_weights = tuple(aux_weights)

    def step_fn(state: TrainState, batch, key: jax.Array):
        x, y, speech_mask = batch

        def loss_fn(params):
            return model.finetune_loss(
                params, key, (x, y),
                aux_losses=aux_losses, aux_weights=aux_weights,
                speech_mask=speech_mask, aux_weight=aux_weight, train=True,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, new_params,
        )
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            ema_params=new_ema, opt_state=new_opt_state,
        )
        metrics = {
            "train_loss": loss,
            "cfm_loss": aux["cfm_loss"],
            "aux_loss": aux["aux_loss"],
            "grad_norm": optax.global_norm(grads),
            "n_nan": aux["n_nan"],
        }
        return new_state, metrics

    donate_args = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_args)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=donate_args,
    )


def make_eval_step(model, *, ema: bool = True, mesh: Optional[Mesh] = None):
    """Validation loss on EMA weights (reference swaps EMA in for val,
    ema.py:166-180)."""

    def step_fn(state: TrainState, batch, key: jax.Array):
        loss, aux = model.loss(state.eval_params(ema=ema), key, batch, train=False)
        return {"valid_loss": loss, "n_nan": aux["n_nan"]}

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step_fn, in_shardings=(repl, data, repl), out_shardings=repl)
