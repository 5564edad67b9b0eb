"""ReFlow distillation: straighten the conditional flow for few-NFE serving.

Capability beyond the reference (SURVEY §6 notes NFE-reduction as the only
lever past the kernel ceiling; PERF.md's batch-8 analysis caps kernel work
at ~24× RT with NFE 6). Rectified-flow "reflow" (Liu et al. 2022, cited in
the torchcfm lineage the reference builds on, flowdec/model.py:391):

1. run the FROZEN teacher's N-step ODE from an explicit start
   z0 = Y + σ_fac·σ_y·ε to its solution z1 — keeping the (z0, z1) COUPLING;
2. retrain the student on the straight bridge of that coupled pair:
   x_t = (1−t)·z0 + t·z1,  target u = z1 − z0  (σ=0 CFM, no re-noising);
3. iterate (the once-rectified flow is nearly straight ⇒ Euler N=1-2 at
   quality close to the teacher's N=3 midpoint).

Only coded audio y is needed — no clean targets — so distillation can run
on unlabeled deployment traffic. Teacher defaults to the EMA weights
(eval-on-EMA semantics, reference ema.py:166-180).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowdec_tpu.ops.cpair import cabs2
from flowdec_tpu.parallel.mesh import DATA_AXIS
from flowdec_tpu.train.state import masked_optimizer

__all__ = ["generate_reflow_pairs", "reflow_loss", "make_distill_step"]


def generate_reflow_pairs(
    model,
    teacher_params,
    key: jax.Array,
    y_wav: jax.Array,
    *,
    n_steps: int = 3,
    solver: str = "midpoint",
    sigma_fac: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(z0, z1, Y): coupled (start, teacher-solution) feature pair + cond.

    All outputs are stop_gradient'ed f32 features (teacher is frozen)."""
    k_noise, k_ode = jax.random.split(key)
    window = model.stft_window(teacher_params)
    Y, _, _ = model.preprocess(y_wav, window=window)
    z0 = Y + sigma_fac * model._noise(k_noise, Y, model.sigma_y)
    z1 = model.enhance_features(
        teacher_params, k_ode, Y, n_steps=n_steps, solver=solver, init=z0
    )
    sg = jax.lax.stop_gradient
    return sg(z0), sg(z1), sg(Y)


def reflow_loss(
    model,
    params,
    key: jax.Array,
    z0: jax.Array,
    z1: jax.Array,
    Y: jax.Array,
    *,
    train: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """σ=0 CFM loss on the COUPLED straight bridge (no re-noising — the
    coupling is the whole point of reflow). NaN-masked like FlowModel.loss."""
    k_t, k_drop = jax.random.split(key)
    t = jax.random.uniform(k_t, (z0.shape[0],))
    t_b = t.reshape(t.shape + (1,) * (z0.ndim - 1))
    xt = (1.0 - t_b) * z0 + t_b * z1
    ut = z1 - z0
    vt = model.apply_backbone(params, xt, Y, t, train=train, rngs={"dropout": k_drop})

    sq_errs = cabs2(vt - ut)
    # match FlowModel.loss: a teacher trained with per-bin/band error
    # weighting must be distilled against the same weighted objective
    if model.error_weighting is not None:
        sq_errs = jnp.square(model.error_weighting) * sq_errs
    per_sample = jnp.mean(sq_errs.reshape(sq_errs.shape[0], -1), axis=1)
    finite = jnp.isfinite(per_sample)
    n_finite = jnp.sum(finite)
    loss = jnp.sum(jnp.where(finite, per_sample, 0.0)) / jnp.maximum(n_finite, 1)
    loss = jnp.where(n_finite > 0, loss, jnp.nan)
    return loss, {"per_sample": per_sample, "n_nan": per_sample.shape[0] - n_finite}


def make_distill_step(
    model,
    optimizer: optax.GradientTransformation,
    *,
    teacher_n_steps: int = 3,
    teacher_solver: str = "midpoint",
    sigma_fac: float = 1.0,
    ema_decay: float = 0.999,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
):
    """Jitted reflow step: step(state, teacher_params, y_batch, key).

    teacher_params is typically a frozen snapshot of state.ema_params from
    the converged CFM run (pass it explicitly so the teacher does NOT track
    the student). Batch is coded waveforms only, leading-axis DP over the
    mesh when given."""
    # same masked wrapping as build_train_step so the opt_state created by
    # create_train_state matches (frozen leaves, e.g. the fourier W, stay put)
    opt = masked_optimizer(optimizer)

    def step_fn(state, teacher_params, y_batch, key):
        k_pairs, k_loss = jax.random.split(key)
        z0, z1, Y = generate_reflow_pairs(
            model, teacher_params, k_pairs, y_batch,
            n_steps=teacher_n_steps, solver=teacher_solver, sigma_fac=sigma_fac,
        )

        def loss_fn(params):
            return reflow_loss(model, params, k_loss, z0, z1, Y, train=True)

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
            "distill_loss": loss,
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
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=donate_args,
    )
