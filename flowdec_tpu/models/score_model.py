"""ScoreDec/SGMSE+ baseline: score-based diffusion enhancement model.

Capability parity with ScoreModel (/root/reference/flowdec/model.py:583-688):
denoising score matching with the sigma-weighted loss (err·std ⇒ the net
effectively predicts standard-normal z), score = −NN(x,y,t)/std(t), and PC /
probability-flow-ODE samplers.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from flowdec_tpu.ops.cpair import cabs2, crandn_like
from flowdec_tpu.flow.samplers import pc_sample, probability_flow_sample
from flowdec_tpu.flow.sdes import BaseSDE, OUVESDE, _bstd
from flowdec_tpu.models.base import EnhancementModel

__all__ = ["ScoreModel"]


class ScoreModel(EnhancementModel):
    sde: BaseSDE = flax.struct.field(
        pytree_node=False, default_factory=lambda: OUVESDE(N=30)
    )
    t_eps: float = flax.struct.field(pytree_node=False, default=3e-2)

    # --- score function ---

    def score(self, params, xt, y, t, *, train=False, rngs=None):
        """score(x_t) = −NN(x_t, y, t) / std(t): the network predicts z, the
        division restores the Gaussian perturbation-kernel score
        (reference model.py:613-628)."""
        std = self.sde.std(t)
        return -self.apply_backbone(params, xt, y, t, train=train, rngs=rngs) / _bstd(
            std, xt
        )

    # --- training loss ---

    def loss(
        self, params, key: jax.Array, batch: Tuple[jax.Array, jax.Array], *, train: bool = True
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        x_wav, y_wav = batch
        Ys, Xs, _ = self.preprocess(y_wav, x=x_wav, window=self.stft_window(params))
        Ys = jax.lax.stop_gradient(Ys)
        Xs = jax.lax.stop_gradient(Xs)

        k_t, k_z, k_drop = jax.random.split(key, 3)
        batch_size = Xs.shape[0]
        ts = (
            jax.random.uniform(k_t, (batch_size,)) * (self.sde.T - self.t_eps)
            + self.t_eps
        )

        mean = self.sde.mean(Xs, ts, Ys)
        std = _bstd(self.sde.std(ts), mean)
        zs = crandn_like(k_z, Ys)
        xts = mean + zs * std

        # mixed-precision: backbone in compute_dtype, score/std math in f32
        score_est = self.score(
            self.cast_for_compute(params), self.cast_features(xts),
            self.cast_features(Ys), ts, train=train, rngs={"dropout": k_drop}
        ).astype(Ys.dtype)
        score_gt = -zs / std
        err = std * (score_est - score_gt)  # std-weighting stabilizer

        losses = cabs2(err)  # |err|² per complex element
        # Sum over features, average over batch, ×0.5 (reference model.py:610)
        per_sample = 0.5 * jnp.sum(losses.reshape(batch_size, -1), axis=-1)
        loss = jnp.mean(per_sample)
        return loss, {"per_sample": per_sample, "n_nan": jnp.sum(~jnp.isfinite(per_sample))}

    # --- inference ---

    def enhance(
        self,
        params,
        key: jax.Array,
        y: jax.Array,
        *,
        sampler_type: str = "pc",
        predictor: str = "reverse_diffusion",
        corrector: str = "ald",
        n_steps: int = 30,
        corrector_steps: int = 1,
        snr: float = 0.5,
        probability_flow: bool = False,
        solver: str = "rk4",
        denoise: bool = True,
    ):
        """Reverse-sample from the prior conditioned on Y (reference :630-657)."""
        window = self.stft_window(params)
        Y, _, info = self.preprocess(y, window=window)

        def score_fn(xt, y_feat, t):
            return self.score(params, xt, y_feat, t)

        if sampler_type == "pc":
            X_hat, _nfe = pc_sample(
                key, self.sde, score_fn, Y,
                n_steps=n_steps, predictor=predictor, corrector=corrector,
                snr=snr, corrector_steps=corrector_steps,
                probability_flow=probability_flow, denoise=denoise, eps=self.t_eps,
                noise_fn=crandn_like,
            )
        elif sampler_type == "ode":
            X_hat, _nfe = probability_flow_sample(
                key, self.sde, score_fn, Y,
                n_steps=n_steps, solver=solver, denoise=denoise, eps=self.t_eps,
                noise_fn=crandn_like,
            )
        else:
            raise ValueError(f"{sampler_type} is not a valid sampler type!")

        return self.postprocess(X_hat, info, window=window)
