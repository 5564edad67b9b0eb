"""One-shot L2 regression baseline.

Capability parity with RegressionModel (/root/reference/flowdec/model.py:541-578):
X_hat = NN(Y, Y, t=0), loss = mean |X_hat − X|².
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from flowdec_tpu.models.base import EnhancementModel
from flowdec_tpu.ops.cpair import cabs2

__all__ = ["RegressionModel"]


class RegressionModel(EnhancementModel):
    loss_type: str = flax.struct.field(pytree_node=False, default="l2")

    def loss(
        self, params, key: jax.Array, batch: Tuple[jax.Array, jax.Array], *, train: bool = True
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        assert self.loss_type == "l2"
        x_wav, y_wav = batch
        Y, X, _ = self.preprocess(y_wav, x=x_wav, window=self.stft_window(params))
        Y = jax.lax.stop_gradient(Y)
        X = jax.lax.stop_gradient(X)
        t = jnp.zeros((X.shape[0],))
        # mixed-precision: backbone in compute_dtype, residual in f32
        Yc = self.cast_features(Y)
        x_hat = self.apply_backbone(
            self.cast_for_compute(params), Yc, Yc, t, train=train,
            rngs={"dropout": key}
        ).astype(X.dtype)
        sq = cabs2(x_hat - X)
        per_sample = jnp.mean(sq.reshape(X.shape[0], -1), axis=1)
        return jnp.mean(per_sample), {
            "per_sample": per_sample,
            "n_nan": jnp.sum(~jnp.isfinite(per_sample)),
        }

    def enhance(self, params, key: jax.Array, y: jax.Array, **_ignored):
        window = self.stft_window(params)
        Y, _, info = self.preprocess(y, window=window)
        t = jnp.zeros((Y.shape[0],))
        X_hat = self.apply_backbone(params, Y, Y, t)
        return self.postprocess(X_hat, info, window=window)
