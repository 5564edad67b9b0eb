"""Shared enhancement-model machinery: preprocessing, postprocessing, and the
common model container.

Capability parity with EnhancementModel (/root/reference/flowdec/model.py:37):
_preprocess (:129) = normalize → feature-extract → pad-to-64-frames, and
_postprocess (:165) = unpad → invert features → de-normalize. Functional
re-design: models are flax.struct pytrees (sigma curves are leaves, configs
are static), params live outside the model, preprocess returns a static
info tuple instead of an undo closure so everything jits, and features are
cpair arrays (B, F, T, 2) — see ops/cpair.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from flowdec_tpu.models.features import FeatureExtractor
from flowdec_tpu.nn.ncsnpp import NCSNpp
from flowdec_tpu.ops.padding import normalize_noisy, pad_spec, unpad_spec

__all__ = ["PreprocessInfo", "EnhancementModel", "leading_shape_to_batch"]


class PreprocessInfo(NamedTuple):
    """Static + per-sample info needed to invert preprocessing.

    orig_length / orig_frames / squeeze_dims are Python ints (shape-derived,
    hence static under jit); normfac is a per-sample array.
    """

    orig_length: int
    orig_frames: int
    normfac: jax.Array
    squeeze_dims: int


def leading_shape_to_batch(y: jax.Array) -> Tuple[jax.Array, int]:
    """Normalize waveform input to (B, L) mono; returns (array, squeeze_dims).

    Accepts (L,), (B, L) or (B, 1, L) — the shapes the reference's repeated
    unsqueeze loop handles (model.py:144-148).
    """
    squeeze_dims = 0
    if y.ndim == 1:
        y = y[None]
        squeeze_dims = 1
    elif y.ndim == 3:
        assert y.shape[1] == 1, f"only mono audio supported, got shape {y.shape}"
        y = y[:, 0]
        squeeze_dims = -1  # marker: re-insert the channel axis on output
    assert y.ndim == 2, f"unsupported waveform shape {y.shape}"
    return y, squeeze_dims


class EnhancementModel(flax.struct.PyTreeNode):
    """Config container shared by Flow/Score/Regression models.

    The backbone Flax module and feature extractor are static pytree metadata;
    subclasses may add array leaves (e.g. sigma curves).
    """

    backbone: NCSNpp = flax.struct.field(pytree_node=False)
    feature_extractor: FeatureExtractor = flax.struct.field(pytree_node=False)
    sampling_rate: int = flax.struct.field(pytree_node=False, default=48000)
    normalize_mode: str = flax.struct.field(pytree_node=False, default="noisy")
    # inference compute dtype: None = float32; "bfloat16" runs the backbone's
    # convs/matmuls on the MXU in bf16 (params cast once per enhance call,
    # features cast at the ODE boundary; losses/training stay f32)
    compute_dtype: Optional[str] = flax.struct.field(pytree_node=False, default=None)
    # serving-only: also run the fixed feature chain (normalize → STFT →
    # compress, and the inverse) in compute_dtype. The whole chain follows its
    # input dtype (window/DFT matrices/compression are dtype-polymorphic), so
    # this is a single waveform cast at entry + one at exit. At the distilled
    # NFE-1 operating point the fixed feature work is a large share of device
    # time (PERF.md r3 NFE-1 profile) — this knob trades ~38 dB of feature
    # SNR (far below the enhancement residual) for that time. Training and
    # parity paths keep f32 (default off; losses never read it).
    cast_preprocess: bool = flax.struct.field(pytree_node=False, default=False)

    def cast_for_compute(self, params):
        """Cast float params to the inference compute dtype (no-op if None)."""
        if self.compute_dtype is None:
            return params
        dt = jnp.dtype(self.compute_dtype)
        return jax.tree.map(
            lambda p: p.astype(dt) if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
        )

    def cast_features(self, x):
        if self.compute_dtype is None:
            return x
        return x.astype(jnp.dtype(self.compute_dtype))

    # --- parameter initialization ---

    def init_params(self, key: jax.Array, *, frames: int = 64, batch: int = 1):
        n_bins = self.feature_extractor.n_bins
        dummy = jnp.zeros((batch, n_bins, frames, 2), dtype=jnp.float32)
        t = jnp.zeros((batch,), dtype=jnp.float32)
        variables = self.backbone.init(key, dummy, dummy, t)
        if getattr(self.feature_extractor, "learnable_window", False):
            # learnable analysis/synthesis window (reference
            # feature_extractors.py:75): a plain entry in the params
            # collection so the optimizer/EMA treat it like any weight
            import flax.core

            variables = flax.core.unfreeze(variables)
            variables["params"]["stft_window"] = jnp.asarray(
                self.feature_extractor.initial_window(), jnp.float32
            )
        return variables

    def stft_window(self, params) -> Optional[jax.Array]:
        """The live learnable window from params, or None when static."""
        if getattr(self.feature_extractor, "learnable_window", False):
            return params["params"]["stft_window"]
        return None

    # --- data representation ---

    def preprocess(
        self,
        y: jax.Array,
        x: Optional[jax.Array] = None,
        comp_eps: Optional[float] = None,
        window: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array], PreprocessInfo]:
        """waveforms → padded compressed-STFT features.

        Returns (Y, X or None, info)."""
        assert x is None or x.shape == y.shape
        y, squeeze_dims = leading_shape_to_batch(y)
        if x is not None:
            x, _ = leading_shape_to_batch(x)
        if self.cast_preprocess and self.compute_dtype is not None:
            dt = jnp.dtype(self.compute_dtype)
            y = y.astype(dt)
            if x is not None:
                x = x.astype(dt)

        y, x, normfac = normalize_noisy(y, mode=self.normalize_mode, x=x)
        Y = self.feature_extractor.forward(y, comp_eps=comp_eps, window=window)
        Y, orig_frames = pad_spec(Y, mode="zero", axis=-2)

        X = None
        if x is not None:
            X = self.feature_extractor.forward(x, comp_eps=comp_eps, window=window)
            X, _ = pad_spec(X, mode="zero", axis=-2)
            assert X.shape == Y.shape

        info = PreprocessInfo(
            orig_length=y.shape[-1],
            orig_frames=orig_frames,
            normfac=normfac,
            squeeze_dims=squeeze_dims,
        )
        return Y, X, info

    def postprocess(
        self,
        X: jax.Array,
        info: PreprocessInfo,
        window: Optional[jax.Array] = None,
    ) -> jax.Array:
        """padded features → de-normalized waveform (inverse of preprocess)."""
        X = unpad_spec(X, info.orig_frames, axis=-2)
        x = self.feature_extractor.invert(X, orig_length=info.orig_length, window=window)
        x = x * info.normfac
        if info.squeeze_dims == 1:
            x = x[0]
        elif info.squeeze_dims == -1:
            x = x[:, None, :]
        return x

    # --- backbone call ---

    def apply_backbone(self, params, xt, y, t, *, train=False, rngs=None):
        if t.ndim == 0:
            t = t[None]
        return self.backbone.apply(params, xt, y, t, train=train, rngs=rngs)
