"""Builders: map composed-config dictionaries onto framework objects.

These are the `_target_`s used by the YAML config tree (flowdec_tpu/configs),
mirroring how the reference's Hydra configs target flowdec classes
(e.g. config/model/flow_model_final.yaml → flowdec.model.FlowModel).

Trainer-level keys that the reference stores on the model (lr, eval_variants,
eval_metrics, num_eval_files, evaluation_seed) are accepted and ignored here —
the Trainer reads them from the raw config (functional split of concerns).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from flowdec_tpu.models import (
    AmplitudeCompressedComplexSTFT,
    FlowModel,
    RegressionModel,
    ScoreModel,
)
from flowdec_tpu.models import sigma_models
from flowdec_tpu.nn import NCSNpp, NCSNppConfig

__all__ = [
    "build_backbone",
    "build_flow_model",
    "build_score_model",
    "build_regression_model",
]

_TRAINER_ONLY_KEYS = (
    "lr",
    "eval_variants",
    "eval_metrics",
    "num_eval_files",
    "evaluation_seed",
)


def build_backbone(
    *,
    image_size: int = 256,
    nonlinearity: str = "swish",
    nf: int = 128,
    ch_mult: Sequence[int] = (1, 1, 2, 2, 2, 2, 2),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (),
    bottleneck_attn: bool = True,
    resamp_with_conv: bool = True,
    conditional: bool = True,
    fir: bool = True,
    fir_kernel: Sequence[float] = (1, 3, 3, 1),
    skip_rescale: bool = True,
    resblock_type: str = "biggan",
    progressive: str = "output_skip",
    progressive_input: str = "input_skip",
    progressive_combine: str = "sum",
    init_scale: float = 0.0,
    embedding_type: str = "fourier",
    fourier_scale: float = 16.0,
    dropout: float = 0.0,
    num_channels: int = 4,
    output_layer_kwargs: Optional[Dict[str, Any]] = None,
    remat: bool = True,
    transpose_image: bool = False,
) -> NCSNpp:
    """NCSN++ from the reference's YAML schema (ncsnpp_*.yaml keys)."""
    out_kw = dict(kernel_size=3, bias=False)
    if output_layer_kwargs:
        out_kw.update(
            {k: v for k, v in output_layer_kwargs.items() if k in ("kernel_size", "bias")}
        )
    cfg = NCSNppConfig(
        nonlinearity=nonlinearity,
        nf=nf,
        ch_mult=tuple(ch_mult),
        num_res_blocks=num_res_blocks,
        attn_resolutions=tuple(attn_resolutions),
        resamp_with_conv=resamp_with_conv,
        conditional=conditional,
        fir=fir,
        fir_kernel=tuple(float(k) for k in fir_kernel),
        skip_rescale=skip_rescale,
        resblock_type=resblock_type,
        progressive=progressive,
        progressive_input=progressive_input,
        progressive_combine=progressive_combine,
        init_scale=init_scale,
        fourier_scale=fourier_scale,
        image_size=image_size,
        embedding_type=embedding_type,
        dropout=dropout,
        num_channels=num_channels,
        output_kernel_size=int(out_kw["kernel_size"]),
        output_bias=bool(out_kw["bias"]),
        bottleneck_attn=bottleneck_attn,
        remat=remat,
        transpose_image=transpose_image,
    )
    return NCSNpp(cfg)


def _sigma_array(sigma) -> jnp.ndarray:
    """float / list / ndarray / already-built curve → broadcastable array."""
    if isinstance(sigma, (int, float)):
        return jnp.asarray(float(sigma))
    return sigma_models.as_band_sigma(np.asarray(sigma))


def _strip_trainer_keys(kwargs: Dict) -> Dict:
    return {k: v for k, v in kwargs.items() if k not in _TRAINER_ONLY_KEYS}


def build_flow_model(
    *,
    backbone,
    feature_extractor,
    sampling_rate: int,
    sigma_x=0.0,
    sigma_y=0.66,
    flow_matcher: Optional[Dict[str, Any]] = None,
    normalize_mode: str = "noisy",
    error_weighting=None,
    compute_dtype: str = None,
    cast_preprocess: bool = False,
    **trainer_kwargs,
) -> FlowModel:
    _strip_trainer_keys(trainer_kwargs)  # accepted, handled by Trainer
    cfm_sigma = float((flow_matcher or {}).get("sigma", 0.0))
    return FlowModel(
        backbone=backbone,
        feature_extractor=feature_extractor,
        sampling_rate=sampling_rate,
        normalize_mode=normalize_mode,
        compute_dtype=compute_dtype,
        cast_preprocess=cast_preprocess,
        sigma_x=_sigma_array(sigma_x),
        sigma_y=_sigma_array(sigma_y),
        cfm_sigma=cfm_sigma,
        error_weighting=(
            None if error_weighting is None else jnp.asarray(np.asarray(error_weighting))
        ),
    )


def build_score_model(
    *,
    backbone,
    feature_extractor,
    sampling_rate: int,
    sde,
    t_eps: float = 3e-2,
    normalize_mode: str = "noisy",
    compute_dtype: str = None,
    **trainer_kwargs,
) -> ScoreModel:
    return ScoreModel(
        backbone=backbone,
        feature_extractor=feature_extractor,
        sampling_rate=sampling_rate,
        normalize_mode=normalize_mode,
        compute_dtype=compute_dtype,
        sde=sde,
        t_eps=t_eps,
    )


def build_regression_model(
    *,
    backbone,
    feature_extractor,
    sampling_rate: int,
    loss_type: str = "l2",
    normalize_mode: str = "noisy",
    compute_dtype: str = None,
    **trainer_kwargs,
) -> RegressionModel:
    return RegressionModel(
        backbone=backbone,
        feature_extractor=feature_extractor,
        sampling_rate=sampling_rate,
        normalize_mode=normalize_mode,
        compute_dtype=compute_dtype,
        loss_type=loss_type,
    )
