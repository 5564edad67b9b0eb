"""PyTorch-checkpoint → flowdec_tpu weight conversion.

Enables users of the reference to bring their trained FlowDec/ScoreDec/
regression checkpoints (PyTorch Lightning .ckpt, incl. the released
FlowDec-25s/75m zips) to this framework.

The reference NCSNpp stores all layers in one flat nn.ModuleList walked by a
manual index (ncsnpp.py:102-252: `all_modules.{idx}.*` keys). This module
re-derives that index layout from the backbone config (the construction order
is a pure function of the config) and maps every torch tensor onto our
structured Flax parameter tree with the appropriate layout transforms:

    Conv2d  weight (O, I, kH, kW)  →  kernel (kH, kW, I, O)
    Linear  weight (O, I)          →  kernel (I, O)
    GroupNorm weight/bias          →  scale/bias
    NIN W (I, O), b                →  identical
    GaussianFourier W              →  identical

Usage (one call for a full Lightning .ckpt — the released checkpoints):
    from flowdec_tpu.convert import load_torch_checkpoint
    model, params, config = load_torch_checkpoint("step=800000.ckpt", ema=True)
    x_hat = model.enhance(params, jax.random.PRNGKey(0), y, n_steps=3,
                          solver="midpoint")

Lower-level (a bare state dict + a config you already have):
    from flowdec_tpu.convert import convert_ncsnpp_state_dict
    params = convert_ncsnpp_state_dict(torch_state_dict, backbone_config)
    # torch_state_dict: e.g. ckpt["_pl_ema_state_dict"] with "backbone." keys

(torch is only needed for the one-time conversion.)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from flowdec_tpu.nn.ncsnpp import NCSNppConfig

__all__ = [
    "reference_module_layout",
    "convert_ncsnpp_state_dict",
    "expected_torch_keys",
    "convert_dac_state_dict",
    "expected_dac_torch_keys",
    "backbone_config_from_reference",
    "load_torch_checkpoint",
]


def reference_module_layout(cfg: NCSNppConfig) -> List[Tuple[str, str]]:
    """Reproduce the reference's flat-ModuleList construction order.

    Returns a list of (kind, our_scope) where list position == torch module
    index in `all_modules`. Kinds: fourier, linear, conv, resblock, attn,
    combine, resample (Up/Downsample module), groupnorm.
    """
    layout: List[Tuple[str, str]] = []
    num_res = len(cfg.ch_mult)

    # time embedding
    if cfg.embedding_type == "fourier":
        layout.append(("fourier", "fourier_proj"))
    if cfg.conditional:
        layout.append(("linear", "temb_dense_0"))
        layout.append(("linear", "temb_dense_1"))

    # input conv
    layout.append(("conv", "conv_in"))

    all_res = [cfg.image_size // (2**i) for i in range(num_res)]

    # down path
    for i_level in range(num_res):
        for i_block in range(cfg.num_res_blocks):
            layout.append(("resblock", f"down_{i_level}_block_{i_block}"))
            if all_res[i_level] in cfg.attn_resolutions:
                layout.append(("attn", f"down_{i_level}_attn_{i_block}"))
        if i_level != num_res - 1:
            if cfg.resblock_type == "ddpm":
                layout.append(("resample", f"down_{i_level}_downsample"))
            else:
                layout.append(("resblock", f"down_{i_level}_downsample"))
            if cfg.progressive_input == "input_skip":
                layout.append(("combine", f"down_{i_level}_combine"))
            elif cfg.progressive_input == "residual":
                layout.append(("resample", f"down_{i_level}_pyramid_downsample"))

    # bottleneck
    layout.append(("resblock", "mid_block_0"))
    if cfg.bottleneck_attn:
        layout.append(("attn", "mid_attn"))
    layout.append(("resblock", "mid_block_1"))

    # up path
    for i_level in reversed(range(num_res)):
        for i_block in range(cfg.num_res_blocks + 1):
            layout.append(("resblock", f"up_{i_level}_block_{i_block}"))
        if all_res[i_level] in cfg.attn_resolutions:
            layout.append(("attn", f"up_{i_level}_attn"))
        if cfg.progressive != "none":
            if i_level == num_res - 1 or cfg.progressive == "output_skip":
                layout.append(("groupnorm", f"up_{i_level}_pyramid_norm"))
                layout.append(("conv", f"up_{i_level}_pyramid_conv"))
            else:  # residual, later levels: conv-upsample module
                layout.append(("resample", f"up_{i_level}_pyramid_upsample"))
        if i_level != 0:
            if cfg.resblock_type == "ddpm":
                layout.append(("resample", f"up_{i_level}_upsample"))
            else:
                layout.append(("resblock", f"up_{i_level}_upsample"))

    if cfg.progressive != "output_skip":
        layout.append(("groupnorm", "norm_out"))
        layout.append(("conv", "conv_out"))
    return layout


def _conv_t(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO


def _put(out: Dict, scope: str, rest: str, value: np.ndarray) -> None:
    path = tuple(scope.split("/")) + tuple(rest.split("/"))
    out[path] = value


def _map_module(
    kind: str,
    scope: str,
    sub: Dict[str, np.ndarray],
    cfg: NCSNppConfig,
    out: Dict,
) -> None:
    if kind == "fourier":
        _put(out, scope, "W", sub["W"])
    elif kind == "linear":
        _put(out, scope, "kernel", sub["weight"].T)
        _put(out, scope, "bias", sub["bias"])
    elif kind == "conv":
        _put(out, scope, "Conv_0/kernel", _conv_t(sub["weight"]))
        if "bias" in sub:
            _put(out, scope, "Conv_0/bias", sub["bias"])
    elif kind == "groupnorm":
        _put(out, scope, "scale", sub["weight"])
        _put(out, scope, "bias", sub["bias"])
    elif kind == "combine":
        _put(out, scope, "Conv_0/Conv_0/kernel", _conv_t(sub["Conv_0.weight"]))
        _put(out, scope, "Conv_0/Conv_0/bias", sub["Conv_0.bias"])
    elif kind == "attn":
        _put(out, scope, "GroupNorm_0/scale", sub["GroupNorm_0.weight"])
        _put(out, scope, "GroupNorm_0/bias", sub["GroupNorm_0.bias"])
        for i in range(4):
            _put(out, scope, f"NIN_{i}/W", sub[f"NIN_{i}.W"])
            _put(out, scope, f"NIN_{i}/b", sub[f"NIN_{i}.b"])
    elif kind == "resblock":
        _put(out, scope, "GroupNorm_0/scale", sub["GroupNorm_0.weight"])
        _put(out, scope, "GroupNorm_0/bias", sub["GroupNorm_0.bias"])
        _put(out, scope, "Conv_0/Conv_0/kernel", _conv_t(sub["Conv_0.weight"]))
        _put(out, scope, "Conv_0/Conv_0/bias", sub["Conv_0.bias"])
        if "Dense_0.weight" in sub:
            _put(out, scope, "Dense_0/Dense_0/kernel", sub["Dense_0.weight"].T)
            _put(out, scope, "Dense_0/Dense_0/bias", sub["Dense_0.bias"])
        _put(out, scope, "GroupNorm_1/scale", sub["GroupNorm_1.weight"])
        _put(out, scope, "GroupNorm_1/bias", sub["GroupNorm_1.bias"])
        _put(out, scope, "Conv_1/Conv_0/kernel", _conv_t(sub["Conv_1.weight"]))
        _put(out, scope, "Conv_1/Conv_0/bias", sub["Conv_1.bias"])
        if "Conv_2.weight" in sub:  # biggan 1×1 shortcut
            _put(out, scope, "Conv_2/Conv_0/kernel", _conv_t(sub["Conv_2.weight"]))
            _put(out, scope, "Conv_2/Conv_0/bias", sub["Conv_2.bias"])
        if "NIN_0.W" in sub:  # ddpm NIN shortcut
            _put(out, scope, "NIN_0/W", sub["NIN_0.W"])
            _put(out, scope, "NIN_0/b", sub["NIN_0.b"])
    elif kind == "resample":
        if "Conv2d_0.weight" in sub:  # FIR fused conv → raw weight/bias params
            _put(out, scope, "weight", _conv_t(sub["Conv2d_0.weight"]))
            _put(out, scope, "bias", sub["Conv2d_0.bias"])
        elif "Conv_0.weight" in sub:  # non-FIR conv path
            _put(out, scope, "Conv_0/Conv_0/kernel", _conv_t(sub["Conv_0.weight"]))
            _put(out, scope, "Conv_0/Conv_0/bias", sub["Conv_0.bias"])
        # no-conv resampling has no params
    else:
        raise ValueError(f"Unknown module kind {kind}")


def convert_ncsnpp_state_dict(
    state_dict: Dict[str, Any],
    cfg: NCSNppConfig,
    prefix: str = "backbone.",
) -> Dict[str, Any]:
    """torch state dict (tensors or ndarrays) → Flax {'params': ...} tree."""
    import flax

    sd: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        sd[k[len(prefix):]] = arr

    layout = reference_module_layout(cfg)

    # group torch keys per module index
    per_module: Dict[int, Dict[str, np.ndarray]] = {}
    extras: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("all_modules."):
            idx_str, _, rest = k[len("all_modules."):].partition(".")
            per_module.setdefault(int(idx_str), {})[rest] = v
        else:
            extras[k] = v

    max_idx = max(per_module) if per_module else -1
    if max_idx + 1 != len(layout):
        raise ValueError(
            f"Torch checkpoint has {max_idx + 1} modules but the config "
            f"implies {len(layout)} — config/checkpoint mismatch?"
        )

    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for idx, (kind, scope) in enumerate(layout):
        sub = per_module.get(idx, {})
        if not sub:
            continue  # parameter-free module (e.g. no-conv resample)
        _map_module(kind, scope, sub, cfg, out)

    # top-level output layer (reference self.output_layer, ncsnpp.py:100)
    if "output_layer.weight" in extras:
        out[("output_layer", "kernel")] = _conv_t(extras["output_layer.weight"])
    if "output_layer.bias" in extras:
        out[("output_layer", "bias")] = extras["output_layer.bias"]

    return {"params": flax.traverse_util.unflatten_dict(out)}


def expected_torch_keys(cfg: NCSNppConfig) -> List[str]:
    """The `all_modules.*` key skeleton a reference checkpoint should carry
    (modulo parameter-free modules) — used by tests and for debugging
    mismatched configs."""
    names = []
    for idx, (kind, _scope) in enumerate(reference_module_layout(cfg)):
        base = f"all_modules.{idx}"
        if kind == "fourier":
            names.append(f"{base}.W")
        elif kind == "linear":
            names += [f"{base}.weight", f"{base}.bias"]
        elif kind == "conv":
            names += [f"{base}.weight", f"{base}.bias"]
        elif kind == "groupnorm":
            names += [f"{base}.weight", f"{base}.bias"]
        elif kind == "combine":
            names += [f"{base}.Conv_0.weight", f"{base}.Conv_0.bias"]
        elif kind == "attn":
            names += [f"{base}.GroupNorm_0.weight", f"{base}.GroupNorm_0.bias"]
            names += [f"{base}.NIN_{i}.{p}" for i in range(4) for p in ("W", "b")]
        elif kind == "resblock":
            names += [
                f"{base}.GroupNorm_0.weight", f"{base}.GroupNorm_0.bias",
                f"{base}.Conv_0.weight", f"{base}.Conv_0.bias",
                f"{base}.Dense_0.weight", f"{base}.Dense_0.bias",
                f"{base}.GroupNorm_1.weight", f"{base}.GroupNorm_1.bias",
                f"{base}.Conv_1.weight", f"{base}.Conv_1.bias",
            ]
        elif kind == "resample":
            names += [f"{base}.Conv2d_0.weight", f"{base}.Conv2d_0.bias"]
    return names


# ---------------------------------------------------------------------------
# DAC (descript-audio-codec 1.0.0) → NDAC
# ---------------------------------------------------------------------------

def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Fold torch weight_norm (dim=0): w = g · v / ‖v‖ with the norm over all
    dims except 0 (per output channel for Conv1d, per INPUT channel for
    ConvTranspose1d — torch's default dim=0 either way)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(np.square(v.astype(np.float64)), axis=axes, keepdims=True))
    return np.asarray(g * v / norm, dtype=np.float32)


def convert_dac_state_dict(state_dict: Dict[str, Any], config) -> Dict[str, Any]:
    """torch DAC/NDAC state dict → Flax params for codec.ndac.NDAC.

    FlowDec's underlying codecs (NDAC-25/75) are retrained
    descript-audio-codec models consumed as torch checkpoints
    (requirements.txt pins descript-audio-codec==1.0.0; demo.ipynb cell 3
    loads them via dac.DAC). DAC 1.0.0's module tree is:

        encoder.block.0                    WNConv1d(1, d, 7)
        encoder.block.{1..R}.block.{0..2}  ResidualUnit(snake, dil-conv7,
                                           snake, conv1) at dilations 1/3/9
        encoder.block.{1..R}.block.3       Snake1d
        encoder.block.{1..R}.block.4       WNConv1d(d/2, d, 2s, stride s)
        encoder.block.{R+1}                Snake1d
        encoder.block.{R+2}                WNConv1d(d_model, latent, 3)
        quantizer.quantizers.{i}.in_proj   WNConv1d(latent, cb_dim, 1)
        quantizer.quantizers.{i}.codebook  nn.Embedding(cb_size, cb_dim)
        quantizer.quantizers.{i}.out_proj  WNConv1d(cb_dim, latent, 1)
        decoder.model.0                    WNConv1d(latent, dec_dim, 7)
        decoder.model.{1..R}.block.0       Snake1d
        decoder.model.{1..R}.block.1       WNConvTranspose1d(d, d/2, 2s, s)
        decoder.model.{1..R}.block.{2..4}  ResidualUnit at dilations 1/3/9
        decoder.model.{R+1}                Snake1d
        decoder.model.{R+2}                WNConv1d(ch, 1, 7)

    Layout transforms: Conv1d (O, I, K) → (K, I, O); ConvTranspose1d
    (I, O, K) → (K, I, O) with SPATIAL FLIP (torch's transposed conv
    convolves, flax's cross-correlates — verified numerically in tests);
    Snake alpha (1, C, 1) → (C,); weight norm folded via
    :func:`_fold_weight_norm`; Embedding weight kept (cb_size, cb_dim).

    `config` is a codec.ndac.NDACConfig describing the checkpoint geometry.
    """
    import flax

    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    out: Dict[Tuple[str, ...], np.ndarray] = {}

    def conv(tkey: str, *scope: str) -> None:
        w = _fold_weight_norm(sd[f"{tkey}.weight_g"], sd[f"{tkey}.weight_v"])
        out[scope + ("kernel",)] = np.transpose(w, (2, 1, 0))
        out[scope + ("bias",)] = sd[f"{tkey}.bias"]

    def conv_t(tkey: str, *scope: str) -> None:
        w = _fold_weight_norm(sd[f"{tkey}.weight_g"], sd[f"{tkey}.weight_v"])
        out[scope + ("kernel",)] = np.transpose(w, (2, 0, 1))[::-1].copy()
        out[scope + ("bias",)] = sd[f"{tkey}.bias"]

    def snake_alpha(tkey: str, *scope: str) -> None:
        out[scope + ("alpha",)] = sd[f"{tkey}.alpha"].reshape(-1)

    def res_unit(tbase: str, *scope: str) -> None:
        snake_alpha(f"{tbase}.block.0", *scope, "snake_0")
        conv(f"{tbase}.block.1", *scope, "conv_0")
        snake_alpha(f"{tbase}.block.2", *scope, "snake_1")
        conv(f"{tbase}.block.3", *scope, "conv_1")

    n_rates = len(config.encoder_rates)

    # encoder
    conv("encoder.block.0", "encoder", "conv_in")
    for i in range(n_rates):
        t = f"encoder.block.{i + 1}"
        s = ("encoder", f"block_{i}")
        for j in range(3):
            res_unit(f"{t}.block.{j}", *s, f"res_{j}")
        snake_alpha(f"{t}.block.3", *s, "snake_out")
        conv(f"{t}.block.4", *s, "down_conv")
    snake_alpha(f"encoder.block.{n_rates + 1}", "encoder", "snake_out")
    conv(f"encoder.block.{n_rates + 2}", "encoder", "conv_out")

    # quantizer
    for i in range(config.n_codebooks):
        t = f"quantizer.quantizers.{i}"
        s = ("quantizer", f"vq_{i}")
        conv(f"{t}.in_proj", *s, "in_proj")
        conv(f"{t}.out_proj", *s, "out_proj")
        out[s + ("codebook",)] = sd[f"{t}.codebook.weight"]

    # decoder
    conv("decoder.model.0", "decoder", "conv_in")
    for i in range(n_rates):
        t = f"decoder.model.{i + 1}"
        s = ("decoder", f"block_{i}")
        snake_alpha(f"{t}.block.0", *s, "snake_in")
        conv_t(f"{t}.block.1", *s, "up_conv")
        for j in range(3):
            res_unit(f"{t}.block.{j + 2}", *s, f"res_{j}")
    snake_alpha(f"decoder.model.{n_rates + 1}", "decoder", "snake_out")
    conv(f"decoder.model.{n_rates + 2}", "decoder", "conv_out")

    return {"params": flax.traverse_util.unflatten_dict(out)}


def expected_dac_torch_keys(config) -> List[str]:
    """Key skeleton of a DAC 1.0.0 checkpoint for the given geometry."""
    names: List[str] = []

    def wn(base: str) -> List[str]:
        return [f"{base}.weight_g", f"{base}.weight_v", f"{base}.bias"]

    def res(base: str) -> List[str]:
        return ([f"{base}.block.0.alpha"] + wn(f"{base}.block.1")
                + [f"{base}.block.2.alpha"] + wn(f"{base}.block.3"))

    n_rates = len(config.encoder_rates)
    names += wn("encoder.block.0")
    for i in range(n_rates):
        t = f"encoder.block.{i + 1}"
        for j in range(3):
            names += res(f"{t}.block.{j}")
        names += [f"{t}.block.3.alpha"] + wn(f"{t}.block.4")
    names += [f"encoder.block.{n_rates + 1}.alpha"]
    names += wn(f"encoder.block.{n_rates + 2}")
    for i in range(config.n_codebooks):
        t = f"quantizer.quantizers.{i}"
        names += wn(f"{t}.in_proj") + wn(f"{t}.out_proj") + [f"{t}.codebook.weight"]
    names += wn("decoder.model.0")
    for i in range(n_rates):
        t = f"decoder.model.{i + 1}"
        names += [f"{t}.block.0.alpha"] + wn(f"{t}.block.1")
        for j in range(3):
            names += res(f"{t}.block.{j + 2}")
    names += [f"decoder.model.{n_rates + 1}.alpha"]
    names += wn(f"decoder.model.{n_rates + 2}")
    return names


# ---------------------------------------------------------------------------
# First-class Lightning .ckpt import (the demo.ipynb cell-2/3 recipe, one call)
# ---------------------------------------------------------------------------

def _plain(obj):
    """OmegaConf containers / Lightning AttributeDicts → plain dict/list."""
    try:
        import omegaconf

        if isinstance(obj, (omegaconf.DictConfig, omegaconf.ListConfig)):
            obj = omegaconf.OmegaConf.to_container(obj, resolve=True)
    except ImportError:
        pass
    if isinstance(obj, dict) or type(obj).__name__ == "AttributeDict":
        return {k: _plain(v) for k, v in dict(obj).items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def backbone_config_from_reference(bb: Dict[str, Any]) -> NCSNppConfig:
    """Reference NCSNpp ctor kwargs (a resolved `model.backbone` config node,
    e.g. config/model/backbone/ncsnpp_final_no_attn.yaml) → NCSNppConfig."""
    bb = dict(bb)
    bb.pop("_target_", None)
    okw = dict(bb.pop("output_layer_kwargs", None) or {})
    defaults = NCSNppConfig()
    kw = {}
    for field in (
        "nonlinearity", "nf", "num_res_blocks", "resamp_with_conv",
        "conditional", "fir", "skip_rescale", "resblock_type", "progressive",
        "progressive_input", "progressive_combine", "init_scale",
        "image_size", "embedding_type", "dropout", "num_channels",
        "bottleneck_attn",
    ):
        if field in bb:
            kw[field] = bb[field]
    if "ch_mult" in bb:
        kw["ch_mult"] = tuple(bb["ch_mult"])
    if "attn_resolutions" in bb:
        kw["attn_resolutions"] = tuple(bb["attn_resolutions"])
    if "fir_kernel" in bb:
        kw["fir_kernel"] = tuple(float(v) for v in bb["fir_kernel"])
    if "fourier_scale" in bb:
        kw["fourier_scale"] = float(bb["fourier_scale"])
    kw["output_kernel_size"] = okw.get("kernel_size", defaults.output_kernel_size)
    kw["output_bias"] = okw.get("bias", defaults.output_bias)
    return NCSNppConfig(**kw)


def _sde_from_reference(sde_cfg: Dict[str, Any]):
    from flowdec_tpu.flow import sdes as my_sdes

    sde_cfg = dict(sde_cfg)
    target = sde_cfg.pop("_target_", "flowdec.sdes.OUVESDE")
    cls = getattr(my_sdes, target.rsplit(".", 1)[-1])
    return cls(**sde_cfg)


def load_torch_checkpoint(
    path: str,
    *,
    ema: bool = True,
    compute_dtype=None,
):
    """One-call import of a reference PyTorch Lightning checkpoint.

    Parses `ckpt['hyper_parameters']` (the full resolved Hydra config the
    reference stores via save_hyperparameters — model.py:119, marshalled in
    util/hydra.py:31) into a model config, selects the EMA weights
    (`_pl_ema_state_dict`, written by EMAModelCheckpoint — callbacks/
    ema.py:201-215) or the raw `state_dict`, converts every tensor, and
    returns a ready-to-run triple.

    This replaces the reference's two working-but-manual recipes: the
    demo-notebook path (hydra compose + instantiate + load_state_dict,
    demo.ipynb cell 2) and the broken `enhance.py --ema` path (the custom
    load_from_checkpoint impl is commented out at reference model.py:352-385,
    so `ema=True` was silently ignored — see SURVEY §"quirks").

    Returns:
        (model, params, config) — model is a FlowModel/ScoreModel/
        RegressionModel per the checkpoint's `model._target_`; params is the
        Flax variables tree (including the learnable STFT window when the
        checkpoint carries one); config is the checkpoint's full resolved
        config as a plain dict.
    """
    import torch

    from flowdec_tpu.models import (
        AmplitudeCompressedComplexSTFT,
        FlowModel,
        RegressionModel,
        ScoreModel,
    )
    from flowdec_tpu.models.sigma import as_band_sigma
    from flowdec_tpu.nn import NCSNpp

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = _plain(ckpt.get("hyper_parameters") or {})
    if "model" not in cfg:
        raise ValueError(
            f"{path} has no hyper_parameters.model config — it was saved "
            "without full_config (reference model.py:101 warns about this); "
            "build the model from its experiment YAML and use "
            "convert_ncsnpp_state_dict directly."
        )
    mcfg = cfg["model"]

    sd_key = "_pl_ema_state_dict" if ema else "state_dict"
    if sd_key not in ckpt:
        raise KeyError(
            f"{path} has no '{sd_key}' (available: {sorted(ckpt)}); "
            + ("it was saved without the EMA callback — retry with ema=False"
               if ema else "not a Lightning checkpoint?")
        )
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in ckpt[sd_key].items()
    }

    # feature extractor: reference kwargs map 1:1 onto ours
    fe_kw = dict(mcfg["feature_extractor"])
    fe_kw.pop("_target_", None)
    feature_extractor = AmplitudeCompressedComplexSTFT(**fe_kw)

    backbone_cfg = backbone_config_from_reference(mcfg["backbone"])
    backbone = NCSNpp(backbone_cfg)

    def _sigma(name: str):
        # sigma_x/sigma_y are non-trainable nn.Parameters in the reference
        # state dict (model.py:408-419) — the checkpoint itself is the source
        # of truth (the config may point at a from_file .npy that no longer
        # exists on this machine)
        if name in sd:
            return as_band_sigma(np.squeeze(sd[name]))
        val = mcfg.get(name)
        if isinstance(val, (int, float)):
            return as_band_sigma(float(val))
        raise ValueError(
            f"{name} is neither in the state dict nor a config scalar"
        )

    target = str(mcfg.get("_target_", "flowdec.model.FlowModel"))
    family = target.rsplit(".", 1)[-1]
    common = dict(
        backbone=backbone,
        feature_extractor=feature_extractor,
        sampling_rate=int(mcfg.get("sampling_rate",
                                   cfg.get("sampling_rate", 48000))),
        normalize_mode=mcfg.get("normalize_mode", "noisy"),
        compute_dtype=compute_dtype,
    )
    if family == "FlowModel":
        model = FlowModel(
            sigma_x=_sigma("sigma_x"),
            sigma_y=_sigma("sigma_y"),
            cfm_sigma=float((mcfg.get("flow_matcher") or {}).get("sigma", 0.0)),
            **common,
        )
    elif family == "ScoreModel":
        model = ScoreModel(
            sde=_sde_from_reference(mcfg.get("sde") or {}),
            t_eps=float(mcfg.get("t_eps", 3e-2)),
            **common,
        )
    elif family == "RegressionModel":
        model = RegressionModel(**common)
    else:
        raise ValueError(f"Unknown model family {target!r}")

    params = convert_ncsnpp_state_dict(sd, backbone_cfg)
    win_key = "feature_extractor.complex_stft.window"
    if getattr(feature_extractor, "learnable_window", False):
        if win_key not in sd:
            raise KeyError(
                f"learnable_window=True but {win_key!r} missing from {sd_key}"
            )
        params["params"]["stft_window"] = np.asarray(sd[win_key], np.float32)
    return model, params, cfg
