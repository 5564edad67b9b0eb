"""Config composition/instantiation tests: the 8 shipped experiment configs
must compose and instantiate into real model objects."""

import numpy as np
import pytest

from flowdec_tpu.models import FlowModel, RegressionModel, ScoreModel
from flowdec_tpu.train.config import apply_overrides, instantiate, load_config

ALL_EXPERIMENTS = [
    ("flowdec_75m", FlowModel),
    ("flowdec_25s", FlowModel),
    ("flowdec_75m_globsigy", FlowModel),
    ("flowdec_25s_globsigy", FlowModel),
    ("flowdec_75s", FlowModel),
    ("flowdec_75s_globsigy", FlowModel),
    ("baseline_scoredec_75s", ScoreModel),
    ("baseline_regression_75s", RegressionModel),
    ("ablation_higheralpha_75s", FlowModel),
    ("ablation_higheralpha_75s_globsigy", FlowModel),
    ("ablation_nocqt_nowav_75s", FlowModel),
]


def test_compose_flowdec_75m():
    cfg = load_config("flowdec_75m")
    assert cfg["sampling_rate"] == 48000
    assert cfg["model"]["feature_extractor"]["n_fft"] == 1534
    assert cfg["model"]["feature_extractor"]["alpha"] == 0.3
    # experiment overrides group default beta=0.5 → 0.33
    assert cfg["model"]["feature_extractor"]["beta"] == 0.33
    # interpolation resolved
    assert cfg["model"]["feature_extractor"]["sampling_rate"] == 48000
    assert cfg["model"]["backbone"]["nf"] == 64
    assert cfg["model"]["backbone"]["ch_mult"] == [4, 4, 4, 2]
    # eval variants overridden to midpoint 6/25
    assert cfg["model"]["eval_variants"][0]["enhance_kwargs"]["solver"] == "midpoint"
    assert cfg["datamodule"]["batch_size"] == 8
    assert cfg["trainer_options"]["max_steps"] == 1000000


def test_overrides():
    cfg = load_config("flowdec_75m", overrides=["model.lr=2e-4", "datamodule.batch_size=4"])
    assert cfg["model"]["lr"] == 2e-4
    assert cfg["datamodule"]["batch_size"] == 4


@pytest.mark.parametrize("name,cls", ALL_EXPERIMENTS)
def test_instantiate_all_experiments(name, cls):
    cfg = load_config(name)
    model = instantiate(cfg["model"])
    assert isinstance(model, cls)
    assert model.sampling_rate == 48000
    assert model.feature_extractor.n_bins == 768
    assert model.backbone.config.image_size == 768


def test_per_band_sigma_instantiation():
    cfg = load_config("flowdec_75m")
    model = instantiate(cfg["model"])
    assert model.sigma_y.shape == (768, 1, 1)
    assert 0.1 < float(model.sigma_y.min()) < float(model.sigma_y.max()) < 0.7


def test_globsigy_scalar():
    cfg = load_config("flowdec_75m_globsigy")
    model = instantiate(cfg["model"])
    assert model.sigma_y.shape == ()
    assert abs(float(model.sigma_y) - 0.66) < 1e-6


def test_score_model_sde():
    cfg = load_config("baseline_scoredec_75s")
    model = instantiate(cfg["model"])
    assert model.sde.sigma_max == 0.82
    assert model.t_eps == 0.03


def test_optimizer_partial():
    cfg = load_config("flowdec_75m")
    factory = instantiate(cfg["optimizer"])
    opt = factory(learning_rate=1e-4)
    assert hasattr(opt, "init") and hasattr(opt, "update")


def test_all_model_defaults_composes():
    """The reference's all_model_defaults references missing files
    (SURVEY.md §5 latent config debt); ours must compose standalone."""
    import os

    from flowdec_tpu.train.config import DEFAULT_CONFIG_DIR, _compose

    cfg = _compose(
        os.path.join(DEFAULT_CONFIG_DIR, "model", "all_model_defaults.yaml"),
        DEFAULT_CONFIG_DIR,
    )
    assert "eval_variants" in cfg and "eval_metrics" in cfg


def test_yaml12_scientific_notation_floats():
    """PyYAML is YAML 1.1 where `1e-4` is a STRING; our loader must resolve
    YAML 1.2 floats (the shipped configs write lr: 1e-4, eps: 1e-8 — a
    string eps crashed Adam's update in the first real campaign)."""
    import tempfile, os
    from flowdec_tpu.train.config import _load_yaml

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.yaml")
        with open(p, "w") as f:
            f.write("a: 1e-4\nb: 1.5e+3\nc: 2e8\nd: keep1e-4me\ne: 1.0e-8\n")
        d = _load_yaml(p)
    assert d["a"] == 1e-4 and isinstance(d["a"], float)
    assert d["b"] == 1500.0 and d["c"] == 2e8
    assert d["d"] == "keep1e-4me"
    assert d["e"] == 1e-8


def test_builder_compute_dtype_passthrough():
    """model.compute_dtype=bfloat16 must reach the model pytree through the
    builders (bf16 batch-2 TRAINING compiles on this runtime — PERF.md r2
    compile-helper bisection — so the knob has to be config-reachable)."""
    import jax

    from flowdec_tpu.models import AmplitudeCompressedComplexSTFT
    from flowdec_tpu.nn import NCSNpp, NCSNppConfig
    from flowdec_tpu.train.builders import build_flow_model

    model = build_flow_model(
        backbone=NCSNpp(NCSNppConfig(nf=16, ch_mult=(1, 2), num_res_blocks=1,
                                     attn_resolutions=(), image_size=64,
                                     bottleneck_attn=False)),
        feature_extractor=AmplitudeCompressedComplexSTFT(
            n_fft=126, n_hops=4, sampling_rate=8000, alpha=0.3, beta=0.33),
        sampling_rate=8000,
        compute_dtype="bfloat16",
    )
    assert model.compute_dtype == "bfloat16"
    import jax.numpy as jnp
    import numpy as np

    params = model.init_params(jax.random.PRNGKey(0), frames=64)
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.standard_normal((1, 8000)) * 0.1, jnp.float32),
             jnp.asarray(rng.standard_normal((1, 8000)) * 0.1, jnp.float32))
    loss, aux = model.loss(params, jax.random.PRNGKey(1), batch, train=False)
    assert np.isfinite(float(loss))

    # the TRAINING graph must actually run the backbone in bf16 (round-2's
    # knob set the field but the loss path never cast — the "bf16 training"
    # measurements were silently f32): lowered HLO of the grad must contain
    # bf16 convolutions and gradients must come back finite f32
    lowered = jax.jit(jax.grad(
        lambda p: model.loss(p, jax.random.PRNGKey(1), batch, train=False)[0]
    )).lower(params)
    txt = lowered.as_text()
    assert "bf16" in txt and "convolution" in txt
    import re

    conv_lines = [ln for ln in txt.splitlines() if "convolution(" in ln]
    bf16_convs = [ln for ln in conv_lines if "bf16" in ln]
    assert conv_lines and len(bf16_convs) >= 0.9 * len(conv_lines), (
        f"{len(bf16_convs)}/{len(conv_lines)} convs lowered to bf16"
    )
    grads = jax.grad(
        lambda p: model.loss(p, jax.random.PRNGKey(1), batch, train=False)[0]
    )(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
