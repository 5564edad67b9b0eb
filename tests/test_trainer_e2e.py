"""End-to-end training slice: config → model → Trainer.fit on synthesized

WAVs → checkpoints → resume → config-free reload → enhance.

This is the integration test the reference never had (it only ran under
Lightning on a real cluster)."""

import json
import os

import jax
import numpy as np
import pytest

from flowdec_tpu.data import PairedAudioDataModule, write_wav
from flowdec_tpu.eval.metrics import SISXR
from flowdec_tpu.models import AmplitudeCompressedComplexSTFT, FlowModel
from flowdec_tpu.nn import NCSNpp, NCSNppConfig
from flowdec_tpu.serving import StreamingEnhancer
from flowdec_tpu.train.checkpoints import CheckpointManager, load_model
from flowdec_tpu.train.logging import JsonlLogger
from flowdec_tpu.train.state import make_optimizer
from flowdec_tpu.train.trainer import Trainer, enhance_bucketed

pytestmark = pytest.mark.slow  # full e2e / compile-heavy: nightly tier

SR = 8000


@pytest.fixture(scope="module")
def pairs_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_data")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        n = int(SR * (1.0 + 0.3 * i))
        x = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n) / SR)).astype(np.float32)
        y = x + 0.02 * rng.standard_normal(n).astype(np.float32)
        cp = str(root / f"speech_clean_{i}.wav")
        yp = str(root / f"speech_coded_{i}.wav")
        write_wav(cp, x, SR)
        write_wav(yp, y, SR)
        lines.append(f"{cp},{yp}\n")
    pf = root / "pairs.txt"
    pf.write_text("".join(lines))
    return str(pf)


def _tiny_model():
    return FlowModel(
        backbone=NCSNpp(
            NCSNppConfig(
                nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
                bottleneck_attn=False, image_size=64,
                output_kernel_size=1, output_bias=False,
            )
        ),
        feature_extractor=AmplitudeCompressedComplexSTFT(
            n_fft=126, sampling_rate=SR, alpha=0.3, beta=0.33, n_hops=4
        ),
        sampling_rate=SR,
    )


def test_full_training_slice(pairs_file, tmp_path):
    model = _tiny_model()
    dm = PairedAudioDataModule(
        sampling_rate=SR, target_duration=2, batch_size=2, num_workers=2,
        mode="paired_filelist", train_x=pairs_file, valid_x=pairs_file,
        test_x=pairs_file,
    )
    optimizer = make_optimizer(learning_rate=1e-3)
    ckpt_dir = str(tmp_path / "ckpts")
    ckpt = CheckpointManager(
        ckpt_dir, last_every_n_steps=3, snapshot_every_n_steps=6,
        config={"model": {"note": "test"}},
    )
    logger = JsonlLogger(str(tmp_path / "runs"), "testrun")

    trainer = Trainer(
        model, dm, optimizer,
        max_steps=6, log_every_n_steps=2, val_every_n_steps=3,
        num_sanity_val_steps=1,
        eval_variants=[{"name": "N1", "every_n_steps": 3,
                        "enhance_kwargs": {"n_steps": 1, "solver": "euler"}}],
        eval_metrics=[lambda: SISXR(SR)],
        num_eval_files=2, evaluation_seed=0,
        logger=logger, checkpoint_manager=ckpt,
        mesh=None, crop_frames=64,
    )
    state = trainer.fit()
    assert int(state.step) == 6
    ckpt.wait()

    # metrics were logged
    metrics_lines = [
        json.loads(line)
        for line in open(os.path.join(logger.run_dir, "metrics.jsonl"))
    ]
    keys = {k for rec in metrics_lines for k in rec}
    assert "train_loss" in keys
    assert "valid_loss" in keys
    assert any(k.startswith("sisdr") for k in keys), keys

    # audio dumps exist
    audio_root = os.path.join(logger.run_dir, "audios")
    assert os.path.isdir(audio_root)

    # resume picks up at step 6 and continues to 8
    trainer2 = Trainer(
        model, dm, optimizer,
        max_steps=8, log_every_n_steps=2, val_every_n_steps=0,
        num_sanity_val_steps=0, eval_metrics=[], num_eval_files=0,
        logger=None, checkpoint_manager=ckpt, mesh=None, crop_frames=64,
    )
    state2 = trainer2.fit(resume=True)
    assert int(state2.step) == 8
    ckpt.close()


def test_checkpoint_reload_and_enhance(pairs_file, tmp_path):
    """save → load_model(ema=True/False) → weights differ appropriately and
    the reloaded model enhances."""
    import flowdec_tpu.train.builders as B

    cfg = {
        "model": {
            "_target_": "flowdec_tpu.train.builders.build_flow_model",
            "backbone": {
                "_target_": "flowdec_tpu.train.builders.build_backbone",
                "image_size": 64, "nf": 16, "ch_mult": [1, 2],
                "num_res_blocks": 1, "attn_resolutions": [],
                "bottleneck_attn": False,
                "output_layer_kwargs": {"kernel_size": 1, "bias": False},
            },
            "feature_extractor": {
                "_target_": "flowdec_tpu.models.AmplitudeCompressedComplexSTFT",
                "n_fft": 126, "sampling_rate": SR, "alpha": 0.3, "beta": 0.33,
                "n_hops": 4,
            },
            "sampling_rate": SR,
            "sigma_y": 0.5,
        }
    }
    model = _tiny_model()
    dm = PairedAudioDataModule(
        sampling_rate=SR, target_duration=2, batch_size=2, num_workers=2,
        mode="paired_filelist", train_x=pairs_file, valid_x=pairs_file,
        test_x=pairs_file,
    )
    optimizer = make_optimizer(learning_rate=1e-2)
    ckpt_dir = str(tmp_path / "ckpts2")
    ckpt = CheckpointManager(ckpt_dir, last_every_n_steps=4,
                             snapshot_every_n_steps=0, config=cfg)
    trainer = Trainer(
        model, dm, optimizer, max_steps=4, log_every_n_steps=10,
        val_every_n_steps=0, num_sanity_val_steps=0, eval_metrics=[],
        num_eval_files=0, checkpoint_manager=ckpt, mesh=None, crop_frames=64,
        ema_decay=0.5,
    )
    trainer.fit()
    ckpt.wait()
    ckpt.close()

    model_ema, params_ema, _ = load_model(ckpt_dir, ema=True)
    model_raw, params_raw, _ = load_model(ckpt_dir, ema=False)
    # EMA and raw weights must differ after a few steps
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        params_ema, params_raw,
    )
    assert max(jax.tree.leaves(diffs)) > 0

    rng = np.random.default_rng(1)
    y = rng.standard_normal(3500).astype(np.float32) * 0.1
    out = enhance_bucketed(
        model_ema, params_ema, jax.random.PRNGKey(0), y, n_steps=1, solver="euler"
    )
    assert out.shape == y.shape and np.all(np.isfinite(out))


def test_streaming_enhancer_long_file():
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0), frames=64)
    enhancer = StreamingEnhancer(
        model, params, chunk_seconds=1.0, overlap_seconds=0.25,
        enhance_kwargs={"n_steps": 1, "solver": "euler"},
    )
    rng = np.random.default_rng(0)
    y = rng.standard_normal(int(3.3 * SR)).astype(np.float32) * 0.1
    out = enhancer(jax.random.PRNGKey(1), y)
    assert out.shape == y.shape
    assert np.all(np.isfinite(out))


def test_evaluate_model_api():
    """Public evaluate_model API (reference model.py:306-348): DataFrame +
    audio dicts, shape-mismatch files skipped for metrics."""
    from flowdec_tpu.eval import evaluate_model
    from flowdec_tpu.eval.metrics import SISXR

    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0), frames=64)
    rng = np.random.default_rng(0)
    audios = []
    for i, n in enumerate((3000, 4000)):
        x = rng.standard_normal(n).astype(np.float32) * 0.1
        y = (x + 0.01 * rng.standard_normal(n)).astype(np.float32)
        audios.append((x, y, f"speech_{i}.wav"))
    # mismatched pair: skipped for metrics, still enhanced
    audios.append((rng.standard_normal(2000).astype(np.float32),
                   rng.standard_normal(2500).astype(np.float32), "bad.wav"))

    df, outs = evaluate_model(
        model, params, audios, [SISXR(SR)], n_steps=1, solver="euler"
    )
    assert len(df) == 2 and len(outs) == 3
    assert np.isfinite(df["sisdr"]).all()
    assert outs[2]["x_hat"].shape == (2500,)


def test_streaming_matches_single_shot_deterministic():
    """With sigma_fac=0 the ODE is deterministic, so chunked overlap-add
    streaming must match single-shot enhancement away from chunk boundaries
    (conv receptive field + crossfade are the only differences)."""
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0), frames=64)
    rng = np.random.default_rng(0)
    y = (0.3 * np.sin(2 * np.pi * 300 * np.arange(int(2.5 * SR)) / SR)
         + 0.02 * rng.standard_normal(int(2.5 * SR))).astype(np.float32)

    kwargs = dict(n_steps=2, solver="midpoint", sigma_fac=0.0)
    single = enhance_bucketed(model, params, jax.random.PRNGKey(1), y, **kwargs)
    enhancer = StreamingEnhancer(
        model, params, chunk_seconds=1.0, overlap_seconds=0.3, enhance_kwargs=kwargs
    )
    streamed = enhancer(jax.random.PRNGKey(1), y)

    # compare away from the global edges; tolerance covers receptive-field
    # halos at chunk seams and per-chunk normalization differences
    a = single[SR // 2 : -SR // 2]
    b = streamed[SR // 2 : -SR // 2]
    rel = np.mean(np.abs(a - b)) / (np.mean(np.abs(a)) + 1e-9)
    assert rel < 0.15, f"streaming diverges from single-shot: rel={rel}"
