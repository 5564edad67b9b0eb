"""CLI end-to-end smoke tests: train.py → checkpoint → enhance.py.


Exercises the full user surface the reference exposes (train CLI with config
overrides, enhance CLI with RTF/triples outputs) on a tiny geometry.
"""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full e2e / compile-heavy: nightly tier

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowdec_tpu.data.wavio import read_wav, write_wav

SR = 8000


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        n = int(SR * 1.5)
        x = (0.3 * np.sin(2 * np.pi * (220 + 60 * i) * np.arange(n) / SR)).astype(np.float32)
        y = x + 0.02 * rng.standard_normal(n).astype(np.float32)
        cp, yp = str(root / f"speech_c{i}.wav"), str(root / f"speech_y{i}.wav")
        write_wav(cp, x, SR)
        write_wav(yp, y, SR)
        lines.append(f"{cp},{yp}\n")
    (root / "pairs.txt").write_text("".join(lines))

    # tiny experiment config reusing the shipped config groups' shape
    cfg_dir = root / "configs"
    cfg_dir.mkdir()
    (cfg_dir / "tiny.yaml").write_text(f"""
sampling_rate: {SR}
dirs:
  logger_save_dir: {root}/runs/
  checkpoint_dir: {root}/ckpts/
logger:
  _target_: flowdec_tpu.train.logging.JsonlLogger
  _partial_: true
optimizer:
  _target_: flowdec_tpu.train.state.make_optimizer
  _partial_: true
callbacks:
  last_every_n_steps: 2
  snapshot_every_n_steps: 0
model:
  _target_: flowdec_tpu.train.builders.build_flow_model
  lr: 1e-3
  sampling_rate: ${{sampling_rate}}
  sigma_y: 0.5
  num_eval_files: 2
  evaluation_seed: 0
  eval_variants:
    - name: N1
      every_n_steps: 2
      enhance_kwargs: {{n_steps: 1, solver: euler}}
  eval_metrics:
    - _target_: flowdec_tpu.eval.metrics.SISXR
      _partial_: true
      sr: ${{sampling_rate}}
  backbone:
    _target_: flowdec_tpu.train.builders.build_backbone
    image_size: 64
    nf: 16
    ch_mult: [1, 2]
    num_res_blocks: 1
    attn_resolutions: []
    bottleneck_attn: false
    output_layer_kwargs: {{kernel_size: 1, bias: false}}
  feature_extractor:
    _target_: flowdec_tpu.models.AmplitudeCompressedComplexSTFT
    n_fft: 126
    n_hops: 4
    window_fn: hann
    sampling_rate: ${{sampling_rate}}
    alpha: 0.3
    beta: 0.33
datamodule:
  _target_: flowdec_tpu.data.PairedAudioDataModule
  sampling_rate: ${{sampling_rate}}
  batch_size: 2
  target_duration: 1
  num_workers: 2
  mode: paired_filelist
  train_x: {root}/pairs.txt
  valid_x: {root}/pairs.txt
  test_x: {root}/pairs.txt
trainer_options:
  max_steps: 4
  log_every_n_steps: 1
  num_sanity_val_steps: 0
  val_every_n_steps: 0
  ema_decay: 0.9
  mesh: null
""")
    return root


@pytest.fixture(scope="module")
def trained_ckpt(workspace):
    """The cli_test checkpoint, trained on demand — makes every dependent
    test self-contained under isolation/reordering/xdist instead of relying
    on test_train_cli_then_enhance_cli having run first."""
    ckpt_dir = workspace / "ckpts" / "cli_test"
    if not (ckpt_dir / "last").is_dir():
        import train as train_cli

        train_cli.main([
            "--config-name", str(workspace / "configs" / "tiny.yaml"),
            "--run-id", "cli_test",
        ])
    return str(ckpt_dir)


def test_train_cli_then_enhance_cli(workspace, trained_ckpt):
    ckpt_dir = trained_ckpt
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
    metrics_file = workspace / "runs" / "cli_test" / "metrics.jsonl"
    records = [json.loads(line) for line in open(metrics_file)]
    assert any("train_loss" in r for r in records)

    import enhance as enhance_cli

    outdir = str(workspace / "enhanced")
    enhance_cli.main([
        "--ckpt", ckpt_dir,
        "--files", str(workspace / "speech_y0.wav"), str(workspace / "speech_y1.wav"),
        "--outdir", outdir,
        "--N", "1", "--solver", "euler", "--rtf",
    ])
    out0 = os.path.join(outdir, "speech_y0.wav")
    assert os.path.exists(out0)
    wav, sr = read_wav(out0)
    assert sr == SR and wav.shape[-1] == int(SR * 1.5)
    assert os.path.exists(os.path.join(outdir, "triples.txt"))
    rtf_lines = open(os.path.join(outdir, "rtfs.csv")).read().splitlines()
    assert rtf_lines[0] == "path,runtime,filetime,rtf" and len(rtf_lines) == 3


def test_train_cli_resume(workspace, trained_ckpt):
    """Re-running the same command resumes from the last checkpoint."""
    import train as train_cli

    train_cli.main([
        "--config-name", str(workspace / "configs" / "tiny.yaml"),
        "--run-id", "cli_test",  # same run: restores step 4, max_steps 6
        "trainer_options.max_steps=6",
    ])
    from flowdec_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(workspace / "ckpts" / "cli_test"))
    assert mgr.latest_step() == 6
    mgr.close()


def test_evaluate_cli(workspace, tmp_path):
    """Offline evaluation script over an enhance.py triples list."""
    import importlib

    evaluate = importlib.import_module("scripts.evaluate")
    triples = tmp_path / "triples.txt"
    lines = []
    for i in range(2):
        c = workspace / f"speech_c{i}.wav"
        y = workspace / f"speech_y{i}.wav"
        lines.append(f"{c},{y},{y}\n")  # "enhanced" = noisy (smoke)
    triples.write_text("".join(lines))
    out_csv = str(tmp_path / "metrics.csv")
    evaluate.main([
        "--triples", str(triples), "--sr", str(SR),
        "--metrics", "sisxr", "snrseg", "--out", out_csv,
    ])
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert {"sisdr", "sisir", "sisar", "snrseg", "name"} <= set(df.columns)
    assert len(df) == 2
    assert np.isfinite(df["sisdr"]).all()


def test_ab_eval_cli(workspace, trained_ckpt, tmp_path):
    """A/B harness over a paired filelist: coded-input baseline + variants,
    including the optional sigma_fac field (label:ckpt:N:solver:sigma_fac),
    bootstrap CIs and paired per-file deltas."""
    import importlib

    ab_eval = importlib.import_module("scripts.ab_eval")
    ckpt = trained_ckpt
    out = str(tmp_path / "ab.json")
    ab_eval.main([
        "--pairs", str(workspace / "pairs.txt"), "--delim", ",",
        "--sr", str(SR), "--n-boot", "200",
        "--variant", f"v_N1:{ckpt}:1:euler",
        "--variant", f"v_N1_s05:{ckpt}:1:euler:0.5",
        "--out", out,
    ])
    res = json.load(open(out))
    assert res["n_files"] == 4
    for k in ("coded_input", "v_N1", "v_N1_s05"):
        assert "sisdr" in res[k] and np.isfinite(res[k]["sisdr"])
        lo, hi = res[k]["ci95"]["sisdr"]
        assert lo <= res[k]["sisdr"] <= hi
    # different sigma_fac ⇒ different noise injection ⇒ different outputs
    assert res["v_N1"]["sisdr"] != res["v_N1_s05"]["sisdr"]
    # paired deltas vs coded input with their own CIs
    d = res["v_N1"]["delta_vs_coded"]["sisdr"]
    assert d["ci95"][0] <= d["mean"] <= d["ci95"][1]
    # malformed solver token must error, not silently mis-split
    with pytest.raises(SystemExit):
        ab_eval.parse_variant(f"bad:{ckpt}:1:42")


def test_train_cli_finetune(workspace, trained_ckpt):
    """--finetune loads weights from an existing checkpoint but starts a new
    run at step 0 (reference train.py:54-57)."""
    import train as train_cli

    train_cli.main([
        "--config-name", str(workspace / "configs" / "tiny.yaml"),
        "--run-id", "cli_ft",
        "--resume-from-checkpoint", trained_ckpt,
        "--finetune",
        "trainer_options.max_steps=2",
    ])
    from flowdec_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(workspace / "ckpts" / "cli_ft"))
    assert mgr.latest_step() == 2  # fresh step count, not 6
    mgr.close()
