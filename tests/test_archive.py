"""Param-archive round trip: Orbax checkpoint → compact npz → same codec.

The archive is the VM-restart-proof retention path for trained artifacts
(CAMPAIGN.md r4 §7: scratch loss destroyed the best codec checkpoint);
these tests pin the tree round trip and the end-to-end consumer path
(load_codec_archive → autoencode close to the Orbax-loaded codec).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowdec_tpu.utils.archive import (
    flatten_tree,
    load_archive,
    save_archive,
    unflatten_tree,
)


def test_tree_roundtrip_exact():
    tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3),
                  "c": np.array([1, 2], dtype=np.int32)},
            "d/e": np.float32(3.5)}  # slash in key must survive
    flat = flatten_tree(tree)
    back = unflatten_tree(flat)
    assert set(flat) == {"a||b", "a||c", "d/e"}
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["a"]["c"], tree["a"]["c"])


def test_save_load_archive(tmp_path):
    tree = {"w": np.random.default_rng(0).standard_normal(
        (16, 8)).astype(np.float32),
            "steps": np.array(7, dtype=np.int32)}
    out = str(tmp_path / "a.npz")
    size = save_archive(out, tree, {"kind": "codec", "codec": {"x": 1}},
                        dtype="float16", meta={"step": 7})
    assert size > 0
    params, config, meta = load_archive(out)
    assert config == {"kind": "codec", "codec": {"x": 1}}
    assert meta == {"step": 7}
    # floats come back f32 (cast through f16), ints untouched
    assert params["w"].dtype == np.float32
    assert params["steps"].dtype == np.int32
    np.testing.assert_allclose(params["w"], tree["w"], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_codec_archive_end_to_end(tmp_path):
    """Train 2 steps of a tiny codec, archive, restore via the consumer
    path, and check the archived codec autoencodes ≈ the Orbax one."""
    import importlib

    import jax.numpy as jnp

    train_codec = importlib.import_module("scripts.train_codec")
    archive_cli = importlib.import_module("scripts.archive_ckpt")
    from flowdec_tpu.codec.training import load_codec, load_codec_archive
    from flowdec_tpu.data.wavio import write_wav

    sr = 8000
    rng = np.random.default_rng(0)
    pairs = []
    for i in range(8):  # conftest runs an 8-virtual-device mesh: batch = 8
        x = (0.2 * np.sin(2 * np.pi * (300 + 40 * i) * np.arange(sr) / sr)
             + 0.01 * rng.standard_normal(sr)).astype(np.float32)
        p = str(tmp_path / f"c{i}.wav")
        write_wav(p, x, sr)
        pairs.append(f"{p},{p}")
    pairs_file = str(tmp_path / "pairs.txt")
    open(pairs_file, "w").write("\n".join(pairs) + "\n")

    ckpt = str(tmp_path / "codec")
    train_codec.main([
        "--pairs-file", pairs_file, "--ckpt-dir", ckpt, "--steps", "2",
        "--batch-size", "8", "--crop-seconds", "0.1", "--sr", str(sr),
        "--encoder-dim", "8", "--decoder-dim", "8", "--latent-dim", "4",
        "--n-codebooks", "2", "--encoder-rates", "2,4", "--ckpt-every", "2",
        "--log-every", "1",
    ])

    npz = str(tmp_path / "codec.npz")
    archive_cli.main(["archive", "--ckpt", ckpt, "--kind", "codec",
                      "--out", npz, "--meta", '{"step": 2}'])
    archive_cli.main(["restore", "--npz", npz])

    codec_a, params_a, cfg_a = load_codec_archive(npz)
    codec_o, params_o, cfg_o = load_codec(ckpt, ema=False)
    assert cfg_a == cfg_o
    x = jnp.asarray(rng.standard_normal((1, cfg_a.hop_length * 8)),
                    jnp.float32) * 0.1
    ya = codec_a.apply(params_a, x, 2)["audio"]
    yo = codec_o.apply(params_o, x, 2)["audio"]
    # f16 weight storage: outputs agree to ~1e-2 relative
    denom = float(jnp.max(jnp.abs(yo))) + 1e-9
    assert float(jnp.max(jnp.abs(ya - yo))) / denom < 5e-2

    # the product consumer: code_corpus accepts the npz directly
    code_corpus = importlib.import_module("scripts.code_corpus")
    src = tmp_path / "corpus"
    (src / "test").mkdir(parents=True)
    lines = [f"{p.split(',')[0]},{p.split(',')[1]}" for p in pairs[:2]]
    (src / "test_pairs.txt").write_text("\n".join(lines) + "\n")
    out = tmp_path / "coded"
    code_corpus.main([
        "--corpus", str(src), "--out", str(out), "--codec-ckpt", npz,
        "--nq", "2", "--batch", "2", "--splits", "test",
    ])
    coded_pairs = (out / "test_pairs.txt").read_text().splitlines()
    assert len(coded_pairs) == 2
    from flowdec_tpu.data.wavio import read_wav

    wav, sr_out = read_wav(coded_pairs[0].split(",")[1])
    assert sr_out == cfg_a.sampling_rate and wav.size > 0
