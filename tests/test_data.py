"""Data pipeline tests: WAV I/O round trips, dataset listing modes, crop/pad
semantics, loader batching/sharding, evaluation-sample selection."""

import os

import numpy as np
import pytest

from flowdec_tpu.data import (
    BatchLoader,
    PairedAudioDataModule,
    PairedAudioFiles,
    read_wav,
    resample_np,
    write_wav,
)

SR = 8000


@pytest.fixture(scope="module")
def wav_tree(tmp_path_factory):
    """Synthesized paired dataset: clean/ and coded/ dirs + filelists."""
    root = tmp_path_factory.mktemp("data")
    clean_dir = root / "clean"
    coded_dir = root / "coded"
    clean_dir.mkdir()
    coded_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i, seconds in enumerate([1.0, 2.5, 0.4, 3.0]):
        n = int(seconds * SR)
        x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / SR)).astype(np.float32)
        y = x + 0.01 * rng.standard_normal(n).astype(np.float32)
        name = f"speech_{i}.wav"
        write_wav(str(clean_dir / name), x, SR)
        write_wav(str(coded_dir / name), y, SR)
        paths.append((str(clean_dir / name), str(coded_dir / name)))

    pairs_file = root / "pairs.txt"
    pairs_file.write_text("".join(f"{c},{n}\n" for c, n in paths))
    clean_list = root / "clean.txt"
    noisy_list = root / "noisy.txt"
    clean_list.write_text("".join(p[0] + "\n" for p in paths))
    noisy_list.write_text("".join(p[1] + "\n" for p in paths))
    return dict(root=root, clean_dir=clean_dir, coded_dir=coded_dir,
                pairs_file=pairs_file, clean_list=clean_list, noisy_list=noisy_list)


@pytest.mark.parametrize("dtype", ["int16", "float32"])
def test_wav_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((2, 1000)) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, 44100, dtype=dtype)
    back, sr = read_wav(path)
    assert sr == 44100 and back.shape == x.shape
    atol = 1e-4 if dtype == "int16" else 1e-7
    np.testing.assert_allclose(back, x, atol=atol)


def test_wav_24bit(tmp_path):
    """24-bit PCM decode (hand-built file)."""
    import struct

    x = np.asarray([0.0, 0.5, -0.5, 0.999], dtype=np.float64)
    ints = (x * (1 << 23)).astype(np.int64)
    payload = b"".join(
        struct.pack("<i", int(v))[:3] for v in ints
    )
    path = str(tmp_path / "t24.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000, 48000 * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    back, sr = read_wav(path)
    np.testing.assert_allclose(back[0], x, atol=1e-6)


def test_resample_np_matches_jax():
    from flowdec_tpu.ops.resample import resample
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 12000)).astype(np.float32)
    a = resample_np(x, 44100, 48000, lowpass_filter_width=32)
    b = np.asarray(resample(x, 44100, 48000, lowpass_filter_width=32))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("mode", ["folderglob", "filelist", "paired_filelist"])
def test_dataset_modes(wav_tree, mode):
    if mode == "folderglob":
        ds = PairedAudioFiles(str(wav_tree["clean_dir"]), SR, 2, True,
                              noisy_path=str(wav_tree["coded_dir"]), mode=mode)
    elif mode == "filelist":
        ds = PairedAudioFiles(str(wav_tree["clean_list"]), SR, 2, True,
                              noisy_path=str(wav_tree["noisy_list"]), mode=mode)
    else:
        ds = PairedAudioFiles(str(wav_tree["pairs_file"]), SR, 2, True, mode=mode)
    assert len(ds) == 4
    x, y, name = ds[0]
    assert x.shape == y.shape == (1, 2 * SR)  # cropped/padded to 2 s
    assert name.endswith(".wav")


def test_dataset_pad_and_crop(wav_tree):
    ds = PairedAudioFiles(str(wav_tree["pairs_file"]), SR, 2, False, mode="paired_filelist")
    # file 2 is 0.4 s → symmetric zero pad
    x, y, _ = ds[2]
    assert x.shape[-1] == 2 * SR
    n = int(0.4 * SR)
    pad_lo = (2 * SR - n) // 2
    assert np.all(x[..., :pad_lo] == 0) and np.all(x[..., pad_lo + n :] == 0)
    # file 3 is 3 s → center crop
    x3, _ = ds.get(3, pad_crop=True)
    assert x3.shape[-1] == 2 * SR
    # uncropped get
    xu, yu, _ = ds.get(3, pad_crop=False, return_basename=True)
    assert xu.shape[-1] == 3 * SR


def test_dataset_pretend_len(wav_tree):
    ds = PairedAudioFiles(str(wav_tree["pairs_file"]), SR, 2, True,
                          mode="paired_filelist", pretend_len=2)
    assert len(ds) == 2
    with pytest.raises(ValueError):
        PairedAudioFiles(str(wav_tree["pairs_file"]), SR, 2, True,
                         mode="paired_filelist", pretend_len=10)


def test_loader_batches_and_sharding(wav_tree):
    ds = PairedAudioFiles(str(wav_tree["pairs_file"]), SR, 2, True, mode="paired_filelist")
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    x, y, names = batches[0]
    assert x.shape == (2, 2 * SR) and y.shape == (2, 2 * SR) and len(names) == 2

    # determinism per epoch seed
    names_a = [n for _, _, ns in BatchLoader(ds, 2, seed=1).epoch(5) for n in ns]
    names_b = [n for _, _, ns in BatchLoader(ds, 2, seed=1).epoch(5) for n in ns]
    assert names_a == names_b

    # 2-way sharding covers disjoint files
    l0 = BatchLoader(ds, 1, shuffle=False, shard_index=0, num_shards=2)
    l1 = BatchLoader(ds, 1, shuffle=False, shard_index=1, num_shards=2)
    n0 = [n for _, _, ns in l0.epoch(0) for n in ns]
    n1 = [n for _, _, ns in l1.epoch(0) for n in ns]
    assert not (set(n0) & set(n1)) and len(n0) + len(n1) == 4


def test_datamodule(wav_tree):
    dm = PairedAudioDataModule(
        sampling_rate=SR, target_duration=2, batch_size=2, num_workers=2,
        mode="paired_filelist",
        train_x=str(wav_tree["pairs_file"]),
        valid_x=str(wav_tree["pairs_file"]),
        test_x=str(wav_tree["pairs_file"]),
    )
    dm.setup()
    assert len(dm.train_set) == len(dm.valid_set) == len(dm.test_set) == 4
    # the reference's setup('test') was broken by a typo (data_module.py:299)
    dm2 = PairedAudioDataModule(
        sampling_rate=SR, target_duration=2, batch_size=2,
        mode="paired_filelist", test_x=str(wav_tree["pairs_file"]),
        train_x=None, valid_x=None,
    )
    dm2.setup("test")
    assert len(dm2.test_set) == 4

    samples = dm.get_evaluation_samples("valid", 3, seed=None)
    assert len(samples) == 3
    # linspace: first and last files included, uncropped lengths vary
    assert samples[0][2] == "speech_0.wav"
    assert samples[-1][2] == "speech_3.wav"
    lengths = {s[0].shape[-1] for s in samples}
    assert len(lengths) > 1  # uncropped

    seeded = dm.get_evaluation_samples("valid", 2, seed=0)
    seeded2 = dm.get_evaluation_samples("valid", 2, seed=0)
    assert [s[2] for s in seeded] == [s[2] for s in seeded2]


def test_native_audio_io(tmp_path):
    """C++ decoder/resampler must match the numpy implementations exactly
    (same kernel bank) — skipped when no toolchain is available."""
    pytest.importorskip("ctypes")
    from flowdec_tpu.data import native

    if not native.native_available():
        pytest.skip("native audio library unavailable (no g++?)")

    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((2, 5000)) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "n.wav")
    write_wav(path, x, 44100, dtype="float32")

    a, sr_a = native.read_wav_native(path)
    b, sr_b = read_wav(path)
    assert sr_a == sr_b == 44100
    np.testing.assert_allclose(a, b, atol=1e-7)

    mono, _ = native.read_wav_native(path, downmix=True)
    np.testing.assert_allclose(mono, np.mean(b, axis=0, keepdims=True), atol=1e-6)

    r_native = native.resample_native(mono, 44100, 48000, lowpass_filter_width=32)
    r_np = resample_np(mono, 44100, 48000, lowpass_filter_width=32)
    assert r_native.shape == r_np.shape
    np.testing.assert_allclose(r_native, r_np, atol=1e-4)

    # int16 wav through the native decoder
    write_wav(path, x, 16000, dtype="int16")
    a16, sr16 = native.read_wav_native(path)
    b16, _ = read_wav(path)
    assert sr16 == 16000
    np.testing.assert_allclose(a16, b16, atol=1e-6)
