"""Paired-audio dataset and data module.

Capability parity with PairedAudioFiles / PairedAudioDataModule
(/root/reference/flowdec/data/data_module.py:25-373): the three listing modes
(folderglob / filelist / paired_filelist), mono downmix, on-the-fly resampling
(lowpass_filter_width=128), y-truncated-to-x with misalignment errors,
random/center crop or symmetric zero-pad to target_duration, pretend_len debug
override, and get_evaluation_samples (uncropped, linspace when seed is None).

Deliberate fixes/changes vs the reference:
  * the `self.text_y` typo that broke setup('test') (data_module.py:299) does
    not exist here;
  * explicit per-epoch RNG seeding (torch global RNG → reproducible crops);
  * loader is a thread-pool prefetcher producing numpy batches, sharded per
    JAX process for multi-host DP (replaces torch DataLoader workers).
"""

from __future__ import annotations

import os
import warnings
from concurrent.futures import ThreadPoolExecutor
from glob import glob
from typing import Iterator, List, Optional, Tuple

import numpy as np

from flowdec_tpu.data.wavio import read_wav
from flowdec_tpu.ops.resample import _kernel_np
from flowdec_tpu.utils.logging import log

__all__ = ["PairedAudioFiles", "PairedAudioDataModule", "BatchLoader", "resample_np"]


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int, lowpass_filter_width: int = 128) -> np.ndarray:
    """Host-side polyphase resampling (same kernels as ops.resample; numpy so
    the data pipeline never touches an accelerator)."""
    if orig_freq == new_freq:
        return x
    import math

    gcd = math.gcd(int(orig_freq), int(new_freq))
    o, n = int(orig_freq) // gcd, int(new_freq) // gcd
    kernels, width = _kernel_np(o, n, lowpass_filter_width, 0.99)

    length = x.shape[-1]
    lead = x.shape[:-1]
    xf = x.reshape(-1, length)
    num_blocks = length // o + 1
    padded = np.pad(xf, [(0, 0), (width, width + o)])

    taps = kernels.shape[1]
    # sliding windows at stride o → (batch, blocks, taps) @ (taps, phases)
    windows = np.lib.stride_tricks.sliding_window_view(padded, taps, axis=-1)[:, ::o][
        :, :num_blocks
    ]
    out = np.einsum("bnt,pt->bnp", windows, kernels, optimize=True)
    out = out.reshape(xf.shape[0], -1)
    target_len = int(np.ceil(n * length / o))
    return out[:, :target_len].reshape(*lead, target_len).astype(np.float32)


def _load_mono(path: str, target_sr: int) -> np.ndarray:
    """Load → mono (1, L) float32 at target_sr.

    Uses the native C++ decoder/resampler (data/native.py) when available —
    PCM→float conversion and polyphase filtering dominate loader CPU time —
    and falls back to the pure-numpy implementations otherwise."""
    try:
        from flowdec_tpu.data import native

        x, sr = native.read_wav_native(path, downmix=True)
        if sr != target_sr:
            x = native.resample_native(x, sr, target_sr, lowpass_filter_width=128)
        return x.astype(np.float32)
    except Exception:
        pass
    x, sr = read_wav(path)
    if x.shape[0] > 1:
        x = np.mean(x, axis=0, keepdims=True)
    if sr != target_sr:
        x = resample_np(x, sr, target_sr, lowpass_filter_width=128)
    return x.astype(np.float32)


class PairedAudioFiles:
    """Dataset of (clean x, coded y) audio file pairs."""

    def __init__(
        self,
        path: Optional[str],
        sampling_rate: int,
        target_duration: float,
        random_crop: bool,
        noisy_path: Optional[str] = None,
        mode: str = "folderglob",
        pairs_delim: str = ",",
        pretend_len: Optional[int] = None,
    ):
        self.mode = mode
        self.sampling_rate = sampling_rate
        self.target_duration = target_duration
        self.random_crop = random_crop
        self.pretend_len = pretend_len
        self.pairs_delim = pairs_delim
        self._rng = np.random.default_rng()

        if path is None:
            warnings.warn("Passed path=None, this dataset will be empty!")
            self.clean_files, self.noisy_files = [], []
            return

        if mode == "folderglob":
            self.clean_files = sorted(glob(os.path.join(path, "*.wav")))
            self.noisy_files = sorted(glob(os.path.join(noisy_path, "*.wav")))
            if not all(
                os.path.basename(a) == os.path.basename(b)
                for a, b in zip(self.clean_files, self.noisy_files)
            ):
                raise AssertionError(
                    "Did not find the same set of files in the clean and noisy folders!"
                )
        elif mode == "filelist":
            with open(path) as f:
                self.clean_files = f.read().splitlines()
            with open(noisy_path) as f:
                self.noisy_files = f.read().splitlines()
        elif mode == "paired_filelist":
            with open(path) as f:
                pairs = [line.split(pairs_delim) for line in f.read().splitlines() if line]
            self.clean_files = [p[0] for p in pairs]
            self.noisy_files = [p[1] for p in pairs]
        else:
            raise ValueError(f"Unknown mode for PairedAudioFiles: {mode}!")

        if len(self.clean_files) != len(self.noisy_files):
            raise ValueError(
                f"Found {len(self.clean_files)} clean files but "
                f"{len(self.noisy_files)} noisy files -- lengths must match!"
            )
        if pretend_len is not None and pretend_len > len(self.clean_files):
            raise ValueError(
                f"Passed pretend_len={pretend_len} but only have "
                f"{len(self.clean_files)} files!"
            )

    def seed(self, seed: int) -> None:
        """Reseed the crop RNG (per epoch/worker for reproducibility)."""
        self._rng = np.random.default_rng(seed)

    def get(
        self, i: int, pad_crop: bool, return_basename: bool = False
    ) -> Tuple[np.ndarray, ...]:
        basename = os.path.basename(self.noisy_files[i])
        x = _load_mono(self.clean_files[i], self.sampling_rate)
        y = _load_mono(self.noisy_files[i], self.sampling_rate)

        if x.shape[-1] < y.shape[-1]:
            y = y[..., : x.shape[-1]]
        elif x.shape[-1] > y.shape[-1]:
            raise ValueError(
                f"Misaligned / broken audio files: y cannot be shorter than x! In: "
                f"x={self.clean_files[i]}, y={self.noisy_files[i]}"
            )

        if pad_crop:
            target = int(self.target_duration * self.sampling_rate)
            current = x.shape[-1]
            if current >= target:
                if self.random_crop:
                    start = int(self._rng.uniform(0, current - target)) if current > target else 0
                else:
                    start = (current - target) // 2
                x = x[..., start : start + target]
                y = y[..., start : start + target]
            else:
                pad = target - current
                widths = [(0, 0)] * (x.ndim - 1) + [(pad // 2, pad // 2 + pad % 2)]
                x = np.pad(x, widths)
                y = np.pad(y, widths)

        if return_basename:
            return x, y, basename
        return x, y

    def __getitem__(self, i: int):
        return self.get(i, pad_crop=True, return_basename=True)

    def __len__(self) -> int:
        return self.pretend_len if self.pretend_len is not None else len(self.clean_files)


class BatchLoader:
    """Thread-pool prefetching batch iterator over a PairedAudioFiles dataset.

    Per-host sharding for multi-host DP: each JAX process sees indices
    i % num_shards == shard_index. Yields (x, y, basenames) with x, y numpy
    (B, L); drops the last incomplete batch (static shapes for jit).
    """

    def __init__(
        self,
        dataset: PairedAudioFiles,
        batch_size: int,
        *,
        shuffle: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: Optional[int] = None) -> Iterator[Tuple[np.ndarray, np.ndarray, List[str]]]:
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        rng = np.random.default_rng((self.seed, epoch))
        self.dataset.seed(int(rng.integers(2**31)) + self.shard_index)

        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(idxs)
        idxs = idxs[self.shard_index :: self.num_shards]

        n_batches = len(idxs) // self.batch_size if self.drop_last else -(-len(idxs) // self.batch_size)
        batches = [
            idxs[b * self.batch_size : (b + 1) * self.batch_size]
            for b in range(n_batches)
        ]
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            def submit(batch_idxs):
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in batch_idxs]

            ahead = 2  # batches in flight
            queue = [submit(b) for b in batches[:ahead]]
            for bi in range(n_batches):
                if bi + ahead < n_batches:
                    queue.append(submit(batches[bi + ahead]))
                items = [f.result() for f in queue.pop(0)]
                xs = np.concatenate([it[0] for it in items], axis=0)
                ys = np.concatenate([it[1] for it in items], axis=0)
                yield xs, ys, [it[2] for it in items]
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    def __iter__(self):
        return self.epoch()


class PairedAudioDataModule:
    """Train/valid/test dataset triple + loaders + uncropped eval samples."""

    def __init__(
        self,
        sampling_rate: int,
        target_duration: float,
        batch_size: int,
        num_workers: int = 10,
        mode: str = "folderglob",
        pairs_delim: str = ",",
        train_x: Optional[str] = None,
        train_y: Optional[str] = None,
        valid_x: Optional[str] = None,
        valid_y: Optional[str] = None,
        test_x: Optional[str] = None,
        test_y: Optional[str] = None,
        dataset_kwargs: Optional[dict] = None,
        seed: int = 0,
    ):
        if mode != "paired_filelist":
            assert bool(train_x) == bool(train_y)
            assert bool(valid_x) == bool(valid_y)
            assert bool(test_x) == bool(test_y)
        self.sampling_rate = sampling_rate
        self.target_duration = target_duration
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.mode = mode
        self.pairs_delim = pairs_delim
        self.paths = dict(
            train=(train_x, train_y), valid=(valid_x, valid_y), test=(test_x, test_y)
        )
        self.dataset_kwargs = dataset_kwargs or {}
        self.seed = seed
        self.train_set = self.valid_set = self.test_set = None

    def setup(self, stage: Optional[str] = None) -> None:
        shared = dict(
            mode=self.mode,
            sampling_rate=self.sampling_rate,
            target_duration=self.target_duration,
            pairs_delim=self.pairs_delim,
            **self.dataset_kwargs,
        )
        if stage in ("fit", None):
            self.train_set = PairedAudioFiles(
                path=self.paths["train"][0], noisy_path=self.paths["train"][1],
                random_crop=True, **shared,
            )
            self.valid_set = PairedAudioFiles(
                path=self.paths["valid"][0], noisy_path=self.paths["valid"][1],
                random_crop=False, **shared,
            )
        if stage in ("test", None):
            self.test_set = PairedAudioFiles(
                path=self.paths["test"][0], noisy_path=self.paths["test"][1],
                random_crop=False, **shared,
            )

    def _loader(self, dataset, shuffle: bool, shard_index=0, num_shards=1) -> BatchLoader:
        return BatchLoader(
            dataset, self.batch_size, shuffle=shuffle, num_workers=self.num_workers,
            seed=self.seed, shard_index=shard_index, num_shards=num_shards,
        )

    def train_loader(self, shard_index: int = 0, num_shards: int = 1) -> BatchLoader:
        return self._loader(self.train_set, True, shard_index, num_shards)

    def valid_loader(self, shard_index: int = 0, num_shards: int = 1) -> BatchLoader:
        return self._loader(self.valid_set, False, shard_index, num_shards)

    def test_loader(self, shard_index: int = 0, num_shards: int = 1) -> BatchLoader:
        return self._loader(self.test_set, False, shard_index, num_shards)

    def get_evaluation_samples(
        self, from_set: str, num_samples: int, seed: Optional[int] = None
    ) -> List[Tuple[np.ndarray, np.ndarray, str]]:
        """Uncropped full files: linspace indices when seed is None, else a
        seeded choice (reference data_module.py:331-373)."""
        dset = {"train": self.train_set, "valid": self.valid_set, "test": self.test_set}[
            from_set
        ]
        if seed is None:
            idxs = np.linspace(0, len(dset) - 1, num_samples).astype(np.int32)
        else:
            idxs = (
                np.random.default_rng(seed)
                .choice(range(len(dset)), num_samples)
                .astype(np.int32)
            )
        if len(set(idxs.tolist())) != len(idxs):
            warnings.warn(
                f"Cannot get {num_samples} unique samples from dataset {from_set!r}; "
                "returning duplicates."
            )
        return [dset.get(int(i), pad_crop=False, return_basename=True) for i in idxs]
