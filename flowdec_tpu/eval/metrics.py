"""Evaluation metrics and the parallel metric harness.

Capability parity with /root/reference/flowdec/eval/metrics.py:
  * Metric base with a `names` list; get_metrics_row applies a metric list
    with per-metric exception→NaN and (metric, namefilter) gating of
    speech-only metrics (:43-70);
  * SISXR (SI-SDR/SI-SIR/SI-SAR decomposition with global phase-flip
    correction of the noise estimate, :256-270, :554-566);
  * LogSpecMSE (10·log10 power spectrograms at 32 ms / 8 ms, :333-372);
  * SNRseg / fwSNRseg (30 ms frames, 75% overlap — implemented natively from
    the standard formulas instead of wrapping pysepm, :511-547);
  * PESQ / ESTOI / DNSMOS / SIGMOS / ViSQOL wrappers — these depend on
    external C/ONNX runtimes; they are import-gated exactly like the
    reference gates ViSQOL (metrics.py:389-418) and degrade to NaN rows
    through get_metrics_row's exception handling;
  * get_metrics_df + a spawn-Pool parallel harness (get_metrics_df_parallel,
    :191-244).

All native metrics are pure numpy/JAX-on-CPU — they run host-side, outside
the jitted path (the reference likewise computes metrics on CPU tensors).
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from flowdec_tpu.data.dataset import resample_np
from flowdec_tpu.utils.logging import log

__all__ = [
    "Metric",
    "SISXR",
    "LogSpecMSE",
    "SNRseg",
    "FWSNRseg",
    "PESQ",
    "ESTOI",
    "DNSMOS",
    "SIGMOS",
    "ViSQOL",
    "si_sxr_components",
    "get_metrics_row",
    "get_metrics_df",
    "get_metrics_df_parallel",
    "get_audiotype_from_basename",
]


def _flatten(x) -> np.ndarray:
    x = np.asarray(x).squeeze()
    if x.ndim != 1:
        warnings.warn(f"Found non-1d-squeezable array with shape {x.shape}; flattening.")
    return x.reshape(-1)


def get_audiotype_from_basename(basename: str) -> Optional[str]:
    """'music'/'sound'/'speech' from a filename prefix (used to gate
    speech-only metrics; reference util/other.py:165-182)."""
    if basename is None:
        return None
    offset = 0
    for p in ("train_set_", "val_set_", "test_set_"):
        if basename.startswith(p):
            offset = 2
            break
    try:
        prefix = basename.split("_")[offset]
        if prefix in ("music", "sound", "speech"):
            return prefix
    except Exception:
        pass
    return None


class Metric:
    """Base metric: callable (x_hat, x, y, name) → scalar or tuple matching
    `names`."""

    names: List[str] = []

    def __init__(self, sr: int):
        self.sr = sr

    def __call__(self, x_hat, x, y=None, name=None):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Native metrics
# ---------------------------------------------------------------------------


def si_sxr_components(s_hat: np.ndarray, s: np.ndarray, n: np.ndarray):
    """Orthogonal decomposition of the estimate into target/noise/artifact
    components (scale-invariant BSS-eval style)."""
    alpha_s = np.dot(s_hat, s) / (np.linalg.norm(s) ** 2)
    s_target = alpha_s * s
    alpha_n = np.dot(s_hat, n) / (np.linalg.norm(n) ** 2)
    e_noise = alpha_n * n
    e_art = s_hat - s_target - e_noise
    return s_target, e_noise, e_art


class SISXR(Metric):
    names = ["sisdr", "sisir", "sisar"]

    def __call__(self, x_hat, x, y, name=None):
        x_hat, x, y = _flatten(x_hat), _flatten(x), _flatten(y)
        n = y - x
        # correct for a possible global phase flip between x and y: the true
        # n is likely the variant with smaller power
        if np.linalg.norm(y + x) < np.linalg.norm(y - x):
            n = y + x
        s_target, e_noise, e_art = si_sxr_components(x_hat, x, n)
        si_sdr = 10 * np.log10(
            np.linalg.norm(s_target) ** 2 / np.linalg.norm(e_noise + e_art) ** 2
        )
        si_sir = 10 * np.log10(
            np.linalg.norm(s_target) ** 2 / np.linalg.norm(e_noise) ** 2
        )
        si_sar = 10 * np.log10(
            np.linalg.norm(s_target) ** 2 / np.linalg.norm(e_art) ** 2
        )
        return si_sdr, si_sir, si_sar


def _power_spectrogram(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """|STFT|² with a symmetric hann window, center-padded (torchaudio
    T.Spectrogram(power=2) semantics)."""
    if n_fft == 1:
        window = np.ones(1)
    else:
        k = np.arange(n_fft)
        window = 0.5 - 0.5 * np.cos(2 * np.pi * k / (n_fft - 1))
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[idx] * window
    spec = np.fft.rfft(frames, axis=-1)
    return (np.abs(spec) ** 2).T  # (freq, time)


class LogSpecMSE(Metric):
    names = ["logspec_mse"]

    def __init__(self, sr, win_dur=32e-3, hop_dur=8e-3, eps=1e-8):
        super().__init__(sr)
        self.n_fft = int(win_dur * sr)
        self.hop = int(hop_dur * sr)
        self.eps = eps

    def __call__(self, x_hat, x, y=None, name=None):
        x_hat, x = _flatten(x_hat), _flatten(x)
        s_hat = _power_spectrogram(x_hat, self.n_fft, self.hop)
        s = _power_spectrogram(x, self.n_fft, self.hop)
        ls_hat = 10 * np.log10(np.maximum(s_hat, self.eps))
        ls = 10 * np.log10(np.maximum(s, self.eps))
        return float(np.mean((ls - ls_hat) ** 2))


def _segment(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    n = 1 + max(0, (len(x) - frame_len)) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[idx]


class SNRseg(Metric):
    """Segmental SNR: mean over 30 ms frames (75% overlap) of
    10·log10(‖x‖²/‖x−x̂‖²), clamped to [-10, 35] dB (the standard
    Hansen/Pellom definition pysepm implements)."""

    names = ["snrseg"]

    def __init__(self, sr, frame_dur=0.03, overlap=0.75, min_snr=-10.0, max_snr=35.0):
        super().__init__(sr)
        self.frame_len = int(round(frame_dur * sr))
        self.hop = int(round(self.frame_len * (1 - overlap)))
        self.min_snr, self.max_snr = min_snr, max_snr

    def __call__(self, x_hat, x, y=None, name=None):
        x_hat, x = _flatten(x_hat), _flatten(x)
        n = min(len(x), len(x_hat))
        xf = _segment(x[:n], self.frame_len, self.hop)
        ef = _segment(x[:n] - x_hat[:n], self.frame_len, self.hop)
        eps = np.finfo(np.float64).eps
        snr = 10 * np.log10(
            np.sum(xf**2, axis=1) / (np.sum(ef**2, axis=1) + eps) + eps
        )
        return float(np.mean(np.clip(snr, self.min_snr, self.max_snr)))


# 25 critical band center frequencies and Articulation-Index weights
# (Loizou, "Speech Enhancement: Theory and Practice", Table 11.1)
_CB_CENTERS = np.array([
    50.0, 120.0, 190.0, 260.0, 330.0, 400.0, 470.0, 540.0, 617.372,
    703.378, 798.717, 904.128, 1020.38, 1148.30, 1288.72, 1442.54,
    1610.70, 1794.16, 1993.93, 2211.08, 2446.71, 2701.97, 2978.04,
    3276.17, 3597.63,
])
_CB_BANDWIDTHS = np.array([
    70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 77.3724, 86.0056,
    95.3398, 105.411, 116.256, 127.914, 140.423, 153.823, 168.154,
    183.457, 199.776, 217.153, 235.631, 255.255, 276.072, 298.126,
    321.465, 346.136,
])


class FWSNRseg(Metric):
    """Frequency-weighted segmental SNR: per-frame critical-band SNRs weighted
    by |X_j|^gamma (gamma=0.2), Gaussian critical-band filters, 30 ms frames at
    75% overlap, clamped [-10, 35] dB (the pysepm fwSNRseg definition)."""

    names = ["fwsnrseg"]

    def __init__(self, sr, frame_dur=0.03, overlap=0.75, gamma=0.2):
        super().__init__(sr)
        self.frame_len = int(round(frame_dur * sr))
        self.hop = int(round(self.frame_len * (1 - overlap)))
        self.gamma = gamma
        n_fft = 2 ** int(np.ceil(np.log2(2 * self.frame_len)))
        self.n_fft = n_fft
        freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
        # Gaussian critical-band filterbank rows (n_bands, n_bins)
        self.filters = np.exp(
            -11.0 * (((freqs[None, :] - _CB_CENTERS[:, None]) / (_CB_BANDWIDTHS[:, None] / 2)) ** 2)
        )

    def _band_mags(self, frames: np.ndarray) -> np.ndarray:
        window = np.hanning(self.frame_len + 2)[1:-1]
        spec = np.abs(np.fft.rfft(frames * window, n=self.n_fft, axis=-1))
        return spec @ self.filters.T  # (n_frames, n_bands)

    def __call__(self, x_hat, x, y=None, name=None):
        x_hat, x = _flatten(x_hat), _flatten(x)
        n = min(len(x), len(x_hat))
        xf = _segment(x[:n], self.frame_len, self.hop)
        xhf = _segment(x_hat[:n], self.frame_len, self.hop)
        bx = self._band_mags(xf)
        bxh = self._band_mags(xhf)
        eps = np.finfo(np.float64).eps
        w = bx**self.gamma
        snr = 10 * np.log10((bx**2) / ((bx - bxh) ** 2 + eps) + eps)
        snr = np.clip(snr, -10.0, 35.0)
        per_frame = np.sum(w * snr, axis=1) / (np.sum(w, axis=1) + eps)
        return float(np.mean(per_frame))


# ---------------------------------------------------------------------------
# Wrappers over external runtimes (import-gated; exceptions → NaN rows)
# ---------------------------------------------------------------------------


class PESQ(Metric):
    """ITU-T P.862 wideband PESQ at 16 kHz via the `pesq` C extension."""

    names = ["pesq"]

    def __init__(self, sr):
        super().__init__(sr)
        from pesq import pesq as calc_pesq  # gated import

        self._calc = calc_pesq

    def __call__(self, x_hat, x, y=None, name=None):
        x_hat, x = _flatten(x_hat), _flatten(x)
        if self.sr != 16000:
            x_hat = resample_np(x_hat[None], self.sr, 16000)[0]
            x = resample_np(x[None], self.sr, 16000)[0]
        return self._calc(16000, x, x_hat, "wb")


class ESTOI(Metric):
    """Extended STOI — native implementation (eval/estoi.py), with `pystoi`
    as the preferred backend when installed (backend='auto'). The reference
    can ONLY use pystoi and degrades to NaN without it (metrics.py:18)."""

    names = ["estoi"]

    def __init__(self, sr, backend: str = "auto"):
        super().__init__(sr)
        self._calc = None
        if backend in ("auto", "pystoi"):
            try:
                from pystoi import stoi as calc_stoi

                self._calc = calc_stoi
            except ImportError:
                if backend == "pystoi":
                    raise

    def __call__(self, x_hat, x, y=None, name=None):
        if self._calc is not None:
            return self._calc(_flatten(x), _flatten(x_hat), self.sr,
                              extended=True)
        from flowdec_tpu.eval.estoi import estoi_np

        return estoi_np(_flatten(x), _flatten(x_hat), self.sr)


class DNSMOS(Metric):
    """DNSMOS P.835 via `speechmos` (ONNX runtime)."""

    names = ["ovrl_mos", "sig_mos", "bak_mos", "p808_mos"]

    def __init__(self, sr):
        super().__init__(sr)
        from speechmos import dnsmos  # gated import

        self._dnsmos = dnsmos

    def __call__(self, x_hat, x=None, y=None, name=None):
        wav = _flatten(x_hat)
        if self.sr != 16000:
            wav = resample_np(wav[None], self.sr, 16000)[0]
        result = self._dnsmos.run(wav, sr=16000)
        return [result[n] for n in self.names]


class SIGMOS(Metric):
    """P.804 SigMOS via the ONNX model (flowdec_tpu.eval.sigmos)."""

    names = [
        "MOS_OVRL", "MOS_SIG", "MOS_NOISE",
        "MOS_COL", "MOS_DISC", "MOS_LOUD", "MOS_REVERB",
    ]

    def __init__(self, sr, model_dir: Optional[str] = None):
        super().__init__(sr)
        from flowdec_tpu.eval.sigmos import SigMOS  # gated (needs onnxruntime)

        self._instance = SigMOS(model_dir=model_dir)

    def __call__(self, x_hat, x=None, y=None, name=None):
        result = self._instance.run(_flatten(x_hat), sr=self.sr)
        return [result[n] for n in self.names]


def visqol_mode_heuristic(name: Optional[str]) -> Optional[str]:
    """speech/audio mode from the filename prefix (reference :375-386)."""
    if name is None:
        return None
    head = name[:30]
    if "speech" in head:
        return "speech"
    if "sound" in head or "music" in head:
        return "audio"
    return None


class ViSQOL(Metric):
    """ViSQOL MOS-LQO: audio mode @48 kHz or speech mode @16 kHz.

    Backends (reference metrics.py:424-508): 'bindings' (the visqol Python
    package's C bindings) or 'subprocess' (the standalone binary). Both are
    external native components; construction fails cleanly when absent.
    """

    names = ["visqol"]

    def __init__(self, sr, mode: str = "heuristic", backend: str = "bindings",
                 binary_path: Optional[str] = None):
        super().__init__(sr)
        self.mode = mode
        self.backend = backend
        self.binary_path = binary_path
        self._apis: Dict[str, object] = {}
        if backend == "bindings":
            self._apis["audio"] = self._make_api("audio")
            self._apis["speech"] = self._make_api("speech")
        elif backend == "subprocess":
            if not binary_path or not os.path.exists(binary_path):
                raise FileNotFoundError("ViSQOL binary not found for subprocess backend")
        else:
            raise ValueError(f"Unknown ViSQOL backend {backend}")

    @staticmethod
    def _make_api(which: str):
        from visqol import visqol_lib_py  # gated import
        from visqol.pb2 import visqol_config_pb2
        from visqol.pb2 import similarity_result_pb2  # noqa: F401 (import required)

        config = visqol_config_pb2.VisqolConfig()
        if which == "audio":
            config.audio.sample_rate = 48000
            config.options.use_speech_scoring = False
            model = "libsvm_nu_svr_model.txt"
        else:
            config.audio.sample_rate = 16000
            config.options.use_speech_scoring = True
            model = (
                "lattice_tcditugenmeetpackhref_ls2_nl60_lr12_bs2048_learn.005_"
                "ep2400_train1_7_raw.tflite"
            )
        config.options.svr_model_path = os.path.join(
            os.path.dirname(visqol_lib_py.__file__), "model", model
        )
        api = visqol_lib_py.VisqolApi()
        api.Create(config)
        return api

    def __call__(self, x_hat, x, y=None, name=None):
        mode = visqol_mode_heuristic(name) if self.mode == "heuristic" else self.mode
        if mode is None:
            mode = "audio"
        x_hat, x = _flatten(x_hat), _flatten(x)
        target_sr = 48000 if mode == "audio" else 16000
        if self.sr != target_sr:
            x_hat = resample_np(x_hat[None], self.sr, target_sr)[0]
            x = resample_np(x[None], self.sr, target_sr)[0]
        if self.backend == "bindings":
            result = self._apis[mode].Measure(
                x.astype(np.float64), x_hat.astype(np.float64)
            )
            return float(result.moslqo)
        return self._run_subprocess(x, x_hat, target_sr)

    def _run_subprocess(self, ref: np.ndarray, deg: np.ndarray, sr: int) -> float:
        import subprocess
        import tempfile

        from flowdec_tpu.data.wavio import write_wav

        with tempfile.TemporaryDirectory() as td:
            ref_path = os.path.join(td, "ref.wav")
            deg_path = os.path.join(td, "deg.wav")
            write_wav(ref_path, ref, sr)
            write_wav(deg_path, deg, sr)
            args = [self.binary_path, "--reference_file", ref_path,
                    "--degraded_file", deg_path]
            if sr == 16000:
                args.append("--use_speech_mode")
            out = subprocess.run(args, capture_output=True, text=True, check=True)
            for line in out.stdout.splitlines():
                if "MOS-LQO" in line:
                    return float(line.split(":")[-1].strip())
        raise RuntimeError("Could not parse ViSQOL output")


# ---------------------------------------------------------------------------
# Metric application harness
# ---------------------------------------------------------------------------

MetricOrFiltered = Union[Metric, Tuple[Metric, str], Dict]


def _unpack(metric: MetricOrFiltered) -> Tuple[Metric, Optional[str]]:
    if isinstance(metric, tuple):
        return metric
    if isinstance(metric, dict):  # config form {metric: ..., namefilter: ...}
        return metric["metric"], metric.get("namefilter")
    return metric, None


def get_metrics_row(
    metrics: Sequence[MetricOrFiltered], row_name: str, x_hat, x, y, meta=None
) -> Dict[str, float]:
    """Apply all metrics to one (x_hat, x, y) triple; exceptions and
    namefilter misses become NaN (reference :43-70)."""
    row: Dict[str, float] = {**(meta or {}), "name": row_name}
    for entry in metrics:
        metric, namefilter = _unpack(entry)
        try:
            if namefilter is None or (row_name and namefilter in row_name):
                result = metric(x_hat, x, y, row_name)
                if len(metric.names) == 1:
                    result = [result]
                for n, v in zip(metric.names, result):
                    row[n] = float(v)
            else:
                for n in metric.names:
                    row[n] = np.nan
        except Exception:
            log.exception(f"Exception calculating metric {metric}; returning NaNs")
            for n in metric.names:
                row[n] = np.nan
    return row


def get_metrics_df(x_hats, xs, ys, metrics, names=None, meta=None,
                   crop_to_x=False, crop_to_x_hat=False):
    """Metric rows over lists of audios → pandas DataFrame (reference :73-100)."""
    import pandas as pd

    assert len(x_hats) == len(xs) == len(ys)
    rows = []
    for i, (x_hat, x, y) in enumerate(zip(x_hats, xs, ys)):
        if crop_to_x:
            x_hat = x_hat[..., : np.asarray(x).shape[-1]]
            y = y[..., : np.asarray(x).shape[-1]]
        if crop_to_x_hat:
            x = x[..., : np.asarray(x_hat).shape[-1]]
            y = y[..., : np.asarray(x_hat).shape[-1]]
        name = names[i] if names is not None else str(i)
        meta_i = meta[i] if meta is not None else None
        rows.append(get_metrics_row(metrics, name, x_hat, x, y, meta=meta_i))
    if not rows:
        raise ValueError("Produced an empty DataFrame!")
    return pd.DataFrame(rows)


# Per-worker state for the multiprocessing pool (spawn-safe: module globals
# re-initialized by the initializer in each worker, reference :103-189).
_WORKER_METRICS: Optional[List[MetricOrFiltered]] = None


class InitializeMetrics:
    """Picklable per-worker metric initializer (reference :103-137)."""

    def __init__(self, metric_factories: Sequence[Callable[[], MetricOrFiltered]]):
        self.metric_factories = list(metric_factories)

    def __call__(self):
        global _WORKER_METRICS
        _WORKER_METRICS = [f() for f in self.metric_factories]


def _worker_row(args):
    name, x_hat, x, y, meta = args
    return get_metrics_row(_WORKER_METRICS, name, x_hat, x, y, meta=meta)


def get_metrics_df_parallel(
    x_hats, xs, ys, metric_factories, names=None, meta=None, poolsize: int = 16
):
    """Spawn-pool parallel metric evaluation over files (reference :191-244)."""
    import multiprocessing as mp

    import pandas as pd

    jobs = [
        (
            names[i] if names is not None else str(i),
            np.asarray(x_hats[i]),
            np.asarray(xs[i]),
            np.asarray(ys[i]),
            meta[i] if meta is not None else None,
        )
        for i in range(len(x_hats))
    ]
    ctx = mp.get_context("spawn")
    with ctx.Pool(
        processes=min(poolsize, len(jobs)),
        initializer=InitializeMetrics(metric_factories),
    ) as pool:
        rows = pool.map(_worker_row, jobs)
    return pd.DataFrame(rows)
