"""ctypes bindings for the native (C++) audio I/O library.

Compiles native/audio_io.cpp on first use (g++, cached as a .so next to the
sources) and exposes:
    read_wav_native(path, downmix=True) -> (float32 array, sample_rate)
    resample_native(x, orig_freq, new_freq, lowpass_filter_width)
Falls back cleanly (ImportError/OSError) so the pure-numpy path in
flowdec_tpu.data.wavio / dataset keeps working without a toolchain.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["get_lib", "read_wav_native", "resample_native", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libflowdec_audio.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "audio_io.cpp"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits", ctypes.c_int32),
        ("format", ctypes.c_int32),
        ("n_samples", ctypes.c_int64),
        ("data_offset", ctypes.c_int64),
        ("data_size", ctypes.c_int64),
    ]


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffast-math", "-funroll-loops",
         "-shared", "-fPIC", _SRC_PATH, "-o", _SO_PATH],
        check=True,
        capture_output=True,
    )


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native library; raises on failure."""
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            raise OSError("native audio library previously failed to build/load")
        try:
            if not os.path.exists(_SO_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
            ):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
        except Exception:
            _failed = True
            raise

        lib.wav_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_WavInfo)
        ]
        lib.wav_probe.restype = ctypes.c_int
        lib.wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_WavInfo),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.wav_decode.restype = ctypes.c_int
        lib.polyphase_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.polyphase_resample.restype = ctypes.c_int
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def read_wav_native(path: str, downmix: bool = False) -> Tuple[np.ndarray, int]:
    """WAV → ((channels, samples) or (1, samples) if downmix, sample_rate)."""
    lib = get_lib()
    with open(path, "rb") as f:
        raw = f.read()
    info = _WavInfo()
    rc = lib.wav_probe(raw, len(raw), ctypes.byref(info))
    if rc != 0:
        raise ValueError(f"{path}: not a decodable WAV (error {rc})")
    channels = 1 if downmix else info.channels
    out = np.empty((channels, info.n_samples), dtype=np.float32)
    rc = lib.wav_decode(
        raw, len(raw), ctypes.byref(info),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if downmix else 0,
    )
    if rc != 0:
        raise ValueError(f"{path}: unsupported WAV encoding (error {rc})")
    return out, int(info.sample_rate)


def resample_native(
    x: np.ndarray, orig_freq: int, new_freq: int, lowpass_filter_width: int = 128
) -> np.ndarray:
    """Polyphase resampling with the same kernel bank as ops.resample."""
    from flowdec_tpu.ops.resample import _kernel_np

    if orig_freq == new_freq:
        return np.asarray(x, np.float32)
    lib = get_lib()
    gcd = math.gcd(int(orig_freq), int(new_freq))
    o, n = int(orig_freq) // gcd, int(new_freq) // gcd
    kernels, width = _kernel_np(o, n, lowpass_filter_width, 0.99)
    kernels = np.ascontiguousarray(kernels, np.float32)

    x = np.ascontiguousarray(x, np.float32)
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    in_len = xf.shape[1]
    out_len = int(math.ceil(n * in_len / o))
    out = np.empty((xf.shape[0], out_len), dtype=np.float32)
    for row_in, row_out in zip(xf, out):
        rc = lib.polyphase_resample(
            row_in.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), in_len,
            kernels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            kernels.shape[0], kernels.shape[1], o, width,
            row_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len,
        )
        if rc != 0:
            raise RuntimeError(f"native resample failed ({rc})")
    return out.reshape(*lead, out_len)
