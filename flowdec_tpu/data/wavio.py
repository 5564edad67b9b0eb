"""Dependency-free WAV read/write (RIFF/WAVE): PCM 8/16/24/32 and IEEE float.

The reference leans on torchaudio for decoding (data_module.py:131,
util/other.py:146); this framework ships its own numpy decoder so the data
pipeline has no torch dependency. (Non-WAV container support is gated: raise
with a clear message.)
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

__all__ = ["read_wav", "write_wav"]

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file → (float32 array of shape (channels, samples), sample_rate).

    Integer PCM is scaled to [-1, 1) by the type's full scale.
    """
    with open(path, "rb") as f:
        riff, _size, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file (got {riff!r}/{wave!r})")

        fmt = None
        data = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            chunk_id, chunk_size = struct.unpack("<4sI", header)
            if chunk_id == b"fmt ":
                fmt = f.read(chunk_size)
            elif chunk_id == b"data":
                data = f.read(chunk_size)
            else:
                f.seek(chunk_size + (chunk_size & 1), 1)
            if fmt is not None and data is not None:
                break

    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")

    (audio_format, channels, sample_rate, _byte_rate, _block_align, bits) = (
        struct.unpack("<HHIIHH", fmt[:16])
    )
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        # sub-format GUID starts with the effective format code
        audio_format = struct.unpack("<H", fmt[24:26])[0]

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            as_int = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            as_int = np.where(as_int >= 1 << 23, as_int - (1 << 24), as_int)
            x = as_int.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        dtype = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dtype).astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported WAV format code {audio_format:#x}")

    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels).T.copy(), sample_rate


def write_wav(path: str, x: np.ndarray, sample_rate: int, *, dtype: str = "int16") -> None:
    """Write (channels, samples) or (samples,) float audio as WAV."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[None]
    channels, _n = x.shape
    interleaved = x.T.reshape(-1)

    if dtype == "int16":
        payload = (
            np.clip(interleaved, -1.0, 1.0 - 1.0 / 32768.0) * 32768.0
        ).astype("<i2").tobytes()
        bits, fmt_code = 16, _WAVE_FORMAT_PCM
    elif dtype == "float32":
        payload = interleaved.astype("<f4").tobytes()
        bits, fmt_code = 32, _WAVE_FORMAT_IEEE_FLOAT
    else:
        raise ValueError(f"unsupported write dtype {dtype}")

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(
            struct.pack(
                "<IHHIIHH", 16, fmt_code, channels, sample_rate, byte_rate, block_align, bits
            )
        )
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
