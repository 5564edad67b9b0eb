"""Data pipeline: WAV I/O, paired datasets, prefetching loaders (L5)."""

from flowdec_tpu.data.dataset import (
    BatchLoader,
    PairedAudioDataModule,
    PairedAudioFiles,
    resample_np,
)
from flowdec_tpu.data.wavio import read_wav, write_wav

__all__ = [
    "BatchLoader",
    "PairedAudioDataModule",
    "PairedAudioFiles",
    "resample_np",
    "read_wav",
    "write_wav",
]
