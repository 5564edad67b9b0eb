"""Pure-function DSP and resampling ops (L0/L3 of the reference layer map)."""

from flowdec_tpu.ops.compression import compress, compress_pair, decompress, decompress_pair
from flowdec_tpu.ops.cpair import (
    cabs,
    cabs2,
    cmul,
    crandn,
    crandn_like,
    from_cpair,
    to_cpair,
)
from flowdec_tpu.ops.fused_act import fused_leaky_relu
from flowdec_tpu.ops.chunking import extract_chunks, merge_chunks, plan_chunks
from flowdec_tpu.ops.padding import normalize_noisy, pad_spec, padded_num_frames, unpad_spec
from flowdec_tpu.ops.resample import resample
from flowdec_tpu.ops.stft import (
    StftConfig,
    get_window,
    hann_window,
    istft,
    istft_pair,
    stft,
    stft_pair,
)
from flowdec_tpu.ops.upfirdn import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_fir_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)

__all__ = [
    "compress",
    "compress_pair",
    "fused_leaky_relu",
    "decompress",
    "decompress_pair",
    "cabs",
    "cabs2",
    "cmul",
    "crandn",
    "crandn_like",
    "from_cpair",
    "to_cpair",
    "istft_pair",
    "stft_pair",
    "extract_chunks",
    "merge_chunks",
    "plan_chunks",
    "normalize_noisy",
    "pad_spec",
    "padded_num_frames",
    "unpad_spec",
    "resample",
    "StftConfig",
    "get_window",
    "hann_window",
    "istft",
    "stft",
    "conv_downsample_2d",
    "downsample_2d",
    "naive_downsample_2d",
    "naive_upsample_2d",
    "setup_fir_kernel",
    "upfirdn2d",
    "upsample_2d",
    "upsample_conv_2d",
]
