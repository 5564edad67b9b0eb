"""NDAC codec (DAC-style residual-VQ audio codec) in JAX."""

from flowdec_tpu.codec.ndac import NDAC, NDACConfig, ResidualVectorQuantizer, snake

__all__ = ["NDAC", "NDACConfig", "ResidualVectorQuantizer", "snake"]
