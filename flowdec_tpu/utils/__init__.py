"""Shared utilities: registries, logging, PRNG helpers."""

from flowdec_tpu.utils.registry import Registry
from flowdec_tpu.utils.logging import get_logger, log

__all__ = ["Registry", "get_logger", "log"]
