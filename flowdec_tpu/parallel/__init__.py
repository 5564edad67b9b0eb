"""Device mesh + sharding (the reference's DDP capability, TPU-native)."""

from flowdec_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    is_primary_host,
    make_mesh,
    replicated,
    shard_batch,
)
from flowdec_tpu.parallel.sequence import make_sequence_parallel_enhance
from flowdec_tpu.parallel.tensor import (
    make_sp_tp_enhance,
    make_tp_enhance,
    tp_param_shardings,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "is_primary_host",
    "make_mesh",
    "make_sequence_parallel_enhance",
    "make_sp_tp_enhance",
    "make_tp_enhance",
    "tp_param_shardings",
    "replicated",
    "shard_batch",
]
