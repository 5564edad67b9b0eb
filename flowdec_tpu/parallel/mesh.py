"""Device-mesh and sharding helpers.

The reference's entire distributed story is Lightning DDP over NCCL
(SURVEY.md §2.8; config/global_defaults.yaml strategy: ddp). The TPU-native
equivalent is ONE jax.sharding.Mesh: data-parallel batch sharding with
replicated params — gradient all-reduce falls out of pjit as an XLA psum over
ICI. Multi-host (multi-slice) runs initialize jax.distributed and put 'data'
across hosts so the all-reduce rides ICI within a slice and DCN across.

Axes:
  data  — batch dimension (DP). The only axis the reference's capability
          requires; gradient sync = psum inserted by XLA.
  model — reserved for tensor-sharded variants (exposed so meshes are
          forward-compatible; FlowDec's 25-75M U-Net fits on one chip).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "fsdp_sharding",
    "initialize_distributed",
    "is_primary_host",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of per-host batch arrays with leading-axis DP sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def fsdp_sharding(tree, mesh: Mesh, *, min_size: int = 2**16, axis: str = DATA_AXIS):
    """Per-leaf ZeRO-3-style shardings: shard each large parameter's largest
    evenly-divisible axis over `axis`; replicate small leaves.

    A capability the reference lacks entirely (no FSDP/ZeRO, SURVEY.md §2.8):
    optimizer + EMA + param memory scales down ~linearly with mesh size; XLA
    inserts the all-gathers (params) and reduce-scatters (grads) implied by
    the shardings.
    """
    n = mesh.shape[axis]

    def leaf_sharding(x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if size < min_size:
            return NamedSharding(mesh, P())
        # largest axis divisible by the mesh axis size
        candidates = [(d, i) for i, d in enumerate(shape) if d % n == 0]
        if not candidates:
            return NamedSharding(mesh, P())
        _, best = max(candidates)
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf_sharding, tree)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (the moral equivalent of the reference's
    SLURM/NCCL env plumbing, train.py:155-186). No-ops on a single host.

    Honors standard cluster env vars via jax.distributed auto-detection when
    called without arguments inside a supported cluster (incl. SLURM).
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process / no cluster detected — fine
        pass


def is_primary_host() -> bool:
    """Rank-0 gate for logging/checkpoint side effects (parity with
    IS_RANK_ZERO, reference train.py:34-38)."""
    return jax.process_index() == 0
