"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (the capability the
reference lacks — it can only test DDP on a real cluster).
"""

import os
import sys

# Force CPU: the surrounding environment may pre-select an experimental TPU
# platform that doesn't support everything the tests exercise.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402  (after env mutation, before any backend init)

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
