"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first), so the
sharding tests can exercise real pjit/shard_map layouts without TPU chips.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
