"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first), so the
sharding tests can exercise real pjit/shard_map layouts without TPU chips.
"""

import os
import sys

# tools/ holds shared test support (torch funasr mini-references,
# checkpoint fabricator) importable by tests
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools")
)

os.environ["JAX_PLATFORMS"] = "cpu"  # the env presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize registers the TPU backend at interpreter boot and
# pins jax_platforms — override via config, env alone is too late
jax.config.update("jax_platforms", "cpu")

# f32 matmuls at full precision for golden/parity tests (JAX's DEFAULT
# reduces matmul precision, ~1e-3 error vs torch f32). Production code runs
# bf16 regardless.
jax.config.update("jax_default_matmul_precision", "highest")
