"""Shared jax platform/backend setup for the CLIs.

Every CLI that honors `--device cpu` or `--distributed` needs the same
two snippets; a drift between copies (e.g. a fix applied to one CLI
only) is exactly the bug class a shared helper removes.
"""

from __future__ import annotations

import os


def force_cpu_backend() -> None:
    """Route this process onto the CPU backend (`--device cpu`).

    The axon/TPU plugin registers at interpreter boot and pins
    jax_platforms, so the JAX_PLATFORMS env var alone is too late once
    inside main — set the jax config directly. Backends are not
    initialized until the first device op, so this still lands.
    FUN_ASR_PLATFORM is also set so child processes (worker pools)
    inherit the choice via the package __init__.
    """
    os.environ.setdefault("FUN_ASR_PLATFORM", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """`jax.distributed.initialize` with the CPU-federation fallback.

    CPU processes federate via the gloo collectives backend (the
    2-process CI test path, tests/test_distributed_cli.py); TPU hosts
    use the native ICI/DCN path and ignore the setting. Must run before
    the backend initializes.
    """
    import jax

    plat = str(jax.config.jax_platforms
               or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in plat:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
