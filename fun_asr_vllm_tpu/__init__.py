"""fun_asr_vllm_tpu — a TPU-native speech-LLM ASR framework.

From-scratch re-design of the capabilities of duj12/Fun-ASR-vllm
(reference mounted read-only at /root/reference) for TPU hardware:

- JAX/XLA/Pallas compute path (audio frontend, SAN-M encoder, adaptor,
  Qwen3 decoder) instead of torch/CUDA,
- a continuous-batching paged-KV serving engine (the vLLM analogue,
  reference model.py:645-653) built on jitted step functions with
  bucketed compiled shapes,
- pjit/shard_map data/tensor parallelism over a jax.sharding.Mesh
  instead of process-per-GPU multiprocessing,
- the reference's CPU surfaces (WER/CER scoring, TN/ITN, Kaldi data
  tooling, WebSocket serving protocol, data factory) re-implemented
  natively.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("FUN_ASR_PLATFORM"):
    # force a JAX platform (e.g. FUN_ASR_PLATFORM=cpu for host-only runs).
    # Some environments pre-register a TPU plugin at interpreter boot, so
    # the env var JAX_PLATFORMS alone can be too late — use the config API.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FUN_ASR_PLATFORM"])
