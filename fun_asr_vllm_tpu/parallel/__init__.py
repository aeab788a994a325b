"""Parallelism layer: device mesh, sharding rules, sharded train/infer steps.

The reference's parallelism is process-per-GPU data parallelism with
file-based merge (reference infer_kaldidata.py:493-544, 1064-1143) and a
pinned-off vLLM tensor-parallel axis (tensor_parallel_size=1,
infer_kaldidata.py:657). Here both are first-class mesh axes:

- `dp` shards batches; multi-host runs ride ICI/DCN via jax.distributed,
- `tp` shards attention heads / MLP hidden of the Qwen3 decoder and the
  encoder FFNs (Megatron-style column→row pairs via pjit constraint-solved
  shardings),

with XLA inserting the collectives (psum on row-parallel outputs) — no
NCCL analogue to hand-write.
"""

from .mesh import make_mesh, qwen3_param_sharding, shard_params

__all__ = ["make_mesh", "qwen3_param_sharding", "shard_params"]
