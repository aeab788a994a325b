"""Isolated paged-attention-kernel probe (one layer, no transformer).

Separates the long-context decode question — is the v2 chunked kernel
itself the bottleneck, or the surrounding step (weight reads, XLA glue)?
Times `paged_attention_pallas_stats_v2` alone at burst shapes, bf16 vs
int8 pages, plus the pure DMA floor (same bytes via a dynamic-slice sum).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=50, repeats=3):
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best.append((time.perf_counter() - t0) / iters)
    return min(best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1900)
    ap.add_argument("--mm_len", type=int, default=2048)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--nkv", type=int, default=8)
    ap.add_argument("--nq", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--chunk_tokens", type=int, default=512)
    ap.add_argument("--num_buffers", type=int, default=2)
    args = ap.parse_args()

    from fun_asr_vllm_tpu.ops.paged_attention import (
        paged_attention_pallas_stats_v2,
    )

    s, bs, nkv, nq, d = args.s, args.bs, args.nkv, args.nq, args.d
    mb = args.mm_len // bs
    nb = s * mb + 1
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (s, nq, d), jnp.bfloat16)
    if args.kv_quant:
        k_cache = {"q": jax.random.randint(key, (nb, nkv, bs, d), -127, 128,
                                           jnp.int8),
                   "s": jnp.full((nb, nkv, bs, 1), 0.01, jnp.float32)}
        v_cache = {"q": jax.random.randint(key, (nb, nkv, bs, d), -127, 128,
                                           jnp.int8),
                   "s": jnp.full((nb, nkv, bs, 1), 0.01, jnp.float32)}
        kv_bytes = 2 * nb * bs * nkv * d
    else:
        k_cache = jax.random.normal(key, (nb, nkv, bs, d), jnp.bfloat16)
        v_cache = jax.random.normal(key, (nb, nkv, bs, d), jnp.bfloat16)
        kv_bytes = 2 * nb * bs * nkv * d * 2
    block_tables = jnp.asarray(
        (1 + np.arange(s * mb).reshape(s, mb)).astype(np.int32))
    seq_lens = jnp.full((s,), args.ctx + 1, jnp.int32)

    fn = jax.jit(lambda q_, kc, vc, bt, sl: paged_attention_pallas_stats_v2(
        q_, kc, vc, bt, sl, chunk_tokens=args.chunk_tokens,
        num_buffers=args.num_buffers)[0].sum())
    dt = timeit(lambda: fn(q, k_cache, v_cache, block_tables, seq_lens))
    used = 2 * s * (args.ctx + 1) * nkv * d * (1 if args.kv_quant else 2)
    print(f"kernel: {dt*1e3:7.3f} ms  | window bytes {kv_bytes/1e6:.0f} MB, "
          f"live bytes {used/1e6:.0f} MB -> {used/dt/1e9:.0f} GB/s")

    # pure-read floor over the same pages: elementwise sum of the caches
    if not args.kv_quant:
        rd = jax.jit(lambda kc, vc: (kc.astype(jnp.float32).sum()
                                     + vc.astype(jnp.float32).sum()))
        dt2 = timeit(lambda: rd(k_cache, v_cache))
        print(f"xla full-cache reduce: {dt2*1e3:7.3f} ms -> "
              f"{kv_bytes/dt2/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
