"""Microbenchmark the encoder flash-attention kernel on the live chip.

Shapes match the flagship encoder hot path: [B=16, T≈1200, H=4, D=128]
(SAN-M encoder, 50 layers — BENCH_NOTES round-2 device-time split puts
flash attention at ~127 ms of a 3-wave epoch, ~12x off MXU SoL).

Usage: python tools/bench_flash.py [--t 1200] [--iters 20]
"""
import argparse
import os
import sys
import time

# NOTE: do not use PYTHONPATH for this — it leaks into the axon TPU
# plugin's helper process and breaks backend init; amend sys.path here.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fun_asr_vllm_tpu.ops.flash_attention import flash_attention
from fun_asr_vllm_tpu.ops.attention import full_attention


def timeit(fn, iters, repeats=3):
    """Median-of-repeats wall time per call; each measured run chains
    `iters` dispatches and synchronizes with a real fetch (the relay's
    block_until_ready is enqueue-only — BENCH_NOTES round 2)."""
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])  # compile + warm
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
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=1200)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=50)
    args = ap.parse_args()

    b, t, h, d = args.b, args.t, args.h, args.d
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)
    # ragged lengths like a real batch (2-15 s → 200-1500 frames)
    lens = jnp.asarray(
        np.linspace(0.3 * t, t, b).astype(np.int32)
    )

    layers = args.layers
    flops = 4 * b * h * t * t * d * layers  # 2 matmuls x 2 flops/MAC
    configs = [
        ("auto (current)", dict()),
        ("512x512", dict(block_q=512, block_k=512)),
        ("1024x512", dict(block_q=1024, block_k=512)),
        ("512x1024", dict(block_q=512, block_k=1024)),
        ("256x1024", dict(block_q=256, block_k=1024)),
        ("1024x1024", dict(block_q=1024, block_k=1024)),
        ("whole-seq", dict(block_q=1280, block_k=1280)),
    ]
    print(f"shapes q/k/v [{b},{t},{h},{d}] x {layers} layers  "
          f"flops/call {flops/1e9:.1f} G")

    def chain(attn_fn):
        # mimic the encoder: `layers` sequential attention calls inside
        # one program so transport overhead amortizes away
        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                out = attn_fn(acc, k, v)
                return (out * 0.5 + acc * 0.5).astype(acc.dtype)
            # scalar output: fetching the full [B,T,H,D] tensor over the
            # relay costs ~60+ ms and would swamp the kernel signal
            return jax.lax.fori_loop(0, layers, body, q).astype(
                jnp.float32).sum()
        return lambda: run(q, k, v)

    for name, kw in configs:
        try:
            fn = chain(lambda qq, kk, vv: flash_attention(
                qq, kk, vv, lens, causal=False, **kw))
            dt = timeit(fn, args.iters)
            print(f"{name:16s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s"
                  f"  ({dt/layers*1e3:.3f} ms/layer)")
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")
    fn = chain(lambda qq, kk, vv: full_attention(qq, kk, vv, kv_lengths=lens))
    dt = timeit(fn, args.iters)
    print(f"{'XLA full':16s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s"
          f"  ({dt/layers*1e3:.3f} ms/layer)")


if __name__ == "__main__":
    main()
