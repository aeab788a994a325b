"""Ablate the SAN-M encoder layer cost on the live chip.

Times the full encoder forward at flagship shapes, then variants with
individual sublayers disabled, to attribute device time (the relay hides
per-op profiles; subtraction is the reliable probe here).

Usage: python tools/bench_encoder.py [--t 1200] [--layers 50]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fun_asr_vllm_tpu.models.encoder as enc


def timeit(fn, iters=5, repeats=3):
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
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=1200)
    ap.add_argument("--layers", type=int, default=50)
    args = ap.parse_args()

    cfg = enc.SANMEncoderConfig(num_blocks=args.layers, use_flash=True)
    params = enc.init_params(cfg, jax.random.PRNGKey(0))
    b, t = args.b, args.t
    speech = jax.random.normal(jax.random.PRNGKey(1), (b, t, 80), jnp.float32)
    lens = jnp.asarray(np.linspace(0.3 * t, t, b).astype(np.int32))

    # reduce to a scalar INSIDE the program: fetching the [B,T,D] output
    # over the relay costs ~130 ms and would swamp the compute signal
    @jax.jit
    def run_base(p, sp, ln):
        out, _ = enc.encode(p, cfg, sp, ln)
        return out.astype(jnp.float32).sum()

    base = timeit(lambda: run_base(params, speech, lens))
    print(f"full encode ({args.layers} layers, flash): {base*1e3:8.2f} ms")

    noflash_cfg = enc.SANMEncoderConfig(num_blocks=args.layers, use_flash=False)

    @jax.jit
    def run_noflash(p, sp, ln):
        out, _ = enc.encode(p, noflash_cfg, sp, ln)
        return out.astype(jnp.float32).sum()

    dt = timeit(lambda: run_noflash(params, speech, lens))
    print(f"XLA attention                 : {dt*1e3:8.2f} ms  (delta {1e3*(dt-base):+7.2f})")

    # ablations: monkeypatch sublayers to identity, re-trace
    orig_fsmn = enc._fsmn_memory
    orig_attn = enc._sanm_attention
    orig_ffn = enc._ffn
    orig_ln = enc.layer_norm

    def run_variant(name, patch):
        saved = {k: getattr(enc, k) for k in patch}
        try:
            for k, v in patch.items():
                setattr(enc, k, v)
            inner = enc.encode.__wrapped__

            @jax.jit
            def f(p, sp, ln):
                out, _ = inner(p, cfg, sp, ln)
                return out.astype(jnp.float32).sum()

            dt = timeit(lambda: f(params, speech, lens))
            print(f"{name:30s}: {dt*1e3:8.2f} ms  (delta {1e3*(dt-base):+7.2f})")
        finally:
            for k, v in saved.items():
                setattr(enc, k, v)

    run_variant("no FSMN conv", {
        "_fsmn_memory": lambda v, kern, mask, shift=0: v,
    })

    def attn_no_flash_no_mem(lp, cfg_, x, mask, lengths):
        bb, tt, _ = x.shape
        qkv = x @ lp["w_qkv"] + lp["b_qkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return q @ lp["w_out"] + lp["b_out"]  # keep the projections only

    run_variant("no attention core (proj only)", {
        "_sanm_attention": attn_no_flash_no_mem,
    })

    run_variant("no FFN", {"_ffn": lambda lp, x: x})

    run_variant("bf16 layer_norm", {
        "layer_norm": lambda x, s, bsc, eps=1e-12: (
            (x - x.mean(-1, keepdims=True))
            * jax.lax.rsqrt(x.var(-1, keepdims=True) + eps) * s + bsc
        ).astype(x.dtype),
    })


if __name__ == "__main__":
    main()
