"""Long-context decode-burst probe: block_size ladder on the chunked route.

Measures `_burst_core` ms/step at multiturn-session context lengths
(default ctx 1900 in a 2048-token window, 16 slots, 16-step bursts) for
each requested page size, on both the chunked streaming Pallas kernel
(v2) and the per-layer XLA gather — the two long-context routes in
`engine/kv_cache.py::_burst_core`. BENCH_NOTES round-3 named the DMA
issue rate on scattered 32 KB (block_size 16) pages as the remaining
gap to the byte floor; bigger pages amortize it.

Usage: python tools/bench_longctx.py [--ctx 1900] [--bs 16 32 64 128]
       [--kv_quant]
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
    ap.add_argument("--s", type=int, default=16, help="slots")
    ap.add_argument("--ctx", type=int, default=1900)
    ap.add_argument("--mm_len", type=int, default=2048,
                    help="window (max_model_len): MB = mm_len/block_size")
    ap.add_argument("--num_steps", type=int, default=16)
    ap.add_argument("--bs", type=int, nargs="+", default=[16, 32, 64, 128])
    ap.add_argument("--kv_quant", action="store_true",
                    help="int8 pages + f32 scales")
    ap.add_argument("--routes", type=str, nargs="+",
                    default=["v2", "xla"], choices=("v2", "xla"))
    ap.add_argument("--use_pallas", action="store_true",
                    help="use_pallas=True: route v2 = chunked kernel at "
                         "ANY window, route xla = v1 page kernel "
                         "(without it both routes ride the XLA gathers "
                         "below the v2 window thresholds)")
    ap.add_argument("--chunk_tokens", type=int, nargs="+", default=[0],
                    help="v2 kernel chunk sweep (0 = kernel default); "
                         "patches the kernel default per run")
    ap.add_argument("--num_buffers", type=int, nargs="+", default=[2],
                    help="v2 kernel DMA slot-depth sweep")
    args = ap.parse_args()

    from fun_asr_vllm_tpu.engine.kv_cache import (
        CacheConfig, _burst_core, init_cache,
    )
    from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod

    cfg = qwen3_mod.Qwen3Config(use_flash=True)
    key = jax.random.PRNGKey(0)
    params = qwen3_mod.init_params(cfg, key)
    s, K = args.s, args.num_steps

    print(f"# S={s} ctx={args.ctx} window={args.mm_len} burst={K} "
          f"kv_quant={args.kv_quant}")
    for bs in args.bs:
        if args.mm_len % bs:
            print(f"bs={bs:4d}: skipped (window not a multiple)")
            continue
        mb = args.mm_len // bs
        cc = CacheConfig(num_blocks=s * mb + 1, block_size=bs,
                         max_blocks_per_seq=mb, kv_quant=args.kv_quant)
        # zero pages are fine for timing (TPU has no sparsity shortcut)
        k_cache, v_cache = init_cache(cfg, cc)
        block_tables = jnp.asarray(
            (1 + np.arange(s * mb).reshape(s, mb)).astype(np.int32))
        positions = jnp.full((s,), args.ctx, jnp.int32)
        seq_lens = positions + 1
        token_ids = jnp.ones((s,), jnp.int32)
        active = jnp.ones((s,), bool)

        import functools

        from fun_asr_vllm_tpu.ops import paged_attention as pa_mod
        v2_orig = pa_mod.paged_attention_pallas_stats_v2

        for route in args.routes:
            chunked = route == "v2"
            for ct, nb_ in [(c, n)
                            for c in (args.chunk_tokens if chunked else [0])
                            for n in (args.num_buffers if chunked else [2])]:
                kw = {}
                if ct:
                    kw["chunk_tokens"] = ct
                if nb_ != 2:
                    kw["num_buffers"] = nb_
                pa_mod.paged_attention_pallas_stats_v2 = (
                    v2_orig if not kw
                    else functools.partial(v2_orig, **kw))

                @jax.jit
                def run(p, kc, vc, ti, bt):
                    toks, kc, vc = _burst_core(
                        p, cfg, kc, vc, ti, positions, bt, seq_lens,
                        active, num_steps=K, chunked_kernel=chunked,
                        use_pallas=args.use_pallas)
                    return toks.sum()

                tag = (f" ct={ct:5d} nb={nb_}" if chunked
                       else "              ")
                try:
                    dt = timeit(lambda: run(params, k_cache, v_cache,
                                            token_ids, block_tables))
                except Exception as e:  # noqa: BLE001 — probe tool
                    print(f"bs={bs:4d} route={route:3s}{tag}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                finally:
                    pa_mod.paged_attention_pallas_stats_v2 = v2_orig
                print(f"bs={bs:4d} route={route:3s}{tag}: {dt*1e3:8.2f} ms "
                      f"burst = {dt/K*1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
