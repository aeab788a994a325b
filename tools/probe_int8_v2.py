"""Interleaved bf16-v2 vs int8-v2 long-context burst ratio.

VERDICT r4 weak #3 asked for int8 KV pages on the v2 chunked
long-context kernel. The routing landed in round 4 (the scale pages
ride a lane-aligned XLA window gather, ~3% of the page bytes —
ops/paged_attention.py paged_attention_pallas_stats_v2); this probe
pins the RATIO with compile-once, interleaved rounds so relay clock
drift (up to 26x within a session) cancels. Round-5 measurement at
ctx 1900 / bs 16 / 16 slots / 16-step bursts: int8 = 0.72x bf16
ms/step (full burst including the weight streaming that int8 pages
cannot help; the kernel-only page-read gap is larger).

Usage: python tools/probe_int8_v2.py
"""
import sys, time, os
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
import jax.numpy as jnp, numpy as np
from fun_asr_vllm_tpu.engine.kv_cache import CacheConfig, _burst_core, init_cache
from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod

cfg = qwen3_mod.Qwen3Config(use_flash=True)
params = qwen3_mod.init_params(cfg, jax.random.PRNGKey(0))
s, K, ctx, mm = 16, 16, 1900, 2048
bs = 16
mb = mm // bs
variants = {}
for name, quant in (("bf16", False), ("int8", True)):
    cc = CacheConfig(num_blocks=s * mb + 1, block_size=bs,
                     max_blocks_per_seq=mb, kv_quant=quant)
    k_cache, v_cache = init_cache(cfg, cc)
    bt = jnp.asarray((1 + np.arange(s * mb).reshape(s, mb)).astype(np.int32))
    positions = jnp.full((s,), ctx, jnp.int32)
    seq_lens = positions + 1
    ti = jnp.ones((s,), jnp.int32)
    active = jnp.ones((s,), bool)

    @jax.jit
    def run(p, kc, vc, ti, bt, positions=positions, seq_lens=seq_lens,
            active=active):
        toks, kc2, vc2 = _burst_core(
            p, cfg, kc, vc, ti, positions, bt, seq_lens, active,
            num_steps=K, chunked_kernel=True, use_pallas=True)
        return toks.sum()
    r = run(params, k_cache, v_cache, ti, bt); np.asarray(r)
    variants[name] = (run, k_cache, v_cache, ti, bt)
    print(f"{name} compiled", flush=True)

R, I = 8, 3
times = {n: [] for n in variants}
for rr in range(R):
    for n, (run, kc, vc, ti, bt) in variants.items():
        t0 = time.perf_counter()
        for _ in range(I):
            out = run(params, kc, vc, ti, bt)
        np.asarray(out)
        times[n].append((time.perf_counter() - t0) / I)
for n in times:
    ts = sorted(times[n])
    print(f"{n}: best {ts[0]/K*1e3:6.2f}  med {ts[len(ts)//2]/K*1e3:6.2f} ms/step", flush=True)
print(f"ratio int8/bf16 (best): {sorted(times['int8'])[0]/sorted(times['bf16'])[0]:.2f}")
