"""Probe: pin the KV-cache device layout across burst dispatches.

The round-5 xplane decomposition (BENCH_NOTES) showed ~2.2 ms/burst of
whole-cache [28,257,8,16,128] layout copies at burst entry/exit: XLA
picks an internal layout for the hoisted page gather / final scatter
that differs from the caches' committed parameter layout, so every
dispatch relays the multi-hundred-MB caches in and back out.

This probe (a) discovers the layout the compiled burst program PREFERS
for its cache inputs/outputs via `Layout.AUTO`, and (b) interleave-times
the status-quo default-layout burst against one whose cache arrays are
device_put into the preferred layout with matching in/out Formats
(donated, so XLA can alias). If the pin wins, the engine adopts it.

Usage: python tools/probe_burst_layout.py [--ctx 120] [--steps 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

from fun_asr_vllm_tpu.engine.kv_cache import (
    CacheConfig, _burst_core, init_cache,
)
from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=120)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--block_size", type=int, default=16)
    ap.add_argument("--max_model_len", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    cfg = qwen3_mod.Qwen3Config(use_flash=True)
    params = qwen3_mod.init_params(cfg, jax.random.PRNGKey(0))
    s, K, ctx = args.slots, args.steps, args.ctx
    bs = args.block_size
    mb = args.max_model_len // bs
    cc = CacheConfig(num_blocks=s * mb + 1, block_size=bs,
                     max_blocks_per_seq=mb)
    k_cache, v_cache = init_cache(cfg, cc)
    print(f"cache shape {k_cache.shape} default layout "
          f"{k_cache.format.layout.major_to_minor}", flush=True)

    bt = jnp.asarray((1 + np.arange(s * mb).reshape(s, mb)).astype(np.int32))
    positions = jnp.full((s,), ctx, jnp.int32)
    seq_lens = positions + 1
    ti = jnp.ones((s,), jnp.int32)
    active = jnp.ones((s,), bool)

    def core(p, kc, vc):
        toks, kc2, vc2 = _burst_core(
            p, cfg, kc, vc, ti, positions, bt, seq_lens, active,
            num_steps=K, use_pallas=False, chunked_kernel=True)
        return toks, kc2, vc2

    # --- discover the program's preferred cache layouts -----------------
    probe = jax.jit(
        core,
        in_shardings=(None, Format(Layout.AUTO), Format(Layout.AUTO)),
        out_shardings=(None, Format(Layout.AUTO), Format(Layout.AUTO)),
    )
    comp = probe.lower(params, k_cache, v_cache).compile()
    in_fmts = comp.input_formats[0]
    out_fmts = comp.output_formats
    kc_in, vc_in = in_fmts[1], in_fmts[2]
    kc_out, vc_out = out_fmts[1], out_fmts[2]
    print("AUTO in  k:", kc_in.layout.major_to_minor,
          " v:", vc_in.layout.major_to_minor, flush=True)
    print("AUTO out k:", kc_out.layout.major_to_minor,
          " v:", vc_out.layout.major_to_minor, flush=True)

    # --- variant A: status quo (default layouts, default jit) -----------
    run_def = jax.jit(core, donate_argnums=(1, 2))
    kd, vd = init_cache(cfg, cc)
    toks, kd, vd = run_def(params, kd, vd)
    np.asarray(toks)
    print("default compiled", flush=True)

    # --- variant B: caches pinned to the AUTO-preferred layout ----------
    # in == out format + donation → XLA can alias, no entry/exit copy
    run_pin = jax.jit(
        core,
        in_shardings=(None, kc_in, vc_in),
        out_shardings=(None, kc_in, vc_in),
        donate_argnums=(1, 2),
    )
    kp, vp = init_cache(cfg, cc)
    kp = jax.device_put(kp, kc_in)
    vp = jax.device_put(vp, vc_in)
    toks_p, kp, vp = run_pin(params, kp, vp)
    np.asarray(toks_p)
    print("pinned compiled; tokens equal:",
          bool(jnp.array_equal(toks, toks_p)), flush=True)

    times = {"default": [], "pinned ": []}
    for rr in range(args.rounds):
        for name in times:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                if name == "default":
                    toks, kd, vd = run_def(params, kd, vd)
                else:
                    toks, kp, vp = run_pin(params, kp, vp)
            np.asarray(toks)
            times[name].append((time.perf_counter() - t0) / args.iters)
    for n, ts in times.items():
        ts = sorted(ts)
        print(f"{n}: best {ts[0]*1e3:7.2f}  med {ts[len(ts)//2]*1e3:7.2f} "
              f"ms/burst ({ts[0]/K*1e3:5.2f} ms/step best)", flush=True)
    print(f"ratio pinned/default (best): "
          f"{sorted(times['pinned '])[0]/sorted(times['default'])[0]:.3f}")


if __name__ == "__main__":
    main()
