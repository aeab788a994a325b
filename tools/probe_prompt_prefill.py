"""Interleaved A/B of the packed prompt-prefill attention routes.

Relay throughput drifts minute-to-minute (same jit measured 59 vs 84 ms
in two sessions), so each round times every variant back-to-back and the
per-variant BEST over rounds is compared — drift hits all variants
equally inside a round.

Usage: python tools/probe_prompt_prefill.py [--rounds 5] [--iters 20]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stretch", type=float, default=1.0,
                    help="tile utterances by this factor (longer prompts "
                         "-> wider one-shot window; finds the crossover)")
    ap.add_argument("--extra_kwr", type=str, default="",
                    help="comma list of FORCED one-shot window rows to time "
                         "in addition to the plan's natural window (each "
                         "must be >= the natural window for correctness); "
                         "isolates window-width cost at a fixed workload")
    ap.add_argument("--variants", type=str, default="online,oneshot,dense",
                    help="comma subset of online,oneshot,dense to compile")
    args = ap.parse_args()

    from bench import synth_utterances
    from fun_asr_vllm_tpu.audio.frontend import WavFrontend
    from fun_asr_vllm_tpu.engine.kv_cache import (
        CacheConfig, _prefill_core_packed, init_cache,
    )
    from fun_asr_vllm_tpu.engine.packed import (
        plan_frame_pack, plan_prompt_pack,
    )
    from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod
    from fun_asr_vllm_tpu.models.adaptor import downsampled_length

    llm_cfg = qwen3_mod.Qwen3Config(use_flash=True, dtype=jnp.bfloat16)
    llm_params = qwen3_mod.init_params(llm_cfg, jax.random.PRNGKey(0))

    utts = synth_utterances(480.0)[:16]
    if args.stretch != 1.0:
        # fractional stretches supported: tile up then trim (2.25 means
        # each utterance is 2.25x its base length, not round(2.25)=2x)
        utts = [np.tile(u, int(np.ceil(args.stretch)))
                [: int(len(u) * args.stretch)] for u in utts]
    frontend = WavFrontend(dither=0.0, bucket_seconds=4.0)
    frames = np.asarray([frontend.frame_count(len(u)) for u in utts],
                        np.int32)
    fp = plan_frame_pack(frames, 2048)
    p, q, bs_blk = 12, 5, 16
    prompt_lens = np.asarray(
        [p + downsampled_length(int(f)) + q for f in frames], np.int64)
    need = -(-(int(prompt_lens.max()) + 17) // bs_blk)
    mbu = -(-need // 8) * 8
    tables = np.arange(1, 16 * mbu + 1, dtype=np.int32).reshape(16, mbu)
    ppk = plan_prompt_pack(p, q, fp.tok_starts, fp.tok_counts, tables,
                           bs_blk)
    cc = CacheConfig(num_blocks=16 * mbu + 1, block_size=bs_blk,
                     max_blocks_per_seq=mbu, dtype=jnp.bfloat16)
    k_cache, v_cache = init_cache(llm_cfg, cc)

    rng = np.random.default_rng(2)
    embeds = jnp.asarray(rng.normal(
        scale=0.3, size=(ppk.ttp, llm_cfg.hidden_size)).astype(np.float32))
    p_pos = jnp.asarray(ppk.pos_ids)
    p_seg = jnp.asarray(ppk.seg_ids)
    wb = jnp.asarray(ppk.write_blocks)
    wo = jnp.asarray(ppk.write_offsets)
    last_idx = jnp.asarray(ppk.last_idx)
    plens32 = jnp.asarray(prompt_lens.astype(np.int32))
    pad_i = jnp.asarray(ppk.pad_idx)
    unpad_i = jnp.asarray(ppk.unpad_idx)
    print(f"# ttp={ppk.ttp} lens {prompt_lens.min()}-{prompt_lens.max()} "
          f"kw={ppk.k_window} kwr={ppk.k_window_rows} "
          f"dlm={ppk.dense_lmax}", file=sys.stderr)

    def mk(use_flash, kw, kwr, dense):
        @jax.jit
        def s_pf(pms, kc, vc, emb):
            return _prefill_core_packed(
                pms, llm_cfg, kc, vc, emb, p_pos, p_seg, wb, wo, last_idx,
                use_flash=use_flash, k_window=kw, k_window_rows=kwr,
                pad_idx=pad_i if dense else None,
                unpad_idx=unpad_i if dense else None,
                lens=plens32 if dense else None, dense_lmax=dense)
        return s_pf

    wanted = {v.strip() for v in args.variants.split(",") if v.strip()}
    variants = {}
    if "online" in wanted:
        variants["online "] = mk(True, ppk.k_window, 0, 0)
    if "oneshot" in wanted:
        variants["oneshot"] = mk(True, ppk.k_window, ppk.k_window_rows, 0)
    if "dense" in wanted:
        variants["dense  "] = mk(True, 0, 0, ppk.dense_lmax)
    for tok in (t for t in args.extra_kwr.split(",") if t.strip()):
        kwr = int(tok)
        if kwr < ppk.k_window_rows:
            raise SystemExit(f"--extra_kwr {kwr} < natural window "
                             f"{ppk.k_window_rows}: results would be wrong")
        variants[f"os@{kwr}"] = mk(True, ppk.k_window, kwr, 0)
    best = {n: [] for n in variants}
    for name, fn in variants.items():  # compile warmup
        r = fn(llm_params, k_cache, v_cache, embeds)
        np.asarray(r[0][1])
    for rnd in range(args.rounds):
        row = []
        for name, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(llm_params, k_cache, v_cache, embeds)
            np.asarray(r[0][1])
            dt = (time.perf_counter() - t0) / args.iters
            best[name].append(dt)
            row.append(f"{name}={dt*1e3:6.2f}")
        print(f"round {rnd}: " + "  ".join(row))
    print("--- best of rounds ---")
    for name, ds in best.items():
        print(f"{name}: {min(ds)*1e3:7.2f} ms  (median "
              f"{sorted(ds)[len(ds)//2]*1e3:.2f})")


if __name__ == "__main__":
    main()
