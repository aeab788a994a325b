"""Probe: decode-burst throughput vs slot count (weight-stream amortization).

The decode burst is weight-read bound (~1.2 GB streamed per step,
BENCH_NOTES round-5 xplane decomposition); the engine runs
max_num_seqs=16 for reference-protocol parity (the reference pins
vLLM's max_num_seqs to its batch size 16, infer_kaldidata.py:648-658).
This probe quantifies the headroom the protocol leaves on the table:
the SAME weight stream serves S slots per step, so per-TOKEN cost
should fall ~linearly with S until attention/page traffic catches up.

Interleaved best-of rounds over S in {8, 16, 32, 64} at the bench's
short-context decode geometry (ctx ~120), full Qwen3-0.6B shapes, bf16,
XLA burst route (the engine default). Run on the real chip:
    python tools/probe_decode_slots.py
"""

from __future__ import annotations

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

from fun_asr_vllm_tpu.engine.kv_cache import (
    CacheConfig, decode_steps, init_cache,
)
from fun_asr_vllm_tpu.models.qwen3 import Qwen3Config, init_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=str, default="8,16,32,64")
    ap.add_argument("--ctx", type=int, default=120)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    slot_counts = [int(s) for s in args.slots.split(",")]

    cfg = Qwen3Config()  # full 0.6B shapes
    params = init_params(cfg, jax.random.PRNGKey(0))
    print(f"# devices: {jax.devices()}  ctx={args.ctx} "
          f"steps/burst={args.steps}")

    states = {}
    for s in slot_counts:
        bs = 16
        need = -(-(args.ctx + args.steps) // bs)
        cc = CacheConfig(num_blocks=1 + s * need, block_size=bs,
                         max_blocks_per_seq=need)
        k_cache, v_cache = init_cache(cfg, cc)
        bt = np.zeros((s, need), np.int32)
        for i in range(s):
            bt[i] = 1 + i * need + np.arange(need)
        states[s] = dict(
            k=k_cache, v=v_cache,
            tok=jnp.asarray(np.full(s, 11, np.int32)),
            pos=jnp.asarray(np.full(s, args.ctx, np.int32)),
            bt=jnp.asarray(bt),
            lens=jnp.asarray(np.full(s, args.ctx + 1, np.int32)),
            act=jnp.ones(s, bool),
        )

    def run(s):
        st = states[s]
        toks, st["k"], st["v"] = decode_steps(
            params, cfg, st["k"], st["v"], st["tok"], st["pos"],
            st["bt"], st["lens"], st["act"], num_steps=args.steps,
            use_pallas=False, eos_ids=None, early_exit=False,
            chunked_kernel=False,
        )
        # keep positions fixed (re-time the same geometry every iter)
        return toks

    for s in slot_counts:  # compile
        t0 = time.perf_counter()
        run(s).block_until_ready()
        print(f"# S={s} compiled in {time.perf_counter()-t0:.1f}s")

    best = {s: [] for s in slot_counts}
    for _ in range(args.rounds):
        for s in slot_counts:
            # launch-N, sync-once (np.asarray forces the fetch): per-call
            # block_until_ready under-reports on the async relay
            np.asarray(run(s))
            t0 = time.perf_counter()
            last = None
            for _ in range(args.iters):
                last = run(s)
            np.asarray(last)
            best[s].append((time.perf_counter() - t0) / args.iters)

    base = None
    for s in slot_counts:
        b = min(best[s]) / args.steps  # s/step
        tok_ms = b * 1e3 / s
        if base is None:
            base = tok_ms
        print(f"S={s:3d}: {b*1e3:6.2f} ms/step  {tok_ms:6.3f} ms/token "
              f"({base/tok_ms:4.2f}x cheaper per token than "
              f"S={slot_counts[0]})")


if __name__ == "__main__":
    main()
