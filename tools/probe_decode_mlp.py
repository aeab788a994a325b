"""Probe: decode-burst MLP — XLA dots vs a fused Pallas kernel.

The round-5 xplane decomposition (BENCH_NOTES) put the decode burst's
in-layer weight streaming at ~53% of its HBM floor: the skinny
[S=16, H] x [H, N] dots pay per-op pipeline ramp that the big logits
matmul (which measures at ~peak BW) amortizes away. The candidate fix
is fusing gate/up/down into ONE kernel that streams both MLP matrices
exactly once with double-buffered DMAs.

Variants measured (all at the real decode shapes, 28 layers x 16
steps, bf16):
  A. XLA scan over layers of `qwen3._layer_mlp` (the current burst path)
  B. Pallas fused MLP inside the same `lax.scan` (risk probed: XLA may
     materialize a copy of each layer's weight slice to feed the
     custom call)
  C. Pallas fused MLP with a Python-unrolled layer loop (static slices
     alias the stacked buffer - no copies, bigger HLO)

Prints ms/step-equivalent and effective GB/s vs the 18.9 MB/layer
weight read. Run on the real chip: `python tools/probe_decode_mlp.py`.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fun_asr_vllm_tpu.ops.decode_mlp import fused_mlp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--inter", type=int, default=3072)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    S, H, I, L, K = args.s, args.hidden, args.inter, args.layers, args.steps
    key = jax.random.PRNGKey(0)
    kx, kg, kd = jax.random.split(key, 3)
    x0 = (jax.random.normal(kx, (S, H)) * 0.05).astype(jnp.bfloat16)
    w_gateup = (jax.random.normal(kg, (L, H, 2 * I)) * 0.02).astype(
        jnp.bfloat16)
    w_down = (jax.random.normal(kd, (L, I, H)) * 0.02).astype(jnp.bfloat16)

    def mlp_xla(x, wg, wd):
        gu = x @ wg
        i = gu.shape[-1] // 2
        return (jax.nn.silu(gu[..., :i]) * gu[..., i:]) @ wd

    @jax.jit
    def variant_a(x, wgs, wds):
        def step(x, _):
            def layer(xc, w):
                wg, wd = w
                return xc + mlp_xla(xc, wg, wd), None
            x, _ = jax.lax.scan(layer, x, (wgs, wds))
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=K)
        return x

    @jax.jit
    def variant_b(x, wgs, wds):
        def step(x, _):
            def layer(xc, w):
                wg, wd = w
                return xc + fused_mlp(xc, wg, wd), None
            x, _ = jax.lax.scan(layer, x, (wgs, wds))
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=K)
        return x

    @jax.jit
    def variant_c(x, wgs, wds):
        def step(x, _):
            for l in range(L):
                x = x + fused_mlp(x, wgs[l], wds[l])
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=K)
        return x

    # numerics: one layer, one step
    ref = mlp_xla(x0, w_gateup[0], w_down[0])
    got = fused_mlp(x0, w_gateup[0], w_down[0])
    dev = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    rel = dev / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
    print(f"# fused vs XLA maxdev {dev:.3e} (rel {rel:.3e})")

    fns = {"A_xla_scan": variant_a, "B_pallas_scan": variant_b,
           "C_pallas_unrolled": variant_c}
    # compile all first
    for name, f in fns.items():
        t0 = time.perf_counter()
        f(x0, w_gateup, w_down).block_until_ready()
        print(f"# {name} compiled in {time.perf_counter()-t0:.1f}s")

    weight_bytes = L * (H * 2 * I + I * H) * 2  # bf16
    results = {n: [] for n in fns}
    for r in range(args.rounds):
        for name, f in fns.items():
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                f(x0, w_gateup, w_down).block_until_ready()
                ts.append(time.perf_counter() - t0)
            results[name].append(min(ts))
    for name in fns:
        best = min(results[name])
        med = statistics.median(results[name])
        per_step = best / K
        gbps = weight_bytes / per_step / 1e9
        print(f"{name}: best {best*1e3:.2f} ms ({per_step*1e3:.3f} ms/step, "
              f"{gbps:.0f} GB/s weight stream), median {med*1e3:.2f} ms")


if __name__ == "__main__":
    main()
