"""Stage breakdown of the fused encode+prefill+decode program on-chip.

Times each pipeline stage as its own jitted program with a scalar output
(relay fetches of full tensors would swamp the signal — see
tools/bench_flash.py), at the flagship bench shapes: B=16, ~12 s bucket,
SenseVoice-small SAN-M encoder + Qwen3-0.6B.

Usage: python tools/bench_fused.py [--seconds 12]
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
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--num_steps", type=int, default=16)
    args = ap.parse_args()

    from fun_asr_vllm_tpu.audio.frontend import fbank_jax
    from fun_asr_vllm_tpu.engine.engine import build_prompt_embeds_device
    from fun_asr_vllm_tpu.engine.kv_cache import (
        CacheConfig, _burst_core, _prefill_core, init_cache,
    )
    from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
    from fun_asr_vllm_tpu.models import encoder as encoder_mod
    from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod

    b = args.b
    n = int(args.seconds * 16000)
    t = 1 + (n - 400) // 160  # feature frames

    enc_cfg = encoder_mod.SANMEncoderConfig(
        output_size=512, attention_heads=4, linear_units=2048,
        num_blocks=50, use_flash=True,
    )
    llm_cfg = qwen3_mod.Qwen3Config(use_flash=True)
    ad_cfg = adaptor_mod.NanoAdaptorConfig(
        encoder_dim=512, llm_dim=llm_cfg.hidden_size, ffn_dim=2048,
    )
    key = jax.random.PRNGKey(0)
    enc_params = encoder_mod.init_params(enc_cfg, key)
    ad_params = adaptor_mod.init_params(ad_cfg, key)
    llm_params = qwen3_mod.init_params(llm_cfg, key)

    speech = jax.random.normal(key, (b, n), jnp.float32) * 3000.0
    frames = jnp.asarray(np.linspace(0.3 * t, t, b).astype(np.int32))

    # --- stage 1: fbank
    @jax.jit
    def s_fbank(sp):
        return fbank_jax(sp).astype(jnp.float32).sum()

    dt = timeit(lambda: s_fbank(speech))
    print(f"fbank [{b},{n}]              : {dt*1e3:8.2f} ms")

    # --- stage 2: encoder
    feats = fbank_jax(speech)

    @jax.jit
    def s_enc(p, f, fr):
        out, _ = encoder_mod.encode(p, enc_cfg, f, fr)
        return out.astype(jnp.float32).sum()

    dt = timeit(lambda: s_enc(enc_params, feats, frames))
    print(f"encoder 50L [{b},{t},80]     : {dt*1e3:8.2f} ms")

    # --- stage 3: adaptor
    enc_out, enc_lens = encoder_mod.encode(enc_params, enc_cfg, feats, frames)

    @jax.jit
    def s_ad(p, e, el):
        a, al = adaptor_mod.forward(p, ad_cfg, e, el)
        return a.astype(jnp.float32).sum()

    dt = timeit(lambda: s_ad(ad_params, enc_out, enc_lens))
    print(f"adaptor                      : {dt*1e3:8.2f} ms")

    # --- stage 4: prompt assembly + prefill
    audio, audio_lens = adaptor_mod.forward(ad_params, ad_cfg, enc_out, enc_lens)
    h = llm_cfg.hidden_size
    prefix = jnp.asarray(np.random.default_rng(1).normal(
        scale=0.02, size=(12, h)).astype(np.float32))
    suffix = jnp.asarray(np.random.default_rng(2).normal(
        scale=0.02, size=(5, h)).astype(np.float32))
    t_audio = int(audio.shape[1])
    t_bucket = -(-(12 + t_audio + 5 + args.num_steps + 1) // 16) * 16
    cc = CacheConfig(num_blocks=b * (t_bucket // 16 + 2), block_size=16,
                     max_blocks_per_seq=t_bucket // 16 + 1)
    k_cache, v_cache = init_cache(llm_cfg, cc)
    mb = cc.max_blocks_per_seq
    block_tables = jnp.asarray(
        (1 + np.arange(b * mb).reshape(b, mb)).astype(np.int32))
    prompt_lengths = jnp.minimum(12 + audio_lens + 5, t_bucket)

    @jax.jit
    def s_prefill(lp, a, al, pl_, kc, vc, bt):
        embeds, _ = build_prompt_embeds_device(
            prefix, suffix, a, al, t_bucket=t_bucket)
        (lg, fi), kc, vc = _prefill_core(
            lp, llm_cfg, kc, vc, embeds, pl_, bt)
        return fi.sum() + lg.astype(jnp.float32).sum()

    dt = timeit(lambda: s_prefill(llm_params, audio, audio_lens,
                                  prompt_lengths, k_cache, v_cache,
                                  block_tables))
    tb = t_bucket
    print(f"assembly+prefill [B,{tb},{h}]: {dt*1e3:8.2f} ms")

    # --- stage 5: decode burst (16 steps)
    embeds, _ = build_prompt_embeds_device(
        prefix, suffix, audio, audio_lens, t_bucket=t_bucket)
    (logits, first_ids), k_cache, v_cache = _prefill_core(
        llm_params, llm_cfg, k_cache, v_cache, embeds, prompt_lengths,
        block_tables)
    active = jnp.ones((b,), bool)

    @jax.jit
    def s_burst(lp, fi, pl_, bt, kc, vc):
        toks, kc, vc = _burst_core(
            lp, llm_cfg, kc, vc, fi, pl_, bt,
            pl_ + 1, active, num_steps=args.num_steps)
        return toks.sum()

    dt = timeit(lambda: s_burst(llm_params, first_ids, prompt_lengths,
                                block_tables, k_cache, v_cache))
    print(f"decode burst x{args.num_steps}            : {dt*1e3:8.2f} ms "
          f"({dt/args.num_steps*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
