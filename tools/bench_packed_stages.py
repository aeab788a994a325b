"""Stage breakdown of the PACKED (ragged) pipeline at bench geometry.

The padded-path twin is tools/bench_fused.py; this one reproduces the
default bench configuration (packed_prefill, f32 upload, lfr off) on one
bench wave (16 synthetic utterances from bench.synth_utterances) and
times each stage as its own (non-donating) jitted program:

  fbank+gather -> encode_packed -> adaptor forward_packed ->
  _prefill_core_packed (online / one-shot / XLA attention A/B) ->
  _burst_core x16

Relay note: times are best-of-repeats over chained iterations (queue
depth amortizes the per-dispatch RTT; single dispatches on this relay
carry ~0.3-1.4 ms of floor).

Usage: python tools/bench_packed_stages.py [--waves 1] [--iters 10]
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


def timeit(fn, iters=10, repeats=3):
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--wave", type=int, default=0,
                    help="which bench wave (0..4) to reproduce")
    ap.add_argument("--num_steps", type=int, default=16)
    args = ap.parse_args()

    from bench import synth_utterances
    from fun_asr_vllm_tpu.audio.frontend import WavFrontend, fbank_jax
    from fun_asr_vllm_tpu.engine.kv_cache import (
        CacheConfig, _burst_core, _prefill_core_packed, init_cache,
    )
    from fun_asr_vllm_tpu.engine.packed import (
        plan_frame_pack, plan_prompt_pack,
    )
    from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
    from fun_asr_vllm_tpu.models import encoder as encoder_mod
    from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod

    jdtype = jnp.bfloat16
    enc_cfg = encoder_mod.SANMEncoderConfig(
        output_size=512, attention_heads=4, linear_units=2048,
        num_blocks=50, use_flash=True, fused_attention=True, dtype=jdtype,
    )
    llm_cfg = qwen3_mod.Qwen3Config(use_flash=True, dtype=jdtype)
    ad_cfg = adaptor_mod.NanoAdaptorConfig(
        encoder_dim=512, llm_dim=llm_cfg.hidden_size, ffn_dim=2048,
        dtype=jdtype,
    )
    key = jax.random.PRNGKey(0)
    enc_params = encoder_mod.init_params(enc_cfg, key)
    ad_params = adaptor_mod.init_params(ad_cfg, key)
    llm_params = qwen3_mod.init_params(llm_cfg, key)

    utts = synth_utterances(480.0)[16 * args.wave : 16 * (args.wave + 1)]
    frontend = WavFrontend(dither=0.0, bucket_seconds=4.0)
    speech, _ = frontend.batchify(utts)
    speech = jnp.asarray(speech)
    n_pad = speech.shape[1]
    t_pad = frontend.frame_count(n_pad)
    frames = np.asarray([frontend.frame_count(len(u)) for u in utts],
                        np.int32)
    fp = plan_frame_pack(frames, t_pad)
    print(f"# wave {args.wave}: {sum(len(u) for u in utts)/16000:.1f} s, "
          f"frames {frames.tolist()}", file=sys.stderr)
    print(f"# tt={fp.tt} k_window={fp.k_window} "
          f"k_window_rows={fp.k_window_rows}", file=sys.stderr)

    p, q = 12, 5
    bs_blk = 16
    from fun_asr_vllm_tpu.models.adaptor import downsampled_length

    prompt_lens = np.asarray(
        [p + downsampled_length(int(f)) + q for f in frames], np.int64)
    need = -(-(int(prompt_lens.max()) + args.num_steps + 1) // bs_blk)
    mbu = -(-need // 8) * 8
    tables = np.arange(1, 16 * mbu + 1, dtype=np.int32).reshape(16, mbu)
    ppk = plan_prompt_pack(p, q, fp.tok_starts, fp.tok_counts, tables,
                           bs_blk)
    print(f"# ttp={ppk.ttp} prompt_lens={prompt_lens.tolist()} "
          f"pk_window={ppk.k_window} pk_window_rows={ppk.k_window_rows}",
          file=sys.stderr)

    cc = CacheConfig(num_blocks=16 * mbu + 1, block_size=bs_blk,
                     max_blocks_per_seq=mbu, dtype=jdtype)
    k_cache, v_cache = init_cache(llm_cfg, cc)

    # ---- stage: fbank + LFR-less gather to packed rows
    src_idx = jnp.asarray(fp.src_idx)
    seg_ids = jnp.asarray(fp.seg_ids)
    pos_ids = jnp.asarray(fp.pos_ids)

    @jax.jit
    def s_fbank(sp):
        feats = fbank_jax(sp.astype(jnp.float32))
        b, t, d = feats.shape
        flat = feats.reshape(b * t, d)
        gap = (seg_ids >= 0)[:, None]
        return flat[src_idx] * gap.astype(flat.dtype)

    x_packed = s_fbank(speech)
    dt = timeit(lambda: s_fbank(speech), args.iters)
    print(f"fbank+gather [{16},{n_pad}] -> [{fp.tt},80] : {dt*1e3:8.2f} ms")

    # ---- stage: packed encoder (one-shot windowed kernel, the default)
    def mk_enc(kw, kwr, label):
        @jax.jit
        def s_enc(pms, x):
            return encoder_mod.encode_packed(
                pms, enc_cfg, x, seg_ids, pos_ids,
                k_window=kw, k_window_rows=kwr)
        dt = timeit(lambda: s_enc(enc_params, x_packed), args.iters)
        print(f"encode50 packed [{fp.tt},512] {label:14s}: "
              f"{dt*1e3:8.2f} ms")
        return s_enc

    s_enc = mk_enc(fp.k_window, fp.k_window_rows, "(one-shot)")
    mk_enc(fp.k_window, 0, "(online)")
    enc_out = s_enc(enc_params, x_packed)

    # ---- stage: packed adaptor
    m1 = jnp.asarray(fp.m1)
    m2 = jnp.asarray(fp.m2)

    @jax.jit
    def s_ad(pms, e):
        return adaptor_mod.forward_packed(pms, ad_cfg, e, m1, m2)

    audio = s_ad(ad_params, enc_out)
    dt = timeit(lambda: s_ad(ad_params, enc_out), args.iters)
    print(f"adaptor packed [{fp.tt}] -> [{fp.tt//8}]    : {dt*1e3:8.2f} ms")

    # ---- stage: packed prompt prefill, attention-variant A/B
    rngp = np.random.default_rng(2)
    embeds = jnp.asarray(rngp.normal(
        scale=0.3, size=(ppk.ttp, llm_cfg.hidden_size)).astype(np.float32))
    p_pos = jnp.asarray(ppk.pos_ids)
    p_seg = jnp.asarray(ppk.seg_ids)
    wb = jnp.asarray(ppk.write_blocks)
    wo = jnp.asarray(ppk.write_offsets)
    last_idx = jnp.asarray(ppk.last_idx)

    plens32 = jnp.asarray(prompt_lens.astype(np.int32))
    pad_i = jnp.asarray(ppk.pad_idx)
    unpad_i = jnp.asarray(ppk.unpad_idx)

    def mk_prefill(use_flash, kw, kwr, label, dense=0):
        @jax.jit
        def s_pf(pms, kc, vc, emb):
            return _prefill_core_packed(
                pms, llm_cfg, kc, vc, emb, p_pos, p_seg, wb, wo, last_idx,
                use_flash=use_flash, k_window=kw, k_window_rows=kwr,
                pad_idx=pad_i if dense else None,
                unpad_idx=unpad_i if dense else None,
                lens=plens32 if dense else None, dense_lmax=dense)
        dt = timeit(lambda: s_pf(llm_params, k_cache, v_cache, embeds),
                    args.iters)
        print(f"prefill28 packed [{ppk.ttp}] {label:16s}: {dt*1e3:8.2f} ms")
        return s_pf

    s_pf = mk_prefill(True, ppk.k_window, 0, "(online)")
    try:
        mk_prefill(True, ppk.k_window, ppk.k_window_rows, "(one-shot)")
    except Exception as e:  # VMEM gate
        print(f"prefill28 packed (one-shot) unavailable: {e}")
    mk_prefill(False, 0, 0, "(xla)")
    s_dense = mk_prefill(True, 0, 0, "(dense)", dense=ppk.dense_lmax)

    # first-token parity online vs dense (same math, different layout)
    (lg_o, fi_o), _, _ = s_pf(llm_params, k_cache, v_cache, embeds)
    (lg_d, fi_d), _, _ = s_dense(llm_params, k_cache, v_cache, embeds)
    agree = float(np.mean(np.asarray(fi_o) == np.asarray(fi_d)))
    dev = float(np.max(np.abs(np.asarray(lg_o, np.float32)
                              - np.asarray(lg_d, np.float32))))
    print(f"  dense-vs-online first-id agreement {agree:.2f}, "
          f"max|dlogit| {dev:.3e}")

    (_lg, first_ids), kc2, vc2 = s_pf(llm_params, k_cache, v_cache, embeds)

    # ---- stage: decode burst x num_steps
    plens = jnp.asarray(prompt_lens.astype(np.int32))
    tbl = jnp.asarray(tables)
    active = jnp.ones((16,), bool)

    @jax.jit
    def s_burst(pms, fi, kc, vc):
        return _burst_core(
            pms, llm_cfg, kc, vc, fi, plens, tbl, plens + 1, active,
            num_steps=args.num_steps, use_pallas=False,
            chunked_kernel=False, eos_ids=None, early_exit=False)

    dt = timeit(lambda: s_burst(llm_params, first_ids, kc2, vc2),
                args.iters)
    print(f"decode burst x{args.num_steps}              : {dt*1e3:8.2f} ms "
          f"({dt/args.num_steps*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
