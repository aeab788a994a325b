"""Packed (ragged) audio→prefill pipeline: layout planning + the
single-dispatch fused program.

The padded-batch fused path (`engine/fused.py`) computes every utterance
at the wave's max bucketed length — ~2.4× wasted encoder rows and ~2×
wasted prefill rows at the SPEECHIO duration mix. This module packs all
valid frames along ONE time axis instead (the Ragged Paged Attention
idea generalized to the whole pipeline, SURVEY §7 "hard part (a)"):

- frame level: utterance i's post-LFR frames occupy a 16-aligned
  segment [start_i, start_i + t_i) with ≥16 zero-gap frames before the
  next segment — the zero gaps make every depthwise/strided conv's
  cross-boundary taps read zeros, reproducing per-utterance SAME/p=1
  padding EXACTLY (models/encoder.encode_packed,
  models/adaptor.forward_packed);
- token level: ChatML prompts [prefix ⧺ audio_i ⧺ suffix] pack the same
  way (no gaps needed — no convs), with per-token KV page scatter
  indices and a segment-block-diagonal causal prefill
  (engine/kv_cache._prefill_core_packed).

All layout arrays are host-computed int32 (deterministic frame math) and
tiny; packed lengths are bucketed so jit compiles a handful of shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import _lfr_jax, fbank_jax
from ..models import adaptor as adaptor_mod
from ..models import encoder as encoder_mod
from ..models.adaptor import downsampled_length
from ..models.qwen3 import Qwen3Config
from .kv_cache import _burst_core, _prefill_core_packed

ALIGN = 16  # frame segment alignment; gap ≥ ALIGN zeros between segments
PACK_BLOCK = 512        # prompt-level segmented-kernel tile (ttp bucket)
FRAME_BLOCK = 1024      # frame-level segmented-kernel tile (tt bucket)

# Widest key window (rows) at which the ONE-SHOT two-pass kernel still
# beats the online segmented kernel for the CAUSAL prompt prefill.
# Re-swept post the round-5 KV-write restructure across five geometries
# (tools/probe_prompt_prefill.py, interleaved best-of-rounds, BENCH_NOTES
# round 5): one-shot wins below the gate (W=768: 25.89 vs 27.64 ms
# prefill28; W=1024: 36.76 vs 38.08), ties at W=1280, and loses ≤2.5%
# at W=1536 — the routes are within ~3% everywhere now that the
# per-layer page scatters left the layer scan (the round-4 "518 vs 322
# at W=1280" cliff was a scatter-regime artifact). Above the cap the
# engine routes the online kernel, which skips strictly-future k-blocks
# entirely.
PROMPT_ONESHOT_MAX_ROWS = 1024


def _k_window(seg: np.ndarray, block: int = PACK_BLOCK) -> int:
    """Width (in k-blocks) of the widest q-block's segment span — the
    static W for flash_attention_segmented's windowed grid. Snapped to
    even values to bound compile variants."""
    t = len(seg)
    nb = max(1, t // block)
    starts: Dict[int, int] = {}
    ends: Dict[int, int] = {}
    for i, s in enumerate(seg.tolist()):
        if s >= 0:
            starts.setdefault(s, i)
            ends[s] = i
    width = 1
    for b in range(nb):
        blk = seg[b * block : (b + 1) * block]
        valid = blk[blk >= 0]
        if valid.size == 0:
            continue
        lo, hi = int(valid.min()), int(valid.max())
        width = max(width, ends[hi] // block - starts[lo] // block + 1)
    return min(nb, -(-width // 2) * 2)


def _k_window_rows(seg: np.ndarray, block_q: int = 512,
                   snap: int = 256) -> int:
    """Widest q-block key span in ROWS for the ONE-SHOT windowed
    segmented kernel (flash_attention_segmented_oneshot): max over
    q-blocks of (last key of its last segment − first key of its first
    segment + 1), +128 for the kernel's 128-aligned window start,
    snapped up to `snap` to bound compile variants."""
    t = len(seg)
    starts: Dict[int, int] = {}
    ends: Dict[int, int] = {}
    for i, sgm in enumerate(seg.tolist()):
        if sgm >= 0:
            starts.setdefault(sgm, i)
            ends[sgm] = i
    span = 1
    for b in range(0, t, block_q):
        blk = seg[b : b + block_q]
        valid = blk[blk >= 0]
        if valid.size == 0:
            continue
        lo, hi = int(valid.min()), int(valid.max())
        span = max(span, ends[hi] - starts[lo] + 1)
    return min(t, -(-(span + 128) // snap) * snap)


@dataclasses.dataclass
class FramePack:
    tt: int
    seg_ids: np.ndarray   # [tt] int32: utt id, -1 gap
    pos_ids: np.ndarray   # [tt] int32: frame index within utt
    src_idx: np.ndarray   # [tt] int32: flat index into [B*T_pad] features
    m1: np.ndarray        # [tt//2, 1] f32: validity after adaptor conv1
    m2: np.ndarray        # [tt//4, 1] f32: validity after adaptor conv2
    starts: List[int]
    tok_starts: List[int]   # audio-token start per utt (= start//8)
    tok_counts: List[int]   # = downsampled_length(t_i)
    k_window: int = 0       # static W for the windowed segmented kernel
    k_window_rows: int = 0  # static row window for the ONE-SHOT kernel


def plan_frame_pack(
    frame_counts: Sequence[int], t_pad: int, bucket: int = 1024
) -> FramePack:
    """Lay utterances' valid (post-LFR) frames into the packed timeline."""
    allocs = [-(-int(t) // ALIGN) * ALIGN + ALIGN for t in frame_counts]
    total = sum(allocs)
    tt = max(bucket, -(-total // bucket) * bucket)
    seg = np.full(tt, -1, np.int32)
    pos = np.zeros(tt, np.int32)
    src = np.zeros(tt, np.int32)
    m1 = np.zeros(tt // 2, np.float32)
    m2 = np.zeros(tt // 4, np.float32)
    starts, tok_starts, tok_counts = [], [], []
    off = 0
    for i, t in enumerate(int(x) for x in frame_counts):
        starts.append(off)
        seg[off : off + t] = i
        pos[off : off + t] = np.arange(t)
        src[off : off + t] = i * t_pad + np.arange(t)
        o1 = 1 + (t - 1) // 2
        # keep ONE slot past conv1's valid range: the padded-batch
        # adaptor (funasr semantics, models/adaptor.forward) lets conv2's
        # last valid output read conv1-out[o1] — a boundary value built
        # from the zeroed encoder tail, not conv2's own zero padding.
        # Including that slot makes packed ≡ padded bit-for-bit; the
        # NEXT segment's conv2 still sees a zero at its left edge
        # because the remaining gap slots stay masked.
        m1[off // 2 : off // 2 + o1 + 1] = 1.0
        o2 = 1 + (o1 - 1) // 2
        m2[off // 4 : off // 4 + o2] = 1.0
        tok_starts.append(off // 8)
        tok_counts.append(downsampled_length(t))
        off += allocs[i]
    return FramePack(tt, seg, pos, src, m1[:, None], m2[:, None],
                     starts, tok_starts, tok_counts,
                     _k_window(seg, FRAME_BLOCK), _k_window_rows(seg))


@dataclasses.dataclass
class PromptPack:
    ttp: int
    seg_ids: np.ndarray    # [ttp]
    pos_ids: np.ndarray    # [ttp] within-prompt position
    emb_src: np.ndarray    # [ttp] into [prefix(P); suffix(Q); zero; audio]
    write_blocks: np.ndarray
    write_offsets: np.ndarray
    last_idx: np.ndarray   # [B]
    prompt_lens: np.ndarray  # [B]
    k_window: int = 0      # static W for the windowed segmented kernel
    k_window_rows: int = 0  # static row window for the ONE-SHOT kernel
    # per-seq padded-view maps for the DENSE prompt-attention route
    # (ops.attention.prompt_dense_attention — measured SLOWER than the
    # one-shot kernel at the bench mix, so the engine never routes it;
    # kept for the A/B tools and the parity tests)
    pad_idx: np.ndarray = None    # [B, Lmax] packed row per (seq, pos)
    unpad_idx: np.ndarray = None  # [ttp] into [B*Lmax]; gaps → 0
    dense_lmax: int = 0    # 128-bucketed max prompt len (dense route)


def plan_prompt_pack(
    p: int,
    q: int,
    tok_starts: Sequence[int],
    tok_counts: Sequence[int],
    block_tables: np.ndarray,  # [B, MB] this wave's page allocation
    block_size: int,
    bucket: int = 512,
) -> PromptPack:
    """Lay [prefix ⧺ audio_i ⧺ suffix] prompts into the packed axis and
    precompute each token's KV page destination (gaps → garbage block 0)."""
    b = len(tok_counts)
    lens = [p + int(c) + q for c in tok_counts]
    allocs = [-(-L // ALIGN) * ALIGN for L in lens]
    total = sum(allocs)
    ttp = max(bucket, -(-total // bucket) * bucket)
    seg = np.full(ttp, -1, np.int32)
    pos = np.zeros(ttp, np.int32)
    zero_row = p + q
    audio_base = p + q + 1
    emb = np.full(ttp, zero_row, np.int32)
    wb = np.zeros(ttp, np.int32)
    wo = np.zeros(ttp, np.int32)
    last = np.zeros(b, np.int32)
    lmax = max(128, -(-max(lens) // 128) * 128)
    pad_idx = np.zeros((b, lmax), np.int32)
    unpad = np.zeros(ttp, np.int32)
    off = 0
    for i, L in enumerate(lens):
        c = int(tok_counts[i])
        seg[off : off + L] = i
        pp = np.arange(L)
        pos[off : off + L] = pp
        emb[off : off + p] = np.arange(p)
        emb[off + p : off + p + c] = audio_base + int(tok_starts[i]) + np.arange(c)
        emb[off + p + c : off + L] = p + np.arange(q)
        wb[off : off + L] = block_tables[i][pp // block_size]
        wo[off : off + L] = pp % block_size
        last[i] = off + L - 1
        # dense-attention layout: row (i, j) of the [B, Lmax] padded view
        # reads packed row off+j (tail clamped to off, masked by lens)
        pad_idx[i, :L] = off + pp
        pad_idx[i, L:] = off
        unpad[off : off + L] = i * lmax + pp
        off += allocs[i]
    return PromptPack(ttp, seg, pos, emb, wb, wo, last,
                      np.asarray(lens, np.int64), _k_window(seg),
                      _k_window_rows(seg), pad_idx, unpad, lmax)


FUSED_PACKED_STATICS = (
    "enc_cfg", "ad_cfg", "llm_cfg", "num_steps",
    "frame_length", "frame_shift", "n_mels", "window_type",
    "fs", "lfr_m", "lfr_n", "early_exit",
    "decode_only_prefill", "frame_k_window", "frame_k_window_rows",
    "prompt_k_window", "prompt_k_window_rows",
    "use_pallas", "sample_packed", "chunked_kernel")


@partial(
    jax.jit,
    static_argnames=FUSED_PACKED_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)
def fused_encode_prefill_decode_packed(
    enc_params: Dict,
    ad_params: Dict,
    llm_params: Dict,
    enc_cfg: encoder_mod.SANMEncoderConfig,
    ad_cfg: adaptor_mod.NanoAdaptorConfig,
    llm_cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    speech: jax.Array,          # [B, N] f32 int16-scale (padded batch)
    frame_src: jax.Array,       # FramePack arrays …
    frame_seg: jax.Array,
    frame_pos: jax.Array,
    m1: jax.Array,
    m2: jax.Array,
    emb_src: jax.Array,         # PromptPack arrays …
    p_seg: jax.Array,
    p_pos: jax.Array,
    write_blocks: jax.Array,
    write_offsets: jax.Array,
    last_idx: jax.Array,
    prefix: jax.Array,          # [P, H]
    suffix: jax.Array,          # [Q, H]
    prompt_lengths: jax.Array,  # [B] true prompt lengths
    block_tables: jax.Array,    # [B, MB]
    num_steps: int = 16,
    frame_length: int = 400,
    frame_shift: int = 160,
    n_mels: int = 80,
    window_type: str = "hamming",
    fs: int = 16000,
    lfr_m: int = 1,
    lfr_n: int = 1,
    cmvn=None,
    pre_lfr_frames=None,
    eos_ids=None,
    early_exit: bool = False,
    decode_only_prefill: bool = False,
    frame_k_window: int = 0,
    frame_k_window_rows: int = 0,
    prompt_k_window: int = 0,
    prompt_k_window_rows: int = 0,
    use_pallas: bool = False,
    chunked_kernel: bool = False,
    sample_packed: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ONE dispatch: fbank → packed encoder → packed adaptor → packed
    prompt assembly → ragged prefill → K fused greedy decode steps.
    → (tokens [num_steps+1, B], k_cache, v_cache); with
    `decode_only_prefill`, tokens is [1, B] (first ids only)."""
    return _packed_core(
        enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg,
        k_cache, v_cache, speech, frame_src, frame_seg, frame_pos, m1, m2,
        emb_src, p_seg, p_pos, write_blocks, write_offsets, last_idx,
        prefix, suffix, prompt_lengths, block_tables,
        num_steps=num_steps, frame_length=frame_length,
        frame_shift=frame_shift, n_mels=n_mels, window_type=window_type,
        fs=fs, lfr_m=lfr_m, lfr_n=lfr_n, cmvn=cmvn,
        pre_lfr_frames=pre_lfr_frames, eos_ids=eos_ids,
        early_exit=early_exit, decode_only_prefill=decode_only_prefill,
        frame_k_window=frame_k_window,
        frame_k_window_rows=frame_k_window_rows,
        prompt_k_window=prompt_k_window,
        prompt_k_window_rows=prompt_k_window_rows,
        use_pallas=use_pallas, chunked_kernel=chunked_kernel,
        sample_packed=sample_packed,
    )


def _packed_core(
    enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg,
    k_cache, v_cache, speech, frame_src, frame_seg, frame_pos, m1, m2,
    emb_src, p_seg, p_pos, write_blocks, write_offsets, last_idx,
    prefix, suffix, prompt_lengths, block_tables,
    *, num_steps, frame_length, frame_shift, n_mels, window_type, fs,
    lfr_m, lfr_n, cmvn, pre_lfr_frames, eos_ids, early_exit,
    decode_only_prefill, frame_k_window, frame_k_window_rows,
    prompt_k_window, prompt_k_window_rows, use_pallas, chunked_kernel,
    sample_packed,
):
    if speech.dtype == jnp.uint32:
        # bit-packed int16-pair upload (frontend.batchify_packed)
        from ..audio.frontend import unpack_pairs

        speech = unpack_pairs(speech)
    feats = fbank_jax(
        speech.astype(jnp.float32), frame_length=frame_length,
        frame_shift=frame_shift, n_mels=n_mels, window_type=window_type,
        fs=fs,
    )
    if lfr_m != 1 or lfr_n != 1:
        feats = _lfr_jax(feats, lfr_m, lfr_n, pre_lfr_frames)
    if cmvn is not None:
        add, scale = cmvn
        feats = (feats + add) * scale
    gap = (frame_seg >= 0)[:, None]
    if sample_packed:
        # speech was ONE sample-level packed row laid out in the plan's
        # frame geometry (frontend.batchify_sample_packed): fbank already
        # produced every utterance's frames in place — no per-utterance
        # padded compute and no gather. Gap-region frames are
        # fbank-of-silence; mask to the exact zeros the layout expects.
        x = feats[0, : frame_seg.shape[0]] * gap.astype(feats.dtype)
    else:
        b, t_pad, d_in = feats.shape
        flat = feats.reshape(b * t_pad, d_in)
        x = flat[frame_src] * gap.astype(flat.dtype)
    enc = encoder_mod.encode_packed(
        enc_params, enc_cfg, x, frame_seg, frame_pos,
        k_window=frame_k_window, k_window_rows=frame_k_window_rows,
    )
    audio = adaptor_mod.forward_packed(ad_params, ad_cfg, enc, m1, m2)
    h = audio.shape[-1]
    table = jnp.concatenate(
        [prefix.astype(audio.dtype), suffix.astype(audio.dtype),
         jnp.zeros((1, h), audio.dtype), audio], axis=0
    )
    embeds = table[emb_src]  # [TTP, H]
    (_logits, first_ids), k_cache, v_cache = _prefill_core_packed(
        llm_params, llm_cfg, k_cache, v_cache, embeds, p_pos, p_seg,
        write_blocks, write_offsets, last_idx,
        use_flash=llm_cfg.use_flash, k_window=prompt_k_window,
        k_window_rows=prompt_k_window_rows,
    )
    if decode_only_prefill:
        return first_ids[None], k_cache, v_cache
    active = jnp.ones((prompt_lengths.shape[0],), bool)
    steps_tokens, k_cache, v_cache = _burst_core(
        llm_params, llm_cfg, k_cache, v_cache,
        first_ids, prompt_lengths, block_tables, prompt_lengths + 1,
        active, num_steps=num_steps, use_pallas=use_pallas,
        chunked_kernel=chunked_kernel,
        eos_ids=eos_ids, early_exit=early_exit,
    )
    tokens = jnp.concatenate([first_ids[None], steps_tokens], axis=0)
    return tokens, k_cache, v_cache


FUSED_PACKED_MULTI_STATICS = (
    "enc_cfg", "ad_cfg", "llm_cfg", "num_steps",
    "frame_length", "frame_shift", "n_mels", "window_type",
    "fs", "lfr_m", "lfr_n", "early_exit",
    "frame_k_window", "frame_k_window_rows",
    "prompt_k_window", "prompt_k_window_rows",
    "use_pallas", "sample_packed", "chunked_kernel")


@partial(
    jax.jit,
    static_argnames=FUSED_PACKED_MULTI_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)
def fused_encode_prefill_decode_packed_multi(
    enc_params: Dict,
    ad_params: Dict,
    llm_params: Dict,
    enc_cfg: encoder_mod.SANMEncoderConfig,
    ad_cfg: adaptor_mod.NanoAdaptorConfig,
    llm_cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    speech: jax.Array,          # [W, NS] (sample_packed) or [W, B, N]
    frame_src: jax.Array,       # [W, TT] FramePack arrays, wave-stacked
    frame_seg: jax.Array,
    frame_pos: jax.Array,
    m1: jax.Array,              # [W, TT//2, 1]
    m2: jax.Array,              # [W, TT//4, 1]
    emb_src: jax.Array,         # [W, TTP] PromptPack arrays, wave-stacked
    p_seg: jax.Array,
    p_pos: jax.Array,
    write_blocks: jax.Array,
    write_offsets: jax.Array,
    last_idx: jax.Array,        # [W, B]
    prefix: jax.Array,          # [P, H] (shared)
    suffix: jax.Array,          # [Q, H] (shared)
    prompt_lengths: jax.Array,  # [W, B]
    block_tables: jax.Array,    # [B, MB] — SHARED: wave i+1's prefill
    num_steps: int = 16,        #   overwrites wave i's pages on device
    frame_length: int = 400,
    frame_shift: int = 160,
    n_mels: int = 80,
    window_type: str = "hamming",
    fs: int = 16000,
    lfr_m: int = 1,
    lfr_n: int = 1,
    cmvn=None,
    pre_lfr_frames=None,        # [W, B] when LFR is on
    eos_ids=None,
    early_exit: bool = False,
    frame_k_window: int = 0,
    frame_k_window_rows: int = 0,
    prompt_k_window: int = 0,
    prompt_k_window_rows: int = 0,
    use_pallas: bool = False,
    chunked_kernel: bool = False,
    sample_packed: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """W waves in ONE dispatch: `lax.scan` over wave-stacked inputs, each
    iteration running the full packed fused program and REUSING the same
    KV pages (the burst must therefore cover every request's max_tokens —
    there is no continuation path once a later wave overwrites the
    pages). → (tokens [W, num_steps+1, B], k_cache, v_cache).

    Why: on RPC-attached TPUs every dispatch→fetch round trip costs
    ~0.1-0.2 s of relay latency; a 5-wave eval epoch pays it 5×. Scanning
    the waves on device amortizes it to once per call, with per-wave
    early-exit (the while_loop) intact inside the scan. All waves must
    share layout geometry (TT/TTP buckets, batch size, k-windows) — the
    host planner pads to common buckets (engine.generate_fused_multi)."""
    xs = {
        "speech": speech, "frame_src": frame_src, "frame_seg": frame_seg,
        "frame_pos": frame_pos, "m1": m1, "m2": m2, "emb_src": emb_src,
        "p_seg": p_seg, "p_pos": p_pos, "write_blocks": write_blocks,
        "write_offsets": write_offsets, "last_idx": last_idx,
        "prompt_lengths": prompt_lengths,
    }
    if pre_lfr_frames is not None:
        xs["pre_lfr_frames"] = pre_lfr_frames

    def body(carry, x):
        kc, vc = carry
        sp_ = x["speech"]
        if sample_packed:
            sp_ = sp_[None]  # [NS] -> [1, NS]
        toks, kc, vc = _packed_core(
            enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg,
            kc, vc, sp_, x["frame_src"], x["frame_seg"], x["frame_pos"],
            x["m1"], x["m2"], x["emb_src"], x["p_seg"], x["p_pos"],
            x["write_blocks"], x["write_offsets"], x["last_idx"],
            prefix, suffix, x["prompt_lengths"], block_tables,
            num_steps=num_steps, frame_length=frame_length,
            frame_shift=frame_shift, n_mels=n_mels,
            window_type=window_type, fs=fs, lfr_m=lfr_m, lfr_n=lfr_n,
            cmvn=cmvn, pre_lfr_frames=x.get("pre_lfr_frames"),
            eos_ids=eos_ids, early_exit=early_exit,
            decode_only_prefill=False, frame_k_window=frame_k_window,
            frame_k_window_rows=frame_k_window_rows,
            prompt_k_window_rows=prompt_k_window_rows,
            prompt_k_window=prompt_k_window, use_pallas=use_pallas,
            chunked_kernel=chunked_kernel, sample_packed=sample_packed,
        )
        return (kc, vc), toks

    (k_cache, v_cache), tokens = jax.lax.scan(body, (k_cache, v_cache), xs)
    return tokens, k_cache, v_cache
