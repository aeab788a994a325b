"""Single-dispatch audio→prefill program.

Per benchmark batch the naive pipeline pays five device round trips
(fbank, encoder, adaptor, prompt assembly, prefill) — on this TPU's RPC
transport each costs ~40 ms of latency alone. This module compiles the
whole chain into ONE jitted program per (batch, audio-bucket) shape:

    waveform [B, N] ──fbank──► [B, T, 80] ──SAN-M──► [B, T, E]
      ──adaptor──► [B, T/8, H] ──[prefix ⧺ audio ⧺ suffix]──►
      [B, TB, H] ──Qwen3 prefill──► first-token ids + paged-KV writes

All prompt lengths are host-computable in advance (frame math is
deterministic: frames = 1+(N-400)//160, tokens = downsample(frames),
reference model.py:391-396), so block allocation happens before the
dispatch and the program is fully static.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..audio.frontend import _lfr_jax, fbank_jax
from ..models import adaptor as adaptor_mod
from ..models import encoder as encoder_mod
from ..models.qwen3 import Qwen3Config
from .engine import build_prompt_embeds_device
from .kv_cache import _burst_core, _prefill_core


FUSED_ENCODE_PREFILL_STATICS = (
    "enc_cfg", "ad_cfg", "llm_cfg", "t_bucket", "frame_length",
    "frame_shift", "n_mels", "window_type", "fs", "lfr_m", "lfr_n")


@partial(
    jax.jit,
    static_argnames=FUSED_ENCODE_PREFILL_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)
def fused_encode_prefill(
    enc_params: Dict,
    ad_params: Dict,
    llm_params: Dict,
    enc_cfg: encoder_mod.SANMEncoderConfig,
    ad_cfg: adaptor_mod.NanoAdaptorConfig,
    llm_cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    speech: jax.Array,       # [B, N] float32, int16 scale
    wav_frames: jax.Array,   # [B] valid feature frame counts (post-LFR)
    prefix: jax.Array,       # [P, H]
    suffix: jax.Array,       # [Q, H]
    prompt_lengths: jax.Array,  # [B] total prompt lengths (host-computed)
    block_tables: jax.Array,    # [B, MB]
    t_bucket: int,
    frame_length: int = 400,
    frame_shift: int = 160,
    n_mels: int = 80,
    window_type: str = "hamming",
    fs: int = 16000,
    lfr_m: int = 1,
    lfr_n: int = 1,
    cmvn=None,               # optional (add [D], scale [D]) device arrays
    pre_lfr_frames=None,     # [B] pre-LFR frame counts (when lfr_n > 1)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ ((logits [B, V], greedy first ids [B]), k_cache, v_cache).

    `speech` may be int16 or float32 at int16 scale; cast happens
    in-graph."""
    return _fused_prefill(
        enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg,
        k_cache, v_cache, speech, wav_frames, prefix, suffix,
        prompt_lengths, block_tables, t_bucket, frame_length, frame_shift,
        n_mels, window_type, fs, lfr_m, lfr_n, cmvn, pre_lfr_frames,
    )


FUSED_ENCODE_PREFILL_DECODE_STATICS = (
    "enc_cfg", "ad_cfg", "llm_cfg", "t_bucket", "num_steps",
    "frame_length", "frame_shift", "n_mels", "window_type",
    "fs", "use_pallas", "lfr_m", "lfr_n", "early_exit", "chunked_kernel")


@partial(
    jax.jit,
    static_argnames=FUSED_ENCODE_PREFILL_DECODE_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)
def fused_encode_prefill_decode(
    enc_params: Dict,
    ad_params: Dict,
    llm_params: Dict,
    enc_cfg: encoder_mod.SANMEncoderConfig,
    ad_cfg: adaptor_mod.NanoAdaptorConfig,
    llm_cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    speech: jax.Array,          # [B, N]
    wav_frames: jax.Array,      # [B]
    prefix: jax.Array,          # [P, H]
    suffix: jax.Array,          # [Q, H]
    prompt_lengths: jax.Array,  # [B]
    block_tables: jax.Array,    # [B, MB]
    t_bucket: int,
    num_steps: int = 16,
    frame_length: int = 400,
    frame_shift: int = 160,
    n_mels: int = 80,
    window_type: str = "hamming",
    fs: int = 16000,
    use_pallas: bool = False,
    chunked_kernel: bool = False,
    lfr_m: int = 1,
    lfr_n: int = 1,
    cmvn=None,               # optional (add [D], scale [D]) device arrays
    eos_ids=None,            # [E] int32 → in-graph all-EOS early exit
    early_exit: bool = False,
    pre_lfr_frames=None,     # [B] pre-LFR frame counts (when lfr_n > 1)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The whole batch in ONE dispatch: fbank → encoder → adaptor → prompt
    assembly → prefill → `num_steps` greedy decode steps.

    → (tokens [num_steps+1, B] int32, k_cache, v_cache). Block tables must
    cover prompt + num_steps + 1 positions. The host truncates each row at
    EOS / its max_tokens; sequences needing more than num_steps tokens
    continue with regular decode bursts."""
    (_logits, first_ids), k_cache, v_cache = _fused_prefill(
        enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg,
        k_cache, v_cache, speech, wav_frames, prefix, suffix,
        prompt_lengths, block_tables, t_bucket, frame_length, frame_shift,
        n_mels, window_type, fs, lfr_m, lfr_n, cmvn, pre_lfr_frames,
    )

    active = jnp.ones((speech.shape[0],), bool)
    steps_tokens, k_cache, v_cache = _burst_core(
        llm_params, llm_cfg, k_cache, v_cache,
        first_ids, prompt_lengths, block_tables, prompt_lengths + 1,
        active, num_steps=num_steps, use_pallas=use_pallas,
        chunked_kernel=chunked_kernel,
        eos_ids=eos_ids, early_exit=early_exit,
    )
    tokens = jnp.concatenate([first_ids[None], steps_tokens], axis=0)
    return tokens, k_cache, v_cache


def _fused_prefill(
    enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg,
    k_cache, v_cache, speech, wav_frames, prefix, suffix,
    prompt_lengths, block_tables, t_bucket, frame_length, frame_shift,
    n_mels, window_type, fs, lfr_m=1, lfr_n=1, cmvn=None,
    pre_lfr_frames=None,
):
    if speech.dtype == jnp.uint32:
        # int16 sample pairs bit-packed on the host (frontend
        # batchify_packed): lossless half-bandwidth upload
        from ..audio.frontend import unpack_pairs

        speech = unpack_pairs(speech)
    feats = fbank_jax(
        speech.astype(jnp.float32), frame_length=frame_length,
        frame_shift=frame_shift, n_mels=n_mels, window_type=window_type,
        fs=fs,
    )
    # the real Fun-ASR-Nano frontend applies LFR stacking + CMVN (funasr
    # WavFrontend semantics, reference model.py:372-377) — both are cheap
    # in-graph ops XLA fuses into the surrounding program
    if lfr_m != 1 or lfr_n != 1:
        # pre-LFR lengths make incomplete tail groups replicate each
        # row's last VALID frame (funasr apply_lfr semantics) instead of
        # the batch's padded silence frames
        feats = _lfr_jax(feats, lfr_m, lfr_n, pre_lfr_frames)
    if cmvn is not None:
        add, scale = cmvn
        feats = (feats + add) * scale
    enc_out, enc_lens = encoder_mod.encode(enc_params, enc_cfg, feats, wav_frames)
    audio, audio_lens = adaptor_mod.forward(ad_params, ad_cfg, enc_out, enc_lens)
    embeds, _total = build_prompt_embeds_device(
        prefix, suffix, audio, audio_lens, t_bucket=t_bucket
    )
    (_logits, first_ids), k_cache, v_cache = _prefill_core(
        llm_params, llm_cfg, k_cache, v_cache, embeds, prompt_lengths,
        block_tables,
    )
    return (_logits, first_ids), k_cache, v_cache
