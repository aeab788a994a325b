"""Attention implementations (XLA reference paths).

The CUDA analogues in the reference stack live inside vLLM/FlashInfer
(reference infer_kaldidata.py:643 `VLLM_ATTENTION_BACKEND=FLASHINFER`).
Here: pure-XLA grouped-query attention used for prefill and as the
CPU-testable fallback for the Pallas kernels in
`fun_asr_vllm_tpu.ops.paged_attention`.

Layout convention throughout the framework: q [B, T, Nq, D],
k/v [B, S, Nkv, D], GQA with Nq % Nkv == 0. Softmax in float32 regardless
of input dtype (bf16 weights), output cast back to q.dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, S, Nkv, D] → [B, S, Nkv*n_rep, D] by head repetition."""
    if n_rep == 1:
        return x
    b, s, nkv, d = x.shape
    return jnp.broadcast_to(
        x[:, :, :, None, :], (b, s, nkv, n_rep, d)
    ).reshape(b, s, nkv * n_rep, d)


def gqa_attention(
    q: jax.Array,  # [B, T, Nq, D]
    k: jax.Array,  # [B, S, Nkv, D]
    v: jax.Array,  # [B, S, Nkv, D]
    *,
    causal: bool = True,
    q_positions: Optional[jax.Array] = None,  # [B, T] absolute positions
    kv_lengths: Optional[jax.Array] = None,  # [B] valid kv length
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,  # [B, 1|Nq, T, S] additive
) -> jax.Array:
    """Grouped-query scaled-dot-product attention, f32 softmax.

    causal masking uses absolute positions when `q_positions` is given
    (needed when q is a suffix of a longer sequence); otherwise assumes
    q and kv are aligned at 0.
    """
    b, t, nq, d = q.shape
    s = k.shape[1]
    nkv = k.shape[2]
    n_rep = nq // nkv
    if scale is None:
        scale = d ** -0.5

    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)

    # operands stay in their (bf16) dtype — the MXU accumulates in f32 via
    # preferred_element_type, which is the flash-attention numerics contract;
    # upcasting operands to f32 would quarter MXU throughput.
    logits = jnp.einsum(
        "btnd,bsnd->bnts", (q * scale).astype(q.dtype), k,
        preferred_element_type=jnp.float32,
    )
    mask = None
    if causal:
        qpos = (
            q_positions
            if q_positions is not None
            else jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
        )
        kpos = jnp.arange(s)
        mask = qpos[:, :, None] >= kpos[None, None, :]  # [B, T, S]
    if kv_lengths is not None:
        valid = kpos[None, None, :] < kv_lengths[:, None, None] if causal else (
            jnp.arange(s)[None, None, :] < kv_lengths[:, None, None]
        )
        mask = valid if mask is None else (mask & valid)
    if mask is not None:
        logits = jnp.where(mask[:, None, :, :], logits, _NEG_INF)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    probs = jax.nn.softmax(logits, axis=-1)  # f32
    out = jnp.einsum(
        "bnts,bsnd->btnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_lengths: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Bidirectional (encoder) attention with optional length masking."""
    return gqa_attention(q, k, v, causal=False, kv_lengths=kv_lengths, scale=scale)


def prompt_dense_attention(
    q: jax.Array,          # [TT, Nq, D] packed prompt queries (post-RoPE)
    k: jax.Array,          # [TT, Nkv, D]
    v: jax.Array,          # [TT, Nkv, D]
    pad_idx: jax.Array,    # [B, Lmax] int32 packed row per (seq, pos);
                           #   out-of-range positions clamped (masked below)
    unpad_idx: jax.Array,  # [TT] int32 into [B*Lmax]; gap rows → 0
    seg_ids: jax.Array,    # [TT] int32, -1 = gap (zeroes gap outputs)
    lens: jax.Array,       # [B] true prompt lengths (key validity)
) -> jax.Array:
    """Causal prompt attention over a PACKED sequence via a per-sequence
    PADDED dense layout: gather q/k/v to [B, Lmax, …], one batched-matmul
    softmax-attention, scatter back to packed rows. → [TT, Nq*D].

    Status: built as a short-prompt hypothesis (segmented-kernel per-tile
    overhead vs tiny dense scores), then MEASURED SLOWER than both
    segmented kernels at the bench prompt mix (47–144-token prompts,
    ttp=2048, 28 layers: dense 35.9 ms vs one-shot 28.9 / online 30.8 —
    tools/probe_prompt_prefill.py, interleaved best-of-5; full-prefill
    probe read 63.9 vs 55.9 / 84.2 the same night,
    tools/bench_packed_stages.py). The gathers to/from the padded view
    plus the masked-out score work cost more than the kernels' tile
    machinery. The engine therefore NEVER routes this; it stays as the
    measured alternative + parity oracle (tests/test_packed.py)."""
    tt, nq, d = q.shape
    nkv = k.shape[1]
    n_rep = nq // nkv
    b, lmax = pad_idx.shape
    flat = pad_idx.reshape(-1)
    qp = q[flat].reshape(b, lmax, nkv, n_rep, d)
    kp = k[flat].reshape(b, lmax, nkv, d)
    vp = v[flat].reshape(b, lmax, nkv, d)
    scale = jnp.asarray(d ** -0.5, qp.dtype)
    scores = jnp.einsum(
        "bqgrd,bkgd->bgrqk", qp * scale, kp,
        preferred_element_type=jnp.float32,
    )  # [B, G, R, Lq, Lk]
    pos = jnp.arange(lmax)
    causal = pos[None, :] <= pos[:, None]              # [Lq, Lk]
    valid_k = pos[None, :] < lens[:, None]             # [B, Lk]
    mask = jnp.logical_and(causal[None], valid_k[:, None])[:, None, None]
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(mask, probs, 0.0)
    out = jnp.einsum(
        "bgrqk,bkgd->bqgrd", probs.astype(vp.dtype), vp,
        preferred_element_type=jnp.float32,
    )
    att = out.reshape(b * lmax, nq * d).astype(q.dtype)[unpad_idx]
    return att * (seg_ids >= 0)[:, None].astype(att.dtype)


def segment_attention_xla(
    q2: jax.Array,       # [TT, Nq*D] packed tokens
    k2: jax.Array,       # [TT, Nkv*D]
    v2: jax.Array,
    seg_ids: jax.Array,  # [TT] int32: segment id, -1 = gap
    nq: int,
    d: int,
    causal: bool = False,
) -> jax.Array:
    """XLA reference for segment-masked (block-diagonal) attention over
    a PACKED sequence — materializes the [TT, TT] mask, so CPU tests /
    small TT only; `ops.flash_attention.flash_attention_segmented` is
    the TPU implementation. → [TT, Nq*D]. Gap rows (seg -1) → zeros."""
    tt = q2.shape[0]
    nkv = k2.shape[1] // d
    n_rep = nq // nkv
    q = q2.reshape(tt, nkv, n_rep, d).astype(jnp.float32) * (d ** -0.5)
    k = k2.reshape(tt, nkv, d).astype(jnp.float32)
    v = v2.reshape(tt, nkv, d).astype(jnp.float32)
    logits = jnp.einsum("qgrd,kgd->grqk", q, k)
    mask = jnp.logical_and(
        seg_ids[:, None] == seg_ids[None, :], seg_ids[:, None] >= 0
    )
    if causal:
        pos = jnp.arange(tt)
        mask = jnp.logical_and(mask, pos[None, :] <= pos[:, None])
    logits = jnp.where(mask[None, None], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(mask[None, None], probs, 0.0)
    out = jnp.einsum("grqk,kgd->qgrd", probs, v)
    return out.reshape(tt, nq * d).astype(q2.dtype)
