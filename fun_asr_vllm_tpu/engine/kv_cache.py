"""Paged KV cache + jitted prefill/decode step functions.

The TPU analogue of vLLM's paged attention + CUDA-graph execution
(reference model.py:645-653; infer_kaldidata.py:648-656 captures CUDA
graphs for batch sizes 1..B — here every step is a jit-compiled XLA
program over *fixed* slot/bucket shapes, so the same effect falls out of
jit's compile cache).

Layout: k_cache/v_cache ``[L, num_blocks, Nkv, block_size, D]`` in HBM —
HEAD-MAJOR pages. Each (page, head) is a dense ``[BS, D]`` tile, so the
decode kernels get per-head views for free AND page DMAs land dense in
VMEM; the previous token-major ``[.., BS, Nkv, D]`` layout forced either
sublane-strided per-head slices (relayout copies serializing ~4 ms/step
against the page DMAs at 2k-token windows) or 256-byte scattered DMA
writes — measured 405 vs 509 GB/s effective KV streaming on v5e.
Block 0 is reserved as a garbage sink — padding positions and inactive
slots write there, which keeps every step fully dense (no host-side
branching inside jit).

Two step functions:
- `prefill_step`: one sequence (bucketed length) of prompt *embeddings*
  (the reference feeds vLLM `prompt_embeds`, reference model.py:648) →
  causal self-attention, cache population, first sampled token.
- `decode_step`: all `max_num_seqs` slots advance one token via paged
  attention over their block tables. The XLA gather path here is the
  reference implementation; `ops.paged_attention` provides the Pallas
  kernel used on TPU.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from types import SimpleNamespace
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import qwen3
from ..models.qwen3 import Qwen3Config, rms_norm, rope_cos_sin, apply_rope

# cap on the burst's hoisted all-layer KV window (k+v, bytes); above it the
# burst falls back to per-layer gathers to bound live HBM
_HOIST_GATHER_BYTES_CAP = 512 << 20


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    num_blocks: int = 512          # incl. reserved garbage block 0
    block_size: int = 16
    max_blocks_per_seq: int = 128  # → max seq len = 2048 tokens by default
    dtype: "jnp.dtype" = jnp.bfloat16
    kv_quant: bool = False  # int8 pages + per-(token, head) f32 scales

    @property
    def max_model_len(self) -> int:
        return self.max_blocks_per_seq * self.block_size


def init_cache(cfg: Qwen3Config, cc: CacheConfig):
    """→ (k_cache, v_cache). Each is a plain array, or — with
    `kv_quant` — a pytree ``{"q": int8 [L,NB,Nkv,BS,D], "s": f32
    [L,NB,Nkv,BS,1]}`` (symmetric per-token-per-head scales): halves the
    paged-attention HBM reads, the decode bottleneck at long contexts.
    jit/donation handle the pytree transparently."""
    shape = (
        cfg.num_hidden_layers, cc.num_blocks,
        cfg.num_key_value_heads, cc.block_size, cfg.head_dim,
    )
    if cc.kv_quant:
        def one():
            return {"q": jnp.zeros(shape, jnp.int8),
                    "s": jnp.zeros((*shape[:-1], 1), jnp.float32)}

        return one(), one()
    return jnp.zeros(shape, cc.dtype), jnp.zeros(shape, cc.dtype)


def cache_block_size(cache) -> int:
    return (cache["q"] if isinstance(cache, dict) else cache).shape[3]


def _quantize_kv(x: jax.Array):
    """[..., D] → (int8 [..., D], f32 scale [..., 1]); symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _cache_layer(cache, lid):
    if isinstance(cache, dict):
        return {"q": cache["q"][lid], "s": cache["s"][lid]}
    return cache[lid]


def _cache_write(cache, idx, values, dtype):
    """Scatter token K/V rows into head-major pages, quantizing when the
    cache is int8-paged.

    ``idx = (layer_sel, blocks, offsets)`` addresses N token slots;
    ``values`` is [N, Nkv, D] (single traced layer) or [L, N, Nkv, D]
    (``layer_sel = slice(None)``). The head axis rides a full slice
    between the block and offset index arrays — advanced-index
    broadcasting puts the N axis first, matching the values layout."""
    lsel, blocks, offsets = idx
    if isinstance(lsel, slice):
        # cache[:, blocks, :, offsets] → [N, L, Nkv, D/1]
        values = jnp.swapaxes(values, 0, 1)
        full_idx = (lsel, blocks, slice(None), offsets)
    else:
        # cache[lid, blocks, :, offsets] → [N, Nkv, D/1]
        full_idx = (lsel, blocks, slice(None), offsets)
    if isinstance(cache, dict):
        q, s = _quantize_kv(values)
        return {"q": cache["q"].at[full_idx].set(q),
                "s": cache["s"].at[full_idx].set(s)}
    return cache.at[full_idx].set(values.astype(dtype))


def _gather_pages(cache_l, block_tables: jax.Array,
                  out_dtype=None) -> jax.Array:
    """cache_l [NB, Nkv, BS, D] head-major (or int8+scale pytree),
    block_tables [S, MB] → [S, MB*BS, Nkv, D]; int8 pages dequantize
    AFTER the gather, so the HBM read is half-width."""
    s, mb = block_tables.shape

    def _to_window(pages, nkv, bs, d):
        # [S·MB, Nkv, BS, D] → [S, MB·BS, Nkv, D]
        w = pages.reshape(s, mb, nkv, bs, d).transpose(0, 1, 3, 2, 4)
        return w.reshape(s, mb * bs, nkv, d)

    if isinstance(cache_l, dict):
        nb, nkv, bs, d = cache_l["q"].shape
        q = jnp.take(cache_l["q"], block_tables.reshape(-1), axis=0)
        sc = jnp.take(cache_l["s"], block_tables.reshape(-1), axis=0)
        out = q.astype(jnp.float32) * sc
        return _to_window(out, nkv, bs, d).astype(out_dtype or jnp.bfloat16)
    nb, nkv, bs, d = cache_l.shape
    pages = jnp.take(cache_l, block_tables.reshape(-1), axis=0)
    return _to_window(pages, nkv, bs, d)


def paged_attention_xla(
    q: jax.Array,            # [S, Nq, D] one new token per slot
    k_cache_l: jax.Array,    # [NB, Nkv, BS, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [S, MB]
    seq_lens: jax.Array,      # [S] kv length incl. current token
    out_dtype=None,           # int8-page dequant target (cfg.dtype)
) -> jax.Array:
    """Reference paged decode attention (gather + masked softmax). f32 math."""
    s, nq, d = q.shape
    k = _gather_pages(k_cache_l, block_tables, out_dtype)  # [S, T, Nkv, D]
    v = _gather_pages(v_cache_l, block_tables, out_dtype)
    t = k.shape[1]
    nkv = k.shape[2]
    n_rep = nq // nkv
    qf = q.astype(jnp.float32) * (d ** -0.5)
    qf = qf.reshape(s, nkv, n_rep, d)
    logits = jnp.einsum(
        "sgrd,stgd->sgrt", qf, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    mask = jnp.arange(t)[None, :] < seq_lens[:, None]  # [S, T]
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "sgrt,stgd->sgrd", probs, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(s, nq, d).astype(q.dtype)


def _decode_core(
    params: Dict,
    cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    token_ids: jax.Array,      # [S] last sampled token per slot
    positions: jax.Array,      # [S] position of the new token
    block_tables: jax.Array,   # [S, MB]
    seq_lens: jax.Array,       # [S] kv length incl. new token
    active: jax.Array,         # [S] bool
    use_pallas: bool = False,
    mesh=None,
    pallas_interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One decode step for all slots → (logits [S, V] f32, k_cache, v_cache).

    Inactive slots compute garbage and write to block 0 (their block_tables
    rows must point at 0); callers ignore their logits.

    With `mesh`, the Pallas route runs TP-sharded: each device's kernel
    reads its local KV-head slice of the head-major page cache
    (paged_attention_pallas_tp); the XLA route relies on GSPMD
    propagation from the sharded cache instead.
    """
    s = token_ids.shape[0]
    bs = cache_block_size(k_cache)
    mb = block_tables.shape[1]
    x = qwen3.embed_tokens(params, token_ids).astype(cfg.dtype)  # [S, H]

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)  # [S, D/2]
    cos, sin = cos[:, None, :], sin[:, None, :]

    in_block = jnp.minimum(positions // bs, mb - 1)
    write_blocks = jnp.where(
        active,
        jnp.take_along_axis(block_tables, in_block[:, None], axis=1)[:, 0],
        0,
    )
    write_offsets = positions % bs

    if use_pallas and mesh is not None:
        from ..ops.paged_attention import paged_attention_pallas_tp

        attn_impl = partial(paged_attention_pallas_tp, mesh=mesh,
                            interpret=pallas_interpret)
    elif use_pallas:
        from ..ops.paged_attention import paged_attention_pallas

        attn_impl = partial(paged_attention_pallas,
                            interpret=pallas_interpret)
    else:
        # thread cfg.dtype so a float32-configured int8 cache dequantizes
        # to f32, not a silently-rounded bf16 (ADVICE r2)
        attn_impl = partial(paged_attention_xla, out_dtype=cfg.dtype)

    nq, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)

    def body(carry, scanned):
        xc, kc, vc = carry
        lp, lid = scanned
        h = rms_norm(xc, lp["input_ln"], cfg.rms_norm_eps)
        qkv = qwen3.mm(h, lp["wqkv"])  # fused [H, (Nq+2Nkv)D]
        q = qkv[:, : nq * d].reshape(s, nq, d)
        k = qkv[:, nq * d : (nq + nkv) * d].reshape(s, nkv, d)
        v = qkv[:, (nq + nkv) * d :].reshape(s, nkv, d)
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        kc = _cache_write(kc, (lid, write_blocks, write_offsets), k, cfg.dtype)
        vc = _cache_write(vc, (lid, write_blocks, write_offsets), v, cfg.dtype)
        att = attn_impl(q, _cache_layer(kc, lid), _cache_layer(vc, lid),
                        block_tables, seq_lens)
        xc = xc + qwen3.mm(att.reshape(s, -1), lp["wo"])
        h = rms_norm(xc, lp["post_ln"], cfg.rms_norm_eps)
        xc = xc + qwen3._layer_mlp(lp, h)
        return (xc, kc, vc), None

    layer_ids = jnp.arange(cfg.num_hidden_layers)
    (x, k_cache, v_cache), _ = jax.lax.scan(
        body, (x, k_cache, v_cache), (params["layers"], layer_ids)
    )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = qwen3.lm_logits(params, cfg, x)
    return logits, k_cache, v_cache


DECODE_STEP_STATICS = ("cfg", "use_pallas", "mesh", "pallas_interpret")
decode_step = partial(
    jax.jit,
    static_argnames=DECODE_STEP_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)(_decode_core)


def _burst_core(
    params: Dict,
    cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    token_ids: jax.Array,      # [S]
    positions: jax.Array,      # [S] write position of the pending token
    block_tables: jax.Array,   # [S, MB]
    seq_lens: jax.Array,       # [S] kv length incl. the pending token
    active: jax.Array,         # [S] bool
    num_steps: int = 8,
    use_pallas: bool = False,
    eos_ids: Optional[jax.Array] = None,  # [E] int32 (early_exit only)
    early_exit: bool = False,
    chunked_kernel: bool = False,  # TPU-only; engine sets per platform
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """`num_steps` fused greedy decode steps →
    (tokens [num_steps, S], caches).

    With `early_exit` (and `eos_ids`), the step loop is a
    `lax.while_loop` that stops once EVERY live slot has emitted an EOS
    token — saving the wasted tail of a fixed-K burst when transcripts
    finish early. Token rows after the exit are zeros; the host already
    truncates at EOS.

    Two-segment attention keeps the big paged cache READ-ONLY inside the
    step scan: the burst's new K/V live in a tiny [L, K, S, Nkv, D] ring
    carried through the scan, and ONE scatter at the end writes them to
    the pages. Scan-carrying the multi-GB cache itself costs a full cache
    copy per step (XLA ping-pongs the carry — measured 18 ms/step at 3 GB
    vs 5 ms at 0.4 GB); this formulation is O(cache) once per burst.

    Sampling is argmax in-graph (the reference's effective setting,
    top_p=0.001). Callers pre-allocate blocks covering
    positions+num_steps; finished sequences decode garbage inside a burst
    and the host truncates at EOS."""
    L = cfg.num_hidden_layers
    s = token_ids.shape[0]
    nq, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    bs = cache_block_size(k_cache)
    K = num_steps
    # cached region length per seq (excludes the pending token)
    cached_lens = seq_lens - 1
    # v2 (chunked streaming) eligibility: single-chip TPU with
    # kernel-friendly shapes (the `chunked_kernel` flag carries the
    # platform/mesh/shape gate from the engine). int8 pages compose:
    # data pages stream half-width; the 8-lane scale pages — which
    # Mosaic can't DMA-slice — ride a lane-aligned XLA window gather
    # (ops/paged_attention.py `paged_attention_pallas_stats_v2`)
    v2_ok = chunked_kernel

    def _v2_stats():
        from ..ops.paged_attention import paged_attention_pallas_stats_v2

        def f(q, kc, vc, bt, lens):
            return paged_attention_pallas_stats_v2(q, kc, vc, bt, lens)

        return f

    if use_pallas:
        if v2_ok:
            # v2 streams multi-page chunks with double-buffered DMAs —
            # v1's (S, MB) one-page grid is launch-overhead-bound at
            # long contexts
            paged_stats = _v2_stats()
        else:
            from ..ops.paged_attention import paged_attention_pallas_stats

            def paged_stats(q, kc, vc, bt, lens):
                return paged_attention_pallas_stats(q, kc, vc, bt, lens)

        k_gathered = v_gathered = None
    else:
        paged_stats = None
        # hoist the page gather OUT of the step loop: the paged cache is
        # read-only inside the burst, so the gathered [L, S, W, Nkv, D]
        # window is identical for every step. Gathering per step costs
        # read+write+reread (3× the window bytes) per layer per step;
        # hoisted, the copy is paid once per burst and each step streams
        # the contiguous window (the irreducible attention read).
        # Memory envelope: the hoist materializes BOTH k and v windows for
        # ALL layers at once — 2·L·S·W·Nkv·D·itemsize bytes. Above the cap
        # (long contexts × large batches) fall back to per-layer gathers
        # inside the step, trading the 3× per-step window traffic for
        # L× less live HBM (ADVICE r2).
        mb = block_tables.shape[1]
        # the gathered windows are materialized at cfg.dtype (int8 pages
        # dequantize in _gather_pages), so the live-HBM estimate uses
        # cfg.dtype's width regardless of the page dtype
        itemsize = jnp.zeros((), cfg.dtype).dtype.itemsize
        hoist_bytes = 2 * L * s * mb * bs * nkv * d * itemsize
        # over-cap route: per-layer gathers pay ~3× window traffic per
        # step; with head-major pages the chunked streaming kernel (v2)
        # beats them at EVERY over-cap window — measured on v5e at S=16:
        # ctx600 5.1-5.6 (v2, bs 16-128) vs 7.8 ms/step (gather),
        # ctx1900 14.1 vs 37.6; int8 pages stream half-width through the
        # same route (ctx1900 7.1 ms/step). Under the cap the hoisted
        # window gather stays (3.46 ≈ v2's 3.48 at ctx120, and it keeps
        # the weights-bound short-context path on plain XLA).
        if v2_ok and hoist_bytes > _HOIST_GATHER_BYTES_CAP:
            paged_stats = _v2_stats()
            k_gathered = v_gathered = None
        elif hoist_bytes <= _HOIST_GATHER_BYTES_CAP:
            k_gathered = jax.vmap(
                lambda c, bt: _gather_pages(c, bt, cfg.dtype),
                in_axes=(0, None),
            )(k_cache, block_tables)
            v_gathered = jax.vmap(
                lambda c, bt: _gather_pages(c, bt, cfg.dtype),
                in_axes=(0, None),
            )(v_cache, block_tables)
        else:
            k_gathered = v_gathered = None

    k_recent0 = jnp.zeros((L, K, s, nkv, d), cfg.dtype)
    v_recent0 = jnp.zeros((L, K, s, nkv, d), cfg.dtype)
    layer_ids = jnp.arange(L)

    def step(carry, i):
        toks, k_recent, v_recent = carry
        pos = positions + i
        cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
        cos, sin = cos[:, None, :], sin[:, None, :]
        x = qwen3.embed_tokens(params, toks).astype(cfg.dtype)

        def layer(lcarry, scanned):
            xc, kr, vr = lcarry
            lp, lid = scanned
            h = rms_norm(xc, lp["input_ln"], cfg.rms_norm_eps)
            qkv = qwen3.mm(h, lp["wqkv"])
            q = qkv[:, : nq * d].reshape(s, nq, d)
            k = qkv[:, nq * d : (nq + nkv) * d].reshape(s, nkv, d)
            v = qkv[:, (nq + nkv) * d :].reshape(s, nkv, d)
            q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            kr = kr.at[lid, i].set(k.astype(kr.dtype))
            vr = vr.at[lid, i].set(v.astype(vr.dtype))

            # segment 1: the immutable paged cache (reads only)
            if paged_stats is not None:  # pallas kernel (v1/v2 routed)
                att1, m1, l1 = paged_stats(
                    q, _cache_layer(k_cache, lid), _cache_layer(v_cache, lid),
                    block_tables, cached_lens,
                )
            elif k_gathered is None:  # over-cap window: per-layer gather
                att1, m1, l1 = _paged_attention_stats(
                    q, _cache_layer(k_cache, lid), _cache_layer(v_cache, lid),
                    block_tables, cached_lens, out_dtype=cfg.dtype,
                )
            else:
                att1, m1, l1 = _window_attention_stats(
                    q, k_gathered[lid], v_gathered[lid], cached_lens,
                )
            # segment 2: this burst's tokens 0..i
            att2, m2, l2 = _recent_attention_stats(
                q, kr[lid], vr[lid], i, nq, nkv, d, K
            )
            att = _merge_softmax_segments(att1, m1, l1, att2, m2, l2)
            xc = xc + qwen3.mm(att.reshape(s, -1).astype(cfg.dtype), lp["wo"])
            h = rms_norm(xc, lp["post_ln"], cfg.rms_norm_eps)
            xc = xc + qwen3._layer_mlp(lp, h)
            return (xc, kr, vr), None

        (x, k_recent, v_recent), _ = jax.lax.scan(
            layer, (x, k_recent, v_recent), (params["layers"], layer_ids)
        )
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = qwen3.lm_logits(params, cfg, x)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, k_recent, v_recent), nxt

    if early_exit and eos_ids is not None:
        buf0 = jnp.zeros((K, s), jnp.int32)
        done0 = ~active  # inactive slots never gate the exit

        def cond(state):
            i, _toks, _kr, _vr, _buf, done = state
            return (i < K) & ~jnp.all(done)

        def body(state):
            i, toks, kr, vr, buf, done = state
            (nxt, kr, vr), _ = step((toks, kr, vr), i)
            buf = buf.at[i].set(nxt)
            done = done | (nxt[:, None] == eos_ids[None, :]).any(axis=-1)
            return (i + 1, nxt, kr, vr, buf, done)

        _, _, k_recent, v_recent, tokens, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), token_ids, k_recent0, v_recent0, buf0, done0),
        )
    else:
        (_, k_recent, v_recent), tokens = jax.lax.scan(
            step, (token_ids, k_recent0, v_recent0),
            jnp.arange(K, dtype=jnp.int32),
        )

    # one scatter writes the whole burst's K/V into the pages
    tok_pos = positions[None, :] + jnp.arange(K, dtype=jnp.int32)[:, None]
    in_block = jnp.minimum(tok_pos // bs, block_tables.shape[1] - 1)
    blocks = jnp.where(
        active[None, :],
        jnp.take_along_axis(
            jnp.broadcast_to(block_tables[None], (K, s, block_tables.shape[1])),
            in_block[:, :, None], axis=2,
        )[:, :, 0],
        0,
    ).reshape(-1)
    offsets = (tok_pos % bs).reshape(-1)
    idx = (slice(None), blocks, offsets)
    k_cache = _cache_write(
        k_cache, idx, k_recent.reshape(L, K * s, nkv, d), cfg.dtype
    )
    v_cache = _cache_write(
        v_cache, idx, v_recent.reshape(L, K * s, nkv, d), cfg.dtype
    )
    return tokens, k_cache, v_cache


DECODE_STEPS_STATICS = ("cfg", "num_steps", "use_pallas", "early_exit",
                        "chunked_kernel")
decode_steps = partial(
    jax.jit,
    static_argnames=DECODE_STEPS_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)(_burst_core)


def _paged_attention_stats(
    q: jax.Array,            # [S, Nq, D]
    k_cache_l: jax.Array,    # [NB, Nkv, BS, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [S, MB]
    kv_lens: jax.Array,       # [S] valid cached length
    out_dtype=None,           # int8-page dequant target (cfg.dtype)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Unnormalized paged attention → (acc [S,Nq,D] f32, max [S,Nq,1],
    denom [S,Nq,1]) for softmax-segment merging."""
    k = _gather_pages(k_cache_l, block_tables, out_dtype)
    v = _gather_pages(v_cache_l, block_tables, out_dtype)
    return _window_attention_stats(q, k, v, kv_lens)


def _window_attention_stats(
    q: jax.Array,        # [S, Nq, D]
    k: jax.Array,        # [S, T, Nkv, D] contiguous (pre-gathered) window
    v: jax.Array,
    kv_lens: jax.Array,  # [S] valid cached length
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Attention stats over a materialized per-seq KV window."""
    s, nq, d = q.shape
    t = k.shape[1]
    nkv = k.shape[2]
    n_rep = nq // nkv
    qf = (q.astype(jnp.float32) * (d ** -0.5)).reshape(s, nkv, n_rep, d)
    logits = jnp.einsum(
        "sgrd,stgd->sgrt", qf.astype(q.dtype), k,
        preferred_element_type=jnp.float32,
    )
    mask = jnp.arange(t)[None, :] < kv_lens[:, None]
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "sgrt,stgd->sgrd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return (acc.reshape(s, nq, d), m.reshape(s, nq, 1), l.reshape(s, nq, 1))


def _recent_attention_stats(q, kr_l, vr_l, i, nq, nkv, d, K):
    """Attention stats over the burst ring kr_l/vr_l [K, S, Nkv, D],
    valid entries j <= i."""
    s = q.shape[0]
    n_rep = nq // nkv
    qf = (q.astype(jnp.float32) * (d ** -0.5)).reshape(s, nkv, n_rep, d)
    logits = jnp.einsum(
        "sgrd,ksgd->sgrk", qf.astype(q.dtype), kr_l,
        preferred_element_type=jnp.float32,
    )
    mask = jnp.arange(K)[None, :] <= i  # [1, K]
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "sgrk,ksgd->sgrd", p.astype(vr_l.dtype), vr_l,
        preferred_element_type=jnp.float32,
    )
    return (acc.reshape(s, nq, d), m.reshape(s, nq, 1), l.reshape(s, nq, 1))


def _merge_softmax_segments(acc1, m1, l1, acc2, m2, l2):
    """Combine two online-softmax segments → normalized attention output."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    denom = l1 * a1 + l2 * a2
    safe = jnp.where(denom == 0.0, 1.0, denom)
    return (acc1 * a1 + acc2 * a2) / safe


def _prefill_core(
    params: Dict,
    cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    inputs_embeds: jax.Array,  # [B, T_bucket, H]
    lengths: jax.Array,         # [B] valid prompt lengths
    block_tables: jax.Array,    # [B, MB]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched prefill of prompt embeddings → (last-token logits [B, V],
    caches). One compiled program per (B, T) bucket replaces the
    sequence-at-a-time CUDA-graph prefills; padding positions are masked
    out of attention and their KV routes to garbage block 0."""
    b, t, _ = inputs_embeds.shape
    bs = cache_block_size(k_cache)
    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    hidden, kvs = qwen3.forward_hidden(
        params, cfg, inputs_embeds.astype(cfg.dtype), pos,
        attn_lengths=lengths, return_kv=True,
    )
    k_new, v_new = kvs  # [L, B, T, Nkv, D]

    tok_pos = jnp.arange(t)[None, :]  # [1, T]
    valid = tok_pos < lengths[:, None]  # [B, T]
    blocks = jnp.where(
        valid,
        jnp.take_along_axis(block_tables, tok_pos // bs, axis=1),
        0,
    )  # [B, T]
    offsets = jnp.broadcast_to(tok_pos % bs, (b, t))
    flat_blocks = blocks.reshape(-1)
    flat_offsets = offsets.reshape(-1)
    l = k_new.shape[0]
    k_flat = k_new.reshape(l, b * t, *k_new.shape[3:])
    v_flat = v_new.reshape(l, b * t, *v_new.shape[3:])
    idx = (slice(None), flat_blocks, flat_offsets)
    k_cache = _cache_write(k_cache, idx, k_flat, cfg.dtype)
    v_cache = _cache_write(v_cache, idx, v_flat, cfg.dtype)

    last_hidden = jnp.take_along_axis(
        hidden, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = qwen3.lm_logits(params, cfg, last_hidden)
    # greedy first tokens computed in-graph (saves a dispatch round trip;
    # non-greedy callers sample from the returned logits instead)
    first_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return (logits, first_ids), k_cache, v_cache


PREFILL_STEP_STATICS = ("cfg",)
prefill_step = partial(
    jax.jit,
    static_argnames=PREFILL_STEP_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)(_prefill_core)


def _prefill_core_packed(
    params: Dict,
    cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    inputs_embeds: jax.Array,  # [TTP, H] packed prompt embeddings
    pos_ids: jax.Array,         # [TTP] within-prompt positions (gaps 0)
    seg_ids: jax.Array,         # [TTP] int32 sequence id, -1 = gap
    write_blocks: jax.Array,    # [TTP] KV page per token (gaps → 0)
    write_offsets: jax.Array,   # [TTP]
    last_idx: jax.Array,        # [B] packed index of each prompt's last token
    use_flash: bool = False,
    k_window: int = 0,
    k_window_rows: int = 0,
    pad_idx: Optional[jax.Array] = None,    # [B, Lmax] dense-route gather
    unpad_idx: Optional[jax.Array] = None,  # [TTP] dense-route scatter
    lens: Optional[jax.Array] = None,       # [B] true prompt lengths
    dense_lmax: int = 0,       # >0 routes attention via the padded dense
                               # layout (ops.attention.prompt_dense_attention)
) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array, jax.Array]:
    """Ragged/varlen prefill: every sequence's prompt tokens packed
    along ONE time axis (segment-block-diagonal causal attention) —
    matmuls run on sum(len_i) rows instead of B·max(len_i), the padded
    batch's ~2× waste at the SPEECHIO prompt mix. Page scatter indices
    are host-computed per token. → ((last-token logits [B, V], greedy
    first ids [B]), caches)."""
    ttp = inputs_embeds.shape[0]
    nq, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    x = inputs_embeds.astype(cfg.dtype)
    cos, sin = rope_cos_sin(pos_ids, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[:, None, :], sin[:, None, :]
    layer_ids = jnp.arange(cfg.num_hidden_layers)

    def body(carry, scanned):
        xc = carry
        lp, lid = scanned
        h = rms_norm(xc, lp["input_ln"], cfg.rms_norm_eps)
        qkv = qwen3.mm(h, lp["wqkv"])  # [TTP, (Nq+2Nkv)D]
        q = qkv[:, : nq * d].reshape(ttp, nq, d)
        k = qkv[:, nq * d : (nq + nkv) * d].reshape(ttp, nkv, d)
        v = qkv[:, (nq + nkv) * d :].reshape(ttp, nkv, d)
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if dense_lmax > 0:
            from ..ops.attention import prompt_dense_attention

            # per-sequence padded DENSE attention: measured SLOWER than
            # the segmented kernels at the bench mix (see the function's
            # docstring), so the ENGINE never passes dense_lmax>0 — this
            # branch exists for the A/B tools and the parity tests
            att = prompt_dense_attention(
                q, k, v, pad_idx, unpad_idx, seg_ids, lens
            ).reshape(ttp, nq * d)
        elif use_flash and k_window_rows > 0:
            from ..ops.flash_attention import (
                flash_attention_segmented_oneshot,
            )

            # one-shot windowed kernel (same rationale as the encoder:
            # the online variant's per-head m/l scratch machinery ran at
            # ~1% MFU — BENCH_NOTES round 4); GQA + causal in-kernel.
            # 16-head prompts split into two 8-head passes inside the
            # wrapper (a fully-unrolled 16-head body exceeds VMEM at any
            # legal block size: 18.1M measured vs the 16M scoped limit)
            att = flash_attention_segmented_oneshot(
                q.reshape(ttp, -1), k.reshape(ttp, -1), v.reshape(ttp, -1),
                seg_ids, nq=nq, nkv=nkv, d=d, causal=True,
                window=k_window_rows,
            )
        elif use_flash:
            from ..ops.flash_attention import flash_attention_segmented

            # bq=256 keeps the head-batched block set (q/out at Nq·D=2048
            # wide, f32 acc, double-buffered) inside VMEM
            att = flash_attention_segmented(
                q.reshape(ttp, -1), k.reshape(ttp, -1), v.reshape(ttp, -1),
                seg_ids, nq=nq, nkv=nkv, d=d, causal=True,
                block_q=256, block_k=512, k_window=k_window,
            )
        else:
            from ..ops.attention import segment_attention_xla

            att = segment_attention_xla(
                q.reshape(ttp, -1), k.reshape(ttp, -1), v.reshape(ttp, -1),
                seg_ids, nq, d, causal=True,
            )
        xc = xc + qwen3.mm(att.astype(cfg.dtype), lp["wo"])
        h = rms_norm(xc, lp["post_ln"], cfg.rms_norm_eps)
        xc = xc + qwen3._layer_mlp(lp, h)
        return xc, (k.astype(cfg.dtype), v.astype(cfg.dtype))

    # K/V stack as scan OUTPUTS; ONE all-layer scatter outside the loop
    # (the padded _prefill_core's structure). Carrying the caches
    # through the scan cost ~2.9 ms of whole-cache layout round-trip
    # copies + 28x2 per-layer scatters (~8 ms of the 27.6 ms prefill28
    # device time — round-5 xplane trace, BENCH_NOTES)
    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], layer_ids))
    idx = (slice(None), write_blocks, write_offsets)
    k_cache = _cache_write(k_cache, idx, ks, cfg.dtype)
    v_cache = _cache_write(v_cache, idx, vs, cfg.dtype)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = x[last_idx]  # [B, H]
    logits = qwen3.lm_logits(params, cfg, last)
    first_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return (logits, first_ids), k_cache, v_cache


prefill_step_packed = partial(
    jax.jit,
    static_argnames=("cfg", "use_flash", "k_window", "k_window_rows"),
    donate_argnames=("k_cache", "v_cache"),
)(_prefill_core_packed)


def _extend_core(
    params: Dict,
    cfg: Qwen3Config,
    k_cache: jax.Array,
    v_cache: jax.Array,
    inputs_embeds: jax.Array,  # [B, T_bucket, H] NEW tokens only
    cached_lens: jax.Array,     # [B] tokens already in the cache
    new_lens: jax.Array,        # [B] valid new tokens in this chunk
    block_tables: jax.Array,    # [B, MB] covering cached + new positions
) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array, jax.Array]:
    """Chunked prefill: extend already-cached sequences with new token
    embeddings. Queries at positions cached_lens+i attend to the paged
    cache (first cached_lens tokens) plus causally within the chunk;
    new K/V are written at positions cached_lens+i. → ((last-token
    logits [B, V], greedy ids [B]), caches).

    This is the incremental-prefill primitive behind PromptSession
    (append-only prompts: streaming audio tokens, chat history)."""
    b, t, _ = inputs_embeds.shape
    bs = cache_block_size(k_cache)
    nq, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    x = inputs_embeds.astype(cfg.dtype)
    pos = cached_lens[:, None] + jnp.arange(t)[None, :]  # [B, T]
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]

    # gather the cached region once per layer inside the scan
    valid_new = jnp.arange(t)[None, :] < new_lens[:, None]  # [B, T]
    write_blocks = jnp.where(
        valid_new,
        jnp.take_along_axis(
            block_tables, jnp.minimum(pos // bs, block_tables.shape[1] - 1),
            axis=1,
        ),
        0,
    ).reshape(-1)
    write_offsets = (pos % bs).reshape(-1)
    layer_ids = jnp.arange(cfg.num_hidden_layers)

    def body(carry, scanned):
        xc = carry
        lp, lid = scanned
        h = rms_norm(xc, lp["input_ln"], cfg.rms_norm_eps)
        qkv = qwen3.mm(h, lp["wqkv"])
        q = qkv[..., : nq * d].reshape(b, t, nq, d)
        k = qkv[..., nq * d : (nq + nkv) * d].reshape(b, t, nkv, d)
        v = qkv[..., (nq + nkv) * d :].reshape(b, t, nkv, d)
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # combined attention: [cached pages ⧺ chunk] with causal
        # masking. The gathers read the PRE-write cache: rows this
        # chunk writes are masked out anyway (mask < cached_lens), so
        # the caches stay scan-INVARIANT and the chunk K/V scatter
        # moves outside the loop (same restructure as
        # _prefill_core_packed — avoids carrying the caches through
        # the scan: whole-cache layout copies + per-layer scatters)
        kcached = _gather_pages(_cache_layer(k_cache, lid), block_tables,
                                cfg.dtype)  # [B, Tc, nkv, d]
        vcached = _gather_pages(_cache_layer(v_cache, lid), block_tables,
                                cfg.dtype)
        tc = kcached.shape[1]
        n_rep = nq // nkv
        qf = (q.astype(jnp.float32) * (d ** -0.5)).reshape(
            b, t, nkv, n_rep, d
        )
        # cached-segment scores [B, T, nkv, r, Tc]
        s1 = jnp.einsum(
            "btgrd,bsgd->btgrs", qf.astype(q.dtype), kcached,
            preferred_element_type=jnp.float32,
        )
        mask_cached = (jnp.arange(tc)[None, :]
                       < cached_lens[:, None])[:, None, None, None, :]
        s1 = jnp.where(mask_cached, s1, -1e30)
        # chunk-segment scores [B, T, nkv, r, T] (causal + valid)
        s2 = jnp.einsum(
            "btgrd,bsgd->btgrs", qf.astype(q.dtype), k,
            preferred_element_type=jnp.float32,
        )
        causal = (jnp.arange(t)[:, None]
                  >= jnp.arange(t)[None, :])[None, :, None, None, :]
        s2 = jnp.where(causal, s2, -1e30)
        s2 = jnp.where(valid_new[:, None, None, None, :], s2, -1e30)
        scores = jnp.concatenate([s1, s2], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1)
        vall = jnp.concatenate([vcached, v.astype(vcached.dtype)], axis=1)
        att = jnp.einsum(
            "btgrs,bsgd->btgrd", probs.astype(vall.dtype), vall,
            preferred_element_type=jnp.float32,
        ).reshape(b, t, nq * d)
        xc = xc + qwen3.mm(att.astype(cfg.dtype), lp["wo"])
        h = rms_norm(xc, lp["post_ln"], cfg.rms_norm_eps)
        xc = xc + qwen3._layer_mlp(lp, h)
        return xc, (k.reshape(b * t, nkv, d).astype(cfg.dtype),
                    v.reshape(b * t, nkv, d).astype(cfg.dtype))

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], layer_ids))
    idx = (slice(None), write_blocks, write_offsets)
    k_cache = _cache_write(k_cache, idx, ks, cfg.dtype)
    v_cache = _cache_write(v_cache, idx, vs, cfg.dtype)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = jnp.take_along_axis(
        x, jnp.maximum(new_lens - 1, 0)[:, None, None].astype(jnp.int32),
        axis=1,
    )[:, 0]
    logits = qwen3.lm_logits(params, cfg, last)
    first_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return (logits, first_ids), k_cache, v_cache


EXTEND_STEP_STATICS = ("cfg",)
extend_step = partial(
    jax.jit,
    static_argnames=EXTEND_STEP_STATICS,
    donate_argnames=("k_cache", "v_cache"),
)(_extend_core)


# ---------------- cache device-layout pinning ----------------
#
# The round-5 xplane decomposition (BENCH_NOTES) found ~2.2 ms/burst plus
# ~2.9 ms/prefill of whole-cache relayout copies at program entry/exit:
# XLA's gather/scatter programs PREFER the caches token-major within each
# page — major_to_minor (0, 1, 3, 2, 4) over the [L, NB, Nkv, BS, D]
# head-major shape, i.e. memory order [L, NB, BS, Nkv, D] — while
# committed arrays default to (0, 1, 2, 3, 4), so every dispatch paid a
# relayout in AND back out. Committing the cache arrays in the preferred
# layout and re-jitting every cache-touching program with its cache
# outputs pinned to the same Format removes both copies (in == out +
# donation → XLA aliases the buffers). Measured −5% per burst at the
# bench geometry (tools/probe_burst_layout.py), tokens identical.
#
# The engine gates the pin (LLM(pin_cache_layout=...)): single-chip TPU,
# bf16 pages, XLA burst route only — Pallas kernels require default
# operand layouts, so pinned caches would ADD a relayout before each
# pallas_call on routes that today have none.
CACHE_TOKEN_MAJOR_M2M = (0, 1, 3, 2, 4)


def cache_pin_format(cache):
    """→ the token-major `Format` for a plain (non-quantized) cache
    array, carrying its current single-device sharding."""
    from jax.experimental.layout import Format, Layout

    return Format(Layout(major_to_minor=CACHE_TOKEN_MAJOR_M2M),
                  cache.sharding)


def _rejit(jitted, statics, out_shardings):
    return partial(
        jax.jit, static_argnames=statics,
        donate_argnames=("k_cache", "v_cache"),
        out_shardings=out_shardings,
    )(jitted.__wrapped__)


@lru_cache(maxsize=None)
def step_fns(fmt=None) -> SimpleNamespace:
    """The engine's eight cache-touching jitted programs as one
    namespace. With `fmt` (a `jax.experimental.layout.Format`), each is
    re-jitted with its k/v cache outputs pinned to that format; with
    None, the module-level default jits are returned. Memoized so
    engines sharing a device/layout share compile caches."""
    from . import fused as _fused
    from . import packed as _packed

    if fmt is None:
        return SimpleNamespace(
            decode_step=decode_step,
            decode_steps=decode_steps,
            prefill_step=prefill_step,
            extend_step=extend_step,
            fused_encode_prefill=_fused.fused_encode_prefill,
            fused_encode_prefill_decode=_fused.fused_encode_prefill_decode,
            fused_encode_prefill_decode_packed=(
                _packed.fused_encode_prefill_decode_packed),
            fused_encode_prefill_decode_packed_multi=(
                _packed.fused_encode_prefill_decode_packed_multi),
        )
    tok = (None, fmt, fmt)  # (tokens|logits, k_cache, v_cache)
    pf = (None, fmt, fmt)   # ((logits, first_ids), k_cache, v_cache)
    return SimpleNamespace(
        decode_step=_rejit(decode_step, DECODE_STEP_STATICS, tok),
        decode_steps=_rejit(decode_steps, DECODE_STEPS_STATICS, tok),
        prefill_step=_rejit(prefill_step, PREFILL_STEP_STATICS, pf),
        extend_step=_rejit(extend_step, EXTEND_STEP_STATICS, pf),
        fused_encode_prefill=_rejit(
            _fused.fused_encode_prefill,
            _fused.FUSED_ENCODE_PREFILL_STATICS, pf),
        fused_encode_prefill_decode=_rejit(
            _fused.fused_encode_prefill_decode,
            _fused.FUSED_ENCODE_PREFILL_DECODE_STATICS, tok),
        fused_encode_prefill_decode_packed=_rejit(
            _packed.fused_encode_prefill_decode_packed,
            _packed.FUSED_PACKED_STATICS, tok),
        fused_encode_prefill_decode_packed_multi=_rejit(
            _packed.fused_encode_prefill_decode_packed_multi,
            _packed.FUSED_PACKED_MULTI_STATICS, tok),
    )
