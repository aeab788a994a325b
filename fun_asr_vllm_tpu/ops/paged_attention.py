"""Pallas TPU paged decode attention.

The TPU kernel replacing vLLM/FlashInfer's CUDA paged attention
(reference infer_kaldidata.py:643 `VLLM_ATTENTION_BACKEND=FLASHINFER`) for
the engine's decode step. Design (Ragged Paged Attention pattern,
PAPERS.md):

- grid = (num_seqs, max_blocks_per_seq); scalar-prefetched block tables
  drive the BlockSpec index_map, so each step DMAs exactly one KV page
  [Nkv, block_size, D] (head-major — per-head dense [BS, D] tiles, see
  engine/kv_cache.py layout note) from HBM into VMEM — non-resident
  pages are never touched (unlike the XLA gather fallback which
  materializes the full padded KV window);
- online-softmax accumulation in f32 VMEM scratch across a sequence's
  pages (flash-attention style m/l running stats);
- whole-sequence early exit: pages past `seq_len` are masked, and the
  output is normalized and written once on the final page iteration;
- q for one sequence is [num_q_heads, head_dim] (16×128 for Qwen3-0.6B) —
  a native VPU/MXU tile.

The XLA fallback (`engine.kv_cache.paged_attention_xla`) is the
correctness reference; tests compare the two in interpret mode on CPU.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P


def _paged_decode_body(
    # scalar prefetch
    block_tables_ref,  # [S, MB] int32 (SMEM)
    seq_lens_ref,      # [S] int32 (SMEM)
    # inputs
    q_ref,             # [Nq, D] VMEM — this sequence's query
    k_page_ref,        # [Nkv, BS, D] VMEM — current page (head-major)
    v_page_ref,        # [Nkv, BS, D] VMEM
    # scratch
    acc_ref,           # [Nq, D] f32
    m_ref,             # [Nq, 128] f32 running max (lane-replicated)
    l_ref,             # [Nq, 128] f32 running denom
    *,
    block_size: int,
    num_kv_heads: int,
    head_dim: int,
    num_q_heads: int,
    k_scale_ref=None,  # [Nkv, BS] f32 — int8-page dequant scales
    v_scale_ref=None,
):
    """Shared online-softmax page accumulation (init + process).

    With `k_scale_ref`/`v_scale_ref` the pages are int8 and dequantize
    IN-KERNEL after the (half-width) HBM→VMEM DMA — the int8 KV cache's
    bandwidth saving composes with the kernel instead of forcing the XLA
    gather path (vLLM kv_cache_dtype analogue)."""
    s = pl.program_id(0)
    j = pl.program_id(1)
    seq_len = seq_lens_ref[s]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j * block_size < seq_len)
    def _process():
        r = num_q_heads // num_kv_heads
        scale = head_dim ** -0.5
        q = q_ref[:].astype(jnp.float32) * scale  # [Nq, D]
        k = k_page_ref[:].astype(jnp.float32)  # [Nkv, BS, D] head-major
        v = v_page_ref[:].astype(jnp.float32)
        if k_scale_ref is not None:
            k = k * k_scale_ref[:].reshape(num_kv_heads, block_size, 1)
            v = v * v_scale_ref[:].reshape(num_kv_heads, block_size, 1)

        # GQA scores: head h uses kv group h // r; head-major pages put
        # the batch (head) dim leading on both operands — no transposes
        qg = q.reshape(num_kv_heads, r, head_dim)
        scores = jax.lax.dot_general(
            qg, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Nkv, r, BS]
        scores = scores.reshape(num_q_heads, block_size)

        token_pos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (num_q_heads, block_size), 1
        )
        scores = jnp.where(token_pos < seq_len, scores, -jnp.inf)

        m_prev = m_ref[:, :1]  # [Nq, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)  # [Nq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(scores - m_new)  # [Nq, BS]
        alpha = jnp.exp(m_prev - m_new)  # [Nq, 1]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

        pg = p.reshape(num_kv_heads, r, block_size)
        pv = jax.lax.dot_general(
            pg, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(num_q_heads, head_dim)

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)


def _paged_decode_kernel(
    block_tables_ref, seq_lens_ref,
    q_ref, k_page_ref, v_page_ref,
    out_ref,           # [Nq, D] VMEM
    acc_ref, m_ref, l_ref,
    *, block_size: int, num_kv_heads: int, head_dim: int, num_q_heads: int,
    k_scale_ref=None, v_scale_ref=None,
):
    j = pl.program_id(1)
    mb = pl.num_programs(1)
    _paged_decode_body(
        block_tables_ref, seq_lens_ref, q_ref, k_page_ref, v_page_ref,
        acc_ref, m_ref, l_ref,
        block_size=block_size, num_kv_heads=num_kv_heads,
        head_dim=head_dim, num_q_heads=num_q_heads,
        k_scale_ref=k_scale_ref, v_scale_ref=v_scale_ref,
    )

    @pl.when(j == mb - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out_ref[:] = (acc_ref[:] / safe_l).astype(out_ref.dtype)


def _paged_decode_stats_kernel(
    block_tables_ref, seq_lens_ref,
    q_ref, k_page_ref, v_page_ref,
    acc_out_ref,   # [Nq, D] f32 — unnormalized
    m_out_ref,     # [Nq, 128] f32
    l_out_ref,     # [Nq, 128] f32
    acc_ref, m_ref, l_ref,
    *, block_size: int, num_kv_heads: int, head_dim: int, num_q_heads: int,
    k_scale_ref=None, v_scale_ref=None,
):
    """Like `_paged_decode_kernel` but emits online-softmax stats
    (acc, m, l) for segment merging in the two-segment burst
    (engine/kv_cache.py `_merge_softmax_segments`)."""
    j = pl.program_id(1)
    mb = pl.num_programs(1)
    _paged_decode_body(
        block_tables_ref, seq_lens_ref, q_ref, k_page_ref, v_page_ref,
        acc_ref, m_ref, l_ref,
        block_size=block_size, num_kv_heads=num_kv_heads,
        head_dim=head_dim, num_q_heads=num_q_heads,
        k_scale_ref=k_scale_ref, v_scale_ref=v_scale_ref,
    )

    @pl.when(j == mb - 1)
    def _finalize():
        # m=-inf (fully-empty cache) merges badly downstream; clamp
        m = m_ref[:]
        acc_out_ref[:] = acc_ref[:]
        m_out_ref[:] = jnp.where(jnp.isfinite(m), m, -1e30)
        l_out_ref[:] = l_ref[:]


def _page_in_specs(nq, d, bs, nkv, quantized: bool):
    """BlockSpecs for [q, k-page(s), v-page(s)]: int8 caches add a
    [Nkv, BS] f32 scale page after each data page."""
    q_spec = pl.BlockSpec((1, nq, d), lambda i, j, bt, sl: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    page = pl.BlockSpec((1, nkv, bs, d),
                        lambda i, j, bt, sl: (bt[i, j], 0, 0, 0),
                        memory_space=pltpu.VMEM)
    if not quantized:
        return [q_spec, page, page]
    scale = pl.BlockSpec((1, nkv, bs),
                         lambda i, j, bt, sl: (bt[i, j], 0, 0),
                         memory_space=pltpu.VMEM)
    return [q_spec, page, scale, page, scale]


def _page_operands(q, k_cache_l, v_cache_l):
    """(operands, quantized, (bs, nkv)) for array or int8-dict caches."""
    if isinstance(k_cache_l, dict):
        nb, nkv, bs, _ = k_cache_l["q"].shape
        ops = (q, k_cache_l["q"], k_cache_l["s"].reshape(nb, nkv, bs),
               v_cache_l["q"], v_cache_l["s"].reshape(nb, nkv, bs))
        return ops, True, (bs, nkv)
    nb, nkv, bs, _ = k_cache_l.shape
    return (q, k_cache_l, v_cache_l), False, (bs, nkv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention_pallas(
    q: jax.Array,           # [S, Nq, D]
    k_cache_l,              # [NB, Nkv, BS, D] or int8 {"q", "s"} pytree
    v_cache_l,
    block_tables: jax.Array,  # [S, MB] int32
    seq_lens: jax.Array,      # [S] int32
    *,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for `paged_attention_xla` (engine/kv_cache.py) on TPU.
    int8 pages dequantize in-kernel (half-width DMA)."""
    s, nq, d = q.shape
    operands, quantized, (bs, nkv) = _page_operands(q, k_cache_l, v_cache_l)
    mb = block_tables.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, mb),
        in_specs=_page_in_specs(nq, d, bs, nkv, quantized),
        out_specs=pl.BlockSpec(
            (1, nq, d), lambda i, j, bt, sl: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((nq, d), jnp.float32),
            pltpu.VMEM((nq, 128), jnp.float32),
            pltpu.VMEM((nq, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _paged_decode_kernel,
        block_size=bs, num_kv_heads=nkv, head_dim=d, num_q_heads=nq,
    )

    if quantized:
        def _kernel_squeezed(bt, sl, q_r, k_r, ks_r, v_r, vs_r, o_r,
                             acc, m, l):
            kernel(bt, sl, q_r.at[0], k_r.at[0], v_r.at[0], o_r.at[0],
                   acc, m, l, k_scale_ref=ks_r.at[0], v_scale_ref=vs_r.at[0])
    else:
        def _kernel_squeezed(bt, sl, q_r, k_r, v_r, o_r, acc, m, l):
            # block shapes carry a leading 1 (seq dim); present refs 2-3D
            kernel(bt, sl, q_r.at[0], k_r.at[0], v_r.at[0], o_r.at[0],
                   acc, m, l)

    out = pl.pallas_call(
        _kernel_squeezed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, nq, d), q.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32), *operands)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention_pallas_stats(
    q: jax.Array,           # [S, Nq, D]
    k_cache_l,              # [NB, Nkv, BS, D] or int8 {"q", "s"} pytree
    v_cache_l,
    block_tables: jax.Array,  # [S, MB] int32
    seq_lens: jax.Array,      # [S] int32
    *,
    interpret: bool = False,
):
    """Unnormalized online-softmax stats → (acc [S,Nq,D] f32, m [S,Nq,1],
    l [S,Nq,1]) — the Pallas counterpart of
    `engine.kv_cache._paged_attention_stats` for the two-segment burst.
    Only touches resident pages (the XLA gather reads the padded window);
    int8 pages dequantize in-kernel."""
    s, nq, d = q.shape
    operands, quantized, (bs, nkv) = _page_operands(q, k_cache_l, v_cache_l)
    mb = block_tables.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, mb),
        in_specs=_page_in_specs(nq, d, bs, nkv, quantized),
        out_specs=[
            pl.BlockSpec((1, nq, d), lambda i, j, bt, sl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 128), lambda i, j, bt, sl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 128), lambda i, j, bt, sl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nq, d), jnp.float32),
            pltpu.VMEM((nq, 128), jnp.float32),
            pltpu.VMEM((nq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_decode_stats_kernel,
        block_size=bs, num_kv_heads=nkv, head_dim=d, num_q_heads=nq,
    )

    if quantized:
        def _squeezed(bt, sl, q_r, k_r, ks_r, v_r, vs_r,
                      acc_o, m_o, l_o, acc, m, l):
            kernel(bt, sl, q_r.at[0], k_r.at[0], v_r.at[0],
                   acc_o.at[0], m_o.at[0], l_o.at[0], acc, m, l,
                   k_scale_ref=ks_r.at[0], v_scale_ref=vs_r.at[0])
    else:
        def _squeezed(bt, sl, q_r, k_r, v_r, acc_o, m_o, l_o, acc, m, l):
            kernel(bt, sl, q_r.at[0], k_r.at[0], v_r.at[0],
                   acc_o.at[0], m_o.at[0], l_o.at[0], acc, m, l)

    acc, m, l = pl.pallas_call(
        _squeezed,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, nq, d), jnp.float32),
            jax.ShapeDtypeStruct((s, nq, 128), jnp.float32),
            jax.ShapeDtypeStruct((s, nq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32), *operands)
    return acc, m[:, :, :1], l[:, :, :1]


# ---------------------------------------------------------------------------
# v2: multi-page chunks with manual double-buffered DMA
# ---------------------------------------------------------------------------

def _chunked_stats_kernel(
    block_tables_ref,  # [S, MB] int32 (SMEM, scalar-prefetched)
    seq_lens_ref,      # [S] int32 (SMEM)
    q_ref,             # [1, Nq, D] VMEM — this sequence's query
    k_hbm,             # [NB, Nkv, BS, D] ANY/HBM — whole cache, head-major
    v_hbm,
    *rest,             # [ks_ref, vs_ref,] acc_out, m_out, l_out
    block_size: int,
    pages_per_chunk: int,
    num_kv_heads: int,
    head_dim: int,
    num_q_heads: int,
    quantized: bool = False,
    num_buffers: int = 2,
    dma_only: bool = False,
):
    """One grid step = one sequence. Pages stream HBM→VMEM in chunks of
    `pages_per_chunk` (PP·BS tokens — an MXU-sized score tile) with
    double-buffered manual DMAs, so per-page grid/launch overhead — the
    v1 kernel's long-context killer (grid (S, MB) at 16-token pages) —
    is amortized PP× and the copy of chunk c+1 overlaps chunk c's math.

    HEAD-MAJOR pages are load-bearing here: each page lands as dense
    per-head [BS, D] tiles in a [Nkv, CT, D] chunk buffer, so per-head
    k/v views are leading-axis indexes (free). The previous token-major
    buffer [CT, Nkv, D] made k[:, h, :] a sublane-strided relayout copy
    per head per chunk (~4 ms/step of copy work serialized against the
    DMAs at 2k windows), while flattening to [CT, Nkv·D] scattered the
    DMA writes into 256 B runs (dma-floor 13.4 → 22.9 ms/step). Measured
    on v5e at ctx=1900: 405 → 509 GB/s effective KV streaming, with the
    chunk math now fully hidden behind the copies.

    int8 pages (``quantized``): the data pages ride the same manual DMAs
    at half width; the per-(token, head) dequant scales arrive as
    lane-aligned VMEM inputs ``ks_ref``/``vs_ref`` [1, Nkv, MC·CT] f32
    (window-gathered by the caller — Mosaic cannot DMA-slice the cache's
    8-lane scale pages directly) and are applied in score/probability
    space: q·(k·s) = (q·k)·s per token column, and P·(v·s) = (P·s)·v, so
    the int8 pages never need an in-VMEM dequant pass.

    ``dma_only`` (env FUN_ASR_V2_DMA_ONLY) streams pages but skips the
    math — a profiling aid that exposes the kernel's DMA floor in situ."""
    if quantized:
        ks_ref, vs_ref, acc_out_ref, m_out_ref, l_out_ref = rest
    else:
        ks_ref = vs_ref = None
        acc_out_ref, m_out_ref, l_out_ref = rest
    s = pl.program_id(0)
    seq_len = seq_lens_ref[s]
    bs, pp = block_size, pages_per_chunk
    chunk_toks = bs * pp
    nq, nkv, d = num_q_heads, num_kv_heads, head_dim
    r = nq // nkv
    mb = block_tables_ref.shape[1]
    max_chunks = (mb + pp - 1) // pp
    # chunks actually needed by this sequence's kv length
    nc = jnp.minimum(
        jax.lax.div(seq_len + chunk_toks - 1, chunk_toks), max_chunks
    )

    def body(k_buf, v_buf, acc_ref, m_ref, l_ref, sems):
        # k_buf/v_buf: [NBUF, Nkv, PP·BS, D] VMEM — each head-major page
        # lands as Nkv dense [BS, D] tiles at contiguous token offsets;
        # sems: DMA [NBUF, 2, PP]

        def _copies(c, slot, p):
            pid = block_tables_ref[s, jnp.minimum(c * pp + p, mb - 1)]
            return [
                pltpu.make_async_copy(
                    k_hbm.at[pid], k_buf.at[slot, :, pl.ds(p * bs, bs)],
                    sems.at[slot, 0, p]),
                pltpu.make_async_copy(
                    v_hbm.at[pid], v_buf.at[slot, :, pl.ds(p * bs, bs)],
                    sems.at[slot, 1, p]),
            ]

        def start_chunk(c, slot):
            # PP scattered pages → per-page DMAs on this slot's sems
            for p in range(pp):
                for op in _copies(c, slot, p):
                    op.start()

        def wait_chunk(c, slot):
            for p in range(pp):
                for op in _copies(c, slot, p):
                    op.wait()

        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

        nbuf = num_buffers

        @pl.when(nc > 0)
        def _run():
            # prologue: fill nbuf-1 slots ahead
            for i in range(nbuf - 1):
                if i == 0:
                    start_chunk(0, 0)
                else:
                    @pl.when(i < nc)
                    def _pro(i=i):
                        start_chunk(i, i)

            def loop(c, _):
                slot = jax.lax.rem(c, nbuf)

                @pl.when(c + nbuf - 1 < nc)
                def _prefetch():
                    start_chunk(c + nbuf - 1,
                                jax.lax.rem(c + nbuf - 1, nbuf))

                wait_chunk(c, slot)

                if dma_only:  # profiling: stream pages, skip the math
                    return _

                scale = head_dim ** -0.5
                # keep operands in the page dtype (bf16 MXU-native, f32
                # accumulation via preferred_element_type). Per-KV-head
                # static loop in the flash-native q·kᵀ orientation; the
                # head-major chunk buffer makes every per-head view a
                # free leading-axis index.
                q = q_ref[0]                                  # [Nq, D]
                if quantized:
                    # scale slice offsets are chunk-aligned; the caller
                    # forces CT % 128 == 0 so dynamic LANE slices of the
                    # [1, Nkv, MC·CT] scale inputs stay 128-aligned
                    sc_off = pl.multiple_of(c * chunk_toks, 128)

                qg = q.reshape(nkv, r, d)
                head_scores = []
                for h in range(nkv):
                    # [r, D] · [CT, D]^T → [r, CT]
                    k_h = k_buf[slot, h]
                    if quantized:
                        # int8 values are exact in f32; the per-token
                        # dequant scale lands on the SCORES instead
                        # (q·(k·s) = (q·k)·s column-wise)
                        k_h = k_h.astype(jnp.float32)
                    s_h = jax.lax.dot_general(
                        qg[h].astype(k_h.dtype), k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if quantized:
                        s_h = s_h * ks_ref[0, h:h + 1,
                                           pl.ds(sc_off, chunk_toks)]
                    head_scores.append(s_h)
                scores = jnp.concatenate(
                    head_scores, axis=0
                ).reshape(nq, chunk_toks) * scale

                token_pos = c * chunk_toks + jax.lax.broadcasted_iota(
                    jnp.int32, (nq, chunk_toks), 1
                )
                scores = jnp.where(token_pos < seq_len, scores, -1e30)

                m_prev = m_ref[:, :1]
                l_prev = l_ref[:, :1]
                m_cur = jnp.max(scores, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p_ = jnp.exp(scores - m_new)
                # fully-masked chunks must contribute 0, not exp(-1e30+1e30)
                p_ = jnp.where(token_pos < seq_len, p_, 0.0)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + jnp.sum(p_, axis=-1, keepdims=True)

                if quantized:
                    # dequant rides the probabilities: P·(v·s) = (P·s)·v
                    pg = p_.reshape(nkv, r, chunk_toks)
                else:
                    pg = p_.astype(v_buf.dtype).reshape(nkv, r, chunk_toks)
                head_pv = []
                for h in range(nkv):
                    # [r, CT] · [CT, D] → [r, D]
                    p_h, v_h = pg[h], v_buf[slot, h]
                    if quantized:
                        p_h = p_h * vs_ref[0, h:h + 1,
                                           pl.ds(sc_off, chunk_toks)]
                        v_h = v_h.astype(jnp.float32)
                    head_pv.append(jax.lax.dot_general(
                        p_h, v_h,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ))
                pv = jnp.concatenate(head_pv, axis=0).reshape(nq, d)

                acc_ref[:] = acc_ref[:] * alpha + pv
                m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
                l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
                return _

            jax.lax.fori_loop(0, nc, loop, None)

        acc_out_ref[0] = acc_ref[:]
        m_out_ref[0] = m_ref[:]
        l_out_ref[0] = l_ref[:]

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((num_buffers, nkv, pp * bs, d), k_hbm.dtype),
        v_buf=pltpu.VMEM((num_buffers, nkv, pp * bs, d), v_hbm.dtype),
        acc_ref=pltpu.VMEM((nq, d), jnp.float32),
        m_ref=pltpu.VMEM((nq, 128), jnp.float32),
        l_ref=pltpu.VMEM((nq, 128), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((num_buffers, 2, pp)),
    )


def paged_attention_pallas_stats_v2(
    q: jax.Array,             # [S, Nq, D]
    k_cache_l: jax.Array,     # [NB, Nkv, BS, D] (bf16/f32 pages)
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [S, MB] int32
    seq_lens: jax.Array,      # [S] int32
    *,
    chunk_tokens: int = 512,
    num_buffers: int = 2,
    interpret: bool = False,
):
    """Multi-page streaming paged-decode stats (acc, m[:, :, :1], l).

    Replaces v1's (S, MB) one-page-per-grid-step layout — whose per-step
    launch overhead dominates at long contexts — with grid (S,) and an
    in-kernel double-buffered page streamer.

    int8 pages ({"q", "s"} pytrees): the data pages stream through the
    same half-width manual DMAs; the per-(token, head) scales are
    window-gathered by XLA into a lane-aligned [S, Nkv, MC·CT] input
    (~3% of the page bytes) and applied to scores/probabilities
    in-kernel. (Head-major scale pages [Nkv, BS] are now themselves
    lane-aligned, so DMA-ing them alongside the data pages is a possible
    follow-up that would drop the XLA gather.)"""
    quantized = isinstance(k_cache_l, dict)
    if quantized:
        k_pages, v_pages = k_cache_l["q"], v_cache_l["q"]
        k_sc, v_sc = k_cache_l["s"], v_cache_l["s"]  # [NB, Nkv, BS, 1]
    else:
        k_pages, v_pages = k_cache_l, v_cache_l
    nb, nkv, bs, _ = k_pages.shape
    s, nq, d = q.shape
    mb = block_tables.shape[1]
    # VMEM envelope: double-buffered k+v chunks live in scratch
    # (2·2·chunk_tokens·Nkv·D·2B ≈ 4 MB at Qwen3-0.6B shapes and the
    # default 512-token chunk); bigger chunks amortize per-chunk fixed
    # costs (semaphore waits, loop overhead, per-head matmuls)
    pp = max(1, min(mb, chunk_tokens // bs if bs <= chunk_tokens else 1))
    if quantized:
        # in-kernel scale slices are dynamic LANE slices → chunk_toks
        # must be a multiple of 128 (pp a multiple of 128/gcd(bs, 128));
        # alignment wins over the mb clamp (page-id DMAs clamp + the
        # score mask kills phantom tokens)
        align = 128 // math.gcd(bs, 128)
        pp = max(align, (pp // align) * align)
    max_chunks = -(-mb // pp)

    in_specs = [
        pl.BlockSpec((1, nq, d), lambda i, bt, sl: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [q, k_pages, v_pages]
    if quantized:
        lanes = max_chunks * pp * bs

        def _window_scales(sc):
            # [NB, Nkv, BS, 1] → per-seq window with each head's
            # per-token scales as contiguous LANES (the layout the
            # kernel's score multiply wants), padded to the chunk grid.
            # Bytes ≈ window/32 (f32 scale per int8·D page row).
            w = jnp.take(sc[..., 0], block_tables.reshape(-1), axis=0)
            w = w.reshape(s, mb, nkv, bs).transpose(0, 2, 1, 3)
            w = w.reshape(s, nkv, mb * bs)
            if lanes > mb * bs:
                w = jnp.pad(w, ((0, 0), (0, 0), (0, lanes - mb * bs)))
            return w

        sc_spec = pl.BlockSpec((1, nkv, lanes), lambda i, bt, sl: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [sc_spec, sc_spec]
        operands += [_window_scales(k_sc), _window_scales(v_sc)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, nq, d), lambda i, bt, sl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 128), lambda i, bt, sl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 128), lambda i, bt, sl: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _chunked_stats_kernel,
        block_size=bs, pages_per_chunk=pp,
        num_kv_heads=nkv, head_dim=d, num_q_heads=nq,
        quantized=quantized, num_buffers=num_buffers,
        dma_only=bool(os.environ.get("FUN_ASR_V2_DMA_ONLY")),
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, nq, d), jnp.float32),
            jax.ShapeDtypeStruct((s, nq, 128), jnp.float32),
            jax.ShapeDtypeStruct((s, nq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32), *operands)
    return acc, m[:, :, :1], l[:, :, :1]


def paged_attention_pallas_tp(
    q: jax.Array,             # [S, Nq, D] (q heads sharded over `axis`)
    k_cache_l,                # [NB, Nkv, BS, D] or int8 {"q","s"} pytree
    v_cache_l,                #   (kv heads = dim 1 sharded over `axis`)
    block_tables: jax.Array,  # [S, MB] int32 (replicated)
    seq_lens: jax.Array,      # [S] int32 (replicated)
    *,
    mesh,
    axis: str = "tp",
    interpret: bool = False,
) -> jax.Array:
    """Tensor-parallel paged decode attention: shard_map over the mesh
    `axis` so every device runs the Pallas kernel on its LOCAL slice of
    the head-major page cache and the matching q-head slice — no
    collectives (attention is embarrassingly parallel over KV heads;
    the Megatron wo-projection's psum happens outside, inserted by
    GSPMD). GQA grouping stays shard-local because the engine requires
    num_key_value_heads % tp == 0 (engine.py mesh gate) and q-head
    group g occupies the contiguous block [g*r, (g+1)*r), so contiguous
    per-device head chunks never split a group. Page tables are global
    (replicated): every shard addresses the same block ids, each into
    its own head slice — the vLLM TP layout, re-owned for TPU."""
    heads = P(None, axis, None)
    pages = P(None, axis, None, None)
    kv_spec = ({"q": pages, "s": pages}
               if isinstance(k_cache_l, dict) else pages)

    def local(q_, kl_, vl_, bt_, sl_):
        return paged_attention_pallas(q_, kl_, vl_, bt_, sl_,
                                      interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(heads, kv_spec, kv_spec, P(None, None), P(None)),
        out_specs=heads,
        check_vma=False,
    )(q, k_cache_l, v_cache_l, block_tables, seq_lens)
