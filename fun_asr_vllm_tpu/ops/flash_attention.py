"""Pallas TPU flash attention (prefill / encoder).

The XLA attention path materializes the [B, N, T, T] score tensor in HBM
(653 MB at the benchmark's batch-16 / T≈1600 encoder shapes). This kernel
streams K/V blocks through VMEM with online softmax — the standard
flash-attention tiling — supporting:

- causal or full attention (LLM prefill vs SAN-M encoder),
- per-batch KV length masking (ragged batches),
- GQA without materializing repeated KV: the BlockSpec index_map points
  each query head at its KV group (head h reads kv row h // n_rep).

Layouts: q [B, T, Nq, D], k/v [B, S, Nkv, D] — same contract as
`ops.attention.gqa_attention`, which remains the XLA reference
(tests compare the two in interpret mode).

Two lowerings share one kernel body:

- **column-block fast path** (T, S divisible into lane-aligned blocks):
  heads are addressed as D-wide COLUMN blocks of the native
  ``[B, T, N*D]`` matmul-output layout, so q/k/v flow straight from the
  qkv projection into the kernel and the output flows straight into the
  out projection — zero transposes, pads, concats or slices. Profiling
  showed those XLA data-formatting ops around the old head-major path
  cost ~1.1 ms/encoder-layer at [16,1598,512], ~2× the kernel itself.
- **head-major legacy path** (odd shapes): moveaxis to [B*N, T, D] and
  pad T/S to block multiples, as before.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_body(
    kv_len,        # scalar int32 valid kv length for this batch row
    q_ref,         # [1, BQ, D]
    k_ref,         # [1, BK, D]
    v_ref,         # [1, BK, D]
    out_ref,       # [1, BQ, D]
    acc_ref,       # [BQ, D] f32
    m_ref,         # [BQ, 128] f32
    l_ref,         # [BQ, 128] f32
    *,
    kj,
    nk,
    block_q: int,
    block_k: int,
    q_start,
    k_start,
    causal: bool,
    scale: float = 1.0,
    single_k: bool = False,
):
    """Shared online-softmax tile body (one (q-block, k-block) step).

    `single_k` (static): the k grid dim has exactly ONE block, so the
    online-softmax running machinery (scratch init, running max/denom,
    acc rescale, m/l broadcasts — ~8 extra [BQ,·] VPU passes) collapses
    to a plain one-shot softmax. This is the common encoder case: the
    auto-picker chooses whole-sequence k blocks up to T=1408.
    """

    # skip fully-masked blocks: beyond kv_len, strictly future (causal), or
    # padding query rows. Both call sites (encoder self-attention, LLM
    # prefill) have query position == kv position, so q rows at/after
    # kv_len are padding — skipping them is the big ragged-batch win
    # (~half the tile area at the SPEECHIO duration mix); their outputs
    # finalize to zeros.
    in_range = jnp.logical_and(k_start < kv_len, q_start < kv_len)
    if causal:
        in_range = jnp.logical_and(in_range, k_start <= q_start + block_q - 1)

    if single_k:
        # the one-shot body writes out_ref on both branches and never
        # reads acc/m/l — the scratch init below would be pure waste
        _flash_body_single(
            kv_len, q_ref, k_ref, v_ref, out_ref, in_range,
            block_q=block_q, block_k=block_k, q_start=q_start,
            k_start=k_start, causal=causal, scale=scale,
        )
        return

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(in_range)
    def _process():
        # keep the MXU inputs in the stored dtype (bf16 runs 8× f32 rate);
        # accumulate f32. The softmax scale is folded into q (either
        # pre-folded by the legacy wrapper or applied here on the small
        # [BQ, D] tile), saving a [BQ, BK] multiply per tile on the VPU.
        q = q_ref[0]  # [BQ, D]
        if scale != 1.0:
            q = q * jnp.asarray(scale, q.dtype)
        k = k_ref[0]  # [BK, D]
        v = v_ref[0]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK] f32 (Mosaic requires 32-bit matmul accumulators)
        if causal:
            kpos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            qpos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(kpos < kv_len, kpos <= qpos)
            scores = jnp.where(mask, scores, _NEG_INF)
        else:
            # kv-length masking depends only on the column: one broadcast
            # add of a [1, BK] bias row beats a [BQ, BK] compare+select
            kpos_row = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            bias = jnp.where(kpos_row < kv_len, 0.0, _NEG_INF)
            scores = scores + bias

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # measured (round 3): a bf16 exp/sum variant saved nothing on v5e
        # (75.1 vs 73.5 ms per 50-layer encode) at a 3% output error —
        # the f32 softmax stays
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kj == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / safe_l).astype(out_ref.dtype)


def _flash_body_single(
    kv_len, q_ref, k_ref, v_ref, out_ref, in_range,
    *, block_q: int, block_k: int, q_start, k_start, causal: bool,
    scale: float,
):
    """One-shot softmax tile (single k-block grids): scores → mask →
    softmax → pv → normalized write, no scratch accumulators."""

    @pl.when(in_range)
    def _process():
        q = q_ref[0]
        if scale != 1.0:
            q = q * jnp.asarray(scale, q.dtype)
        k = k_ref[0]
        v = v_ref[0]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if causal:
            kpos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            qpos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(kpos < kv_len, kpos <= qpos)
            scores = jnp.where(mask, scores, _NEG_INF)
        else:
            kpos_row = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            bias = jnp.where(kpos_row < kv_len, 0.0, _NEG_INF)
            scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # q rows at/past kv_len are padding: zero them (parity with the
        # online path, whose l=0 → safe_l → 0 for those rows)
        qpos_col = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        out = jnp.where(qpos_col < kv_len, pv / jnp.maximum(l, 1e-30), 0.0)
        out_ref[0] = out.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(in_range))
    def _zeros():
        out_ref[0] = jnp.zeros_like(out_ref[0])


def _flash_kernel(
    kv_lens_ref, q_ref, k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref,
    *, block_q: int, block_k: int, num_q_heads: int, causal: bool,
):
    """Legacy head-major grid: (B*Nq, T/BQ, S/BK) over [B*N, T, D]."""
    bn = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)
    _flash_body(
        kv_lens_ref[bn // num_q_heads], q_ref, k_ref, v_ref, out_ref,
        acc_ref, m_ref, l_ref,
        kj=kj, nk=nk, block_q=block_q, block_k=block_k,
        q_start=qi * block_q, k_start=kj * block_k, causal=causal,
    )


def _flash_kernel_cb(
    kv_lens_ref, q_ref, k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref,
    *, block_q: int, block_k: int, causal: bool, scale: float,
    single_k: bool = False,
):
    """Column-block grid: (B, Nq, T/BQ, S/BK) over native [B, T, N*D]."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)
    _flash_body(
        kv_lens_ref[b], q_ref, k_ref, v_ref, out_ref,
        acc_ref, m_ref, l_ref,
        kj=kj, nk=nk, block_q=block_q, block_k=block_k,
        q_start=qi * block_q, k_start=kj * block_k, causal=causal,
        scale=scale, single_k=single_k,
    )


def _flash_kernel_seg(
    kmin_ref, kmax_ref,  # scalar prefetch: k-block window per q-block
    seg_q_ref,     # [1, 8, BQ] int32 segment id per q row (row-major dup)
    seg_k_ref,     # [1, 8, BK]
    q_ref,         # [1, BQ, Nq*D] ALL heads
    k_ref,         # [1, BK, Nkv*D]
    v_ref,         # [1, BK, Nkv*D]
    out_ref,       # [1, BQ, Nq*D]
    acc_ref,       # [BQ, Nq*D] f32
    m_ref,         # [BQ, 128] f32 — column h holds head h's running max
    l_ref,         # [BQ, 128] f32
    *,
    nq: int,
    n_rep: int,
    d: int,
    block_q: int,
    block_k: int,
    causal: bool,
    scale: float,
):
    """Packed/varlen HEAD-BATCHED grid: (T/BQ, W) over [1, T, N*D] with
    per-token SEGMENT IDS — attention is block-diagonal over segments
    (gap tokens carry seg id -1 and match nothing).

    - The k grid dim is a WINDOW of W k-blocks anchored at kmin[qi]
      (each q-block's segments are contiguous, so their keys span few
      k-blocks): out-of-window tiles pay neither compute nor DMA — a
      dense (T/BQ)×(T/BK) grid still fetches blocks for skipped tiles,
      which measured ~2× the useful work at the bench's 11k-frame pack.
    - ALL heads process inside one program (an unrolled loop over
      D-wide column slices): ~Nq× fewer grid programs, one mask
      computation per tile instead of per (head, tile) — per-program
      setup overhead, not FLOPs, dominated the per-head variant."""
    qi = pl.program_id(0)
    w = pl.program_id(1)
    nw = pl.num_programs(1)
    kj = kmin_ref[qi] + w
    q_start = qi * block_q
    k_start = kj * block_k

    @pl.when(w == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    in_range = kj <= kmax_ref[qi]
    if causal:
        in_range = jnp.logical_and(in_range,
                                   k_start <= q_start + block_q - 1)

    @pl.when(in_range)
    def _process():
        seg_q = seg_q_ref[0, 0, :]  # [BQ]
        seg_k = seg_k_ref[0, 0, :]  # [BK]
        mask = jnp.logical_and(
            seg_q[:, None] == seg_k[None, :], seg_q[:, None] >= 0
        )
        if causal:
            kpos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            qpos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, kpos <= qpos)

        for h in range(nq):
            g = h // n_rep
            q = q_ref[0, :, h * d : (h + 1) * d]
            if scale != 1.0:
                q = q * jnp.asarray(scale, q.dtype)
            k = k_ref[0, :, g * d : (g + 1) * d]
            v = v_ref[0, :, g * d : (g + 1) * d]
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            scores = jnp.where(mask, scores, _NEG_INF)
            m_prev = m_ref[:, h : h + 1]
            l_prev = l_ref[:, h : h + 1]
            m_cur = jnp.max(scores, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(scores - m_new)
            # fully-masked rows (gap q tokens): exp(-1e30 - max) can
            # still be 1.0 when the whole row is -1e30; zero them
            p = jnp.where(mask, p, 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:, h * d : (h + 1) * d] = (
                acc_ref[:, h * d : (h + 1) * d] * alpha + pv
            )
            m_ref[:, h : h + 1] = m_new
            l_ref[:, h : h + 1] = l_new

    @pl.when(w == nw - 1)
    def _finalize():
        acc = acc_ref[:].reshape(block_q, nq, d)
        l = l_ref[:, :nq][:, :, None]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc / safe_l).reshape(block_q, nq * d).astype(
            out_ref.dtype
        )


_MAX_SEGMENTS = 1024  # scatter-table cap for in-graph segment ranges


@functools.partial(
    jax.jit,
    static_argnames=("nq", "nkv", "d", "causal", "block_q", "block_k",
                     "k_window", "interpret"),
)
def flash_attention_segmented(
    q2: jax.Array,       # [T, Nq*D] packed tokens (all segments)
    k2: jax.Array,       # [T, Nkv*D]
    v2: jax.Array,
    seg_ids: jax.Array,  # [T] int32: 0..n_seg-1 valid, -1 gap
    *,
    nq: int,
    nkv: int,
    d: int,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 512,
    k_window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Segment-masked (block-diagonal) flash attention over a PACKED
    token sequence → [T, Nq*D]. T must be a multiple of the block sizes
    (the packer aligns to 16-frame boundaries and buckets T).

    The grid is (T/BQ, W), all heads per tile: for each q-block, only
    the W k-blocks spanned by its segments are visited (anchored at an
    in-graph computed kmin per q-block) — out-of-window tiles pay
    neither compute nor DMA. `k_window=0` falls back to the DENSE
    window W = T/BK (worst case: one segment spanning everything);
    callers with layout knowledge should pass a tight wave-constant
    W = ceil(max_seg_len/block_k) + 1 — engine/packed.py does."""
    t = q2.shape[0]
    n_rep = nq // nkv
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    seg_ids = seg_ids.astype(jnp.int32)
    nkb = t // block_k

    big = jnp.int32(2**30)
    # per-segment [start, end] positions via scatter-min/max, then per
    # q-block k-window [kmin, kmax] from its segment range. Cheap [T]
    # reductions, fully in-graph (no layout recompiles).
    segc = jnp.where(seg_ids >= 0, seg_ids, 0)
    seg_start = jnp.full((_MAX_SEGMENTS,), big, jnp.int32).at[segc].min(
        jnp.where(seg_ids >= 0, jnp.arange(t, dtype=jnp.int32), big)
    )
    seg_end = jnp.zeros((_MAX_SEGMENTS,), jnp.int32).at[segc].max(
        jnp.where(seg_ids >= 0, jnp.arange(t, dtype=jnp.int32), 0)
    )
    segq = seg_ids.reshape(t // block_q, block_q)
    q_lo = jnp.min(jnp.where(segq >= 0, segq, big), axis=1)
    q_hi = jnp.max(segq, axis=1)
    empty = q_hi < 0
    kmin = jnp.where(
        empty, 0, seg_start[jnp.clip(q_lo, 0, _MAX_SEGMENTS - 1)] // block_k
    ).astype(jnp.int32)
    kmax = jnp.where(
        empty, -1, seg_end[jnp.clip(q_hi, 0, _MAX_SEGMENTS - 1)] // block_k
    ).astype(jnp.int32)
    kmin = jnp.clip(kmin, 0, nkb - 1)

    if k_window <= 0:
        # W must be static: size for the worst case (one segment spanning
        # everything). Callers with layout knowledge pass a tight W.
        k_window = nkb
    k_window = min(k_window, nkb)

    # seg ids as [1, 8, T] so (1, 8, B*) blocks are (sublane, lane)-tiled
    seg_row = jnp.broadcast_to(seg_ids[None, None, :], (1, 8, t))

    def k_block(qi, w, kmin_ref):
        return jnp.minimum(kmin_ref[qi] + w, nkb - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t // block_q, k_window),
        in_specs=[
            pl.BlockSpec((1, 8, block_q),
                         lambda qi, w, *_: (0, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_k),
                         lambda qi, w, kmin_ref, kmax_ref: (
                             0, 0, k_block(qi, w, kmin_ref)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, nq * d),
                         lambda qi, w, *_: (0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, nkv * d),
                         lambda qi, w, kmin_ref, kmax_ref: (
                             0, k_block(qi, w, kmin_ref), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, nkv * d),
                         lambda qi, w, kmin_ref, kmax_ref: (
                             0, k_block(qi, w, kmin_ref), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, nq * d), lambda qi, w, *_: (0, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, nq * d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flash_kernel_seg, nq=nq, n_rep=n_rep, d=d,
        block_q=block_q, block_k=block_k, causal=causal,
        scale=d ** -0.5,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, t, nq * d), q2.dtype),
        interpret=interpret,
    )(kmin, kmax, seg_row, seg_row, q2[None], k2[None], v2[None])
    return out[0]


def _divisor_block(t: int, cap: int, unit: int) -> int | None:
    """Largest divisor of `t` that is a multiple of `unit` and ≤ cap."""
    best = None
    b = (min(t, cap) // unit) * unit
    while b >= unit:
        if t % b == 0:
            best = b
            break
        b -= unit
    return best


def _pick_blocks_fast(t: int, s: int, dtype) -> "tuple[int, int] | None":
    """Block sizes for the column-block path: must DIVIDE t/s exactly
    (no padding by construction). None → shapes don't admit reasonable
    blocks; use the legacy pad path."""
    unit = 16 if dtype == jnp.bfloat16 else 8
    # measured on v5e at the encoder shapes (BENCH_NOTES round 2): one
    # whole-sequence block wins while the f32 score tile fits VMEM
    # (~1.4k² × 4 B ≈ 8 MB); beyond that ~1k² tiles
    if t <= 1408 and s <= 1408 and t % unit == 0 and s % unit == 0:
        return t, s
    bq = _divisor_block(t, 1024, unit)
    bk = _divisor_block(s, 1024, unit)
    if not bq or not bk or bq < 128 or bk < 128:
        return None
    # keep the f32 score tile within VMEM budget
    while bq * bk * 4 > 8 * 1024 * 1024:
        if bq >= bk:
            nxt = _divisor_block(t, bq - 1, unit)
            if not nxt:
                return None
            bq = nxt
        else:
            nxt = _divisor_block(s, bk - 1, unit)
            if not nxt:
                return None
            bk = nxt
    return bq, bk


def _flash_attention_cb(
    q2: jax.Array,  # [B, T, Nq*D] native matmul-output layout
    k2: jax.Array,  # [B, S, Nkv*D]
    v2: jax.Array,
    kv_lengths: jax.Array,  # [B]
    *,
    nq: int,
    nkv: int,
    d: int,
    block_q: int,
    block_k: int,
    causal: bool,
    interpret: bool,
) -> jax.Array:
    """Column-block lowering → out [B, T, Nq*D]. Heads are D-wide column
    blocks of the packed layout; BlockSpec index maps route query head h
    to kv column block h // n_rep — no data movement outside the kernel."""
    b, t, _ = q2.shape
    s = k2.shape[1]
    n_rep = nq // nkv

    def kv_index(bb, h, qi, kj, lens):
        # clamp masked tiles to the last LIVE k-block: Mosaic skips the
        # DMA when consecutive grid steps map to the same block, so
        # beyond-kv_len tiles (skipped by the body's in_range predicate)
        # stop paying HBM bandwidth — the ragged-batch win at the
        # SPEECHIO duration mix where ~35% of k rows are padding
        live = jnp.maximum((lens[bb] + block_k - 1) // block_k, 1)
        return (bb, jnp.minimum(kj, live - 1), h // n_rep)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nq, t // block_q, s // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bb, h, qi, kj, lens: (bb, qi, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bb, h, qi, kj, lens: (bb, qi, h),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flash_kernel_cb, block_q=block_q, block_k=block_k, causal=causal,
        scale=d ** -0.5, single_k=(s // block_k == 1),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, nq * d), q2.dtype),
        interpret=interpret,
    )(kv_lengths.astype(jnp.int32), q2, k2, v2)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, T, Nq, D]
    k: jax.Array,  # [B, S, Nkv, D]
    v: jax.Array,
    kv_lengths: jax.Array = None,  # [B]
    *,
    causal: bool = False,
    block_q: int = None,
    block_k: int = None,
    interpret: bool = False,
) -> jax.Array:
    b, t, nq, d = q.shape
    s, nkv = k.shape[1], k.shape[2]
    n_rep = nq // nkv
    if kv_lengths is None:
        kv_lengths = jnp.full((b,), s, jnp.int32)

    # fast path: lane-aligned head dim + block sizes that divide T/S →
    # index the native [B, T, N*D] layout directly (reshape from
    # [B, T, N, D] is free: N, D are adjacent)
    if block_q is None and block_k is None and d % 128 == 0:
        picked = _pick_blocks_fast(t, s, q.dtype)
        if picked is not None:
            out2 = _flash_attention_cb(
                q.reshape(b, t, nq * d),
                k.reshape(b, s, nkv * d),
                v.reshape(b, s, nkv * d),
                kv_lengths,
                nq=nq, nkv=nkv, d=d, block_q=picked[0], block_k=picked[1],
                causal=causal, interpret=interpret,
            )
            return out2.reshape(b, t, nq, d)

    if block_q is None or block_k is None:
        # measured on v5e at the encoder shapes (BENCH_NOTES round 2):
        # one whole-sequence block wins while the f32 score tile fits
        # VMEM (~1.4k² × 4 B ≈ 8 MB); beyond that, 1024² tiles beat the
        # small 256×512 default by ~30%
        if s <= 1408 and t <= 1408:
            bq_auto = -(-t // 128) * 128
            bk_auto = -(-s // 128) * 128
        else:
            bq_auto, bk_auto = 1024, 1024
        block_q = block_q or bq_auto
        block_k = block_k or bk_auto
    block_q = min(block_q, -(-t // 128) * 128)
    block_k = min(block_k, -(-s // 128) * 128)
    # pad T/S to block multiples
    t_pad = -(-t // block_q) * block_q
    s_pad = -(-s // block_k) * block_k
    # fold the softmax scale into q once ([B,T,N,D] elementwise) instead
    # of scaling every [BQ,BK] score tile inside the kernel
    q = q * jnp.asarray(d ** -0.5, q.dtype)
    qh = jnp.moveaxis(q, 2, 1).reshape(b * nq, t, d)
    kh = jnp.moveaxis(k, 2, 1).reshape(b * nkv, s, d)
    vh = jnp.moveaxis(v, 2, 1).reshape(b * nkv, s, d)
    if t_pad != t:
        qh = jnp.pad(qh, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s:
        kh = jnp.pad(kh, ((0, 0), (0, s_pad - s), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, s_pad - s), (0, 0)))

    def kv_index(bn, qi, kj, lens):
        # query row bn = b*Nq + h reads kv row b*Nkv + h // n_rep
        bb = bn // nq
        h = bn % nq
        return (bb * nkv + h // n_rep, kj, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * nq, t_pad // block_q, s_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bn, qi, kj, lens: (bn, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bn, qi, kj, lens: (bn, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, num_q_heads=nq,
        causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * nq, t_pad, d), q.dtype),
        interpret=interpret,
    )(kv_lengths.astype(jnp.int32), qh, kh, vh)
    out = out[:, :t].reshape(b, nq, t, d)
    return jnp.moveaxis(out, 1, 2)


def _seg_oneshot_kernel(
    kstart_ref,    # scalar prefetch: [NQB] int32 window start ROW per q-block
    segq_ref,      # [1, 8, BQ] int32 segment ids for this q-block
    q_ref,         # [BQ, Nq*D] VMEM
    k_hbm,         # [TT/128, 128, Nkv*D] ANY/HBM (tile-reshaped)
    v_hbm,         # [TT/128, 128, Nkv*D] ANY/HBM
    segk_hbm,      # [TT/128, 128] int32 ANY/HBM
    out_ref,       # [BQ, Nq*D] VMEM
    k_vmem,        # scratch [W/128, 128, Nkv*D]
    v_vmem,        # scratch [W/128, 128, Nkv*D]
    segk_vmem,     # scratch [W/128, 128] int32
    sems,          # DMA semaphores (3,)
    *,
    nq: int,
    n_rep: int,
    d: int,
    block_q: int,
    window: int,
    causal: bool,
    scale: float,
    head_base: int = 0,
):
    """ONE-SHOT windowed segment attention: each q-block's entire key
    window lives in VMEM, so the softmax is a plain masked softmax — no
    online-softmax running state at all.

    Round-4 finding (BENCH_NOTES): the online multi-k-block segmented
    kernel ran at ~1% MFU — per-head single-COLUMN m/l scratch updates
    and per-tile acc rescales dominated (0.51 ms per tile vs ~5 µs of
    MXU work), and SHRINKING k blocks made it slower (more tiles, same
    per-tile overhead). Segments are ≤ ~1.5k frames while VMEM holds a
    multi-k-window easily, so the flash structure was pure overhead
    here. The window start row is 128-aligned per q-block (scalar
    prefetch, computed in-graph by the wrapper) and every key of every
    segment the q-block touches lies inside [kstart, kstart+W).

    Round-5 DMA dedup (rolling ring scratch): consecutive q-blocks
    share most of their window tiles — kstart is NON-DECREASING across
    the grid (packed segments are position-ordered; the wrapper
    enforces it with a running max), so grid step qi only copies the
    delta tiles [prev_kstart + W, kstart + W) into a ring buffer (VMEM
    slot = tile index mod W/128; scratch persists across the
    sequential grid). The window columns land ROTATED in VMEM, which
    is harmless: softmax + weighted sum are permutation-invariant over
    keys, the segment mask rides the same rotated segk tiles, and
    causal positions are reconstructed from the ring offset. Cuts
    per-layer window traffic ~W/BQ-fold (bench pack: 20 tiles → ~2
    per step)."""
    qi = pl.program_id(0)
    # window start in 128-row TILES: the HBM operands are shaped
    # [TT/128, 128, D] so DMAs move whole tiles — Mosaic cannot prove an
    # arbitrary row offset sublane-aligned, and dynamic-START multi-tile
    # slices fault at runtime (round-4 finding); single-tile dynamic
    # INDEXING (the paged-attention kernels' pattern) is solid
    kb = kstart_ref[qi]
    wb = window // 128
    prev_kb = kstart_ref[jnp.maximum(qi - 1, 0)]
    first = qi == 0
    # tiles resident from the previous step: [prev_kb, prev_kb + wb);
    # needed now: [kb, kb + wb). New = [max(kb, prev_kb + wb), kb + wb)
    # (kb ≥ prev_kb by the wrapper's running max). Step 0 loads all.
    for j in range(wb):
        a = kb + j
        slot = jax.lax.rem(a, wb)
        need = jnp.logical_or(first, a >= prev_kb + wb)

        @pl.when(need)
        def _start(a=a, slot=slot):
            pltpu.make_async_copy(k_hbm.at[a], k_vmem.at[slot],
                                  sems.at[0, slot]).start()
            pltpu.make_async_copy(v_hbm.at[a], v_vmem.at[slot],
                                  sems.at[1, slot]).start()
            pltpu.make_async_copy(segk_hbm.at[a], segk_vmem.at[slot],
                                  sems.at[2, slot]).start()

    for j in range(wb):
        a = kb + j
        slot = jax.lax.rem(a, wb)
        need = jnp.logical_or(first, a >= prev_kb + wb)

        @pl.when(need)
        def _wait(a=a, slot=slot):
            pltpu.make_async_copy(k_hbm.at[a], k_vmem.at[slot],
                                  sems.at[0, slot]).wait()
            pltpu.make_async_copy(v_hbm.at[a], v_vmem.at[slot],
                                  sems.at[1, slot]).wait()
            pltpu.make_async_copy(segk_hbm.at[a], segk_vmem.at[slot],
                                  sems.at[2, slot]).wait()

    seg_q = segq_ref[0, 0, :]                      # [BQ]
    seg_k = segk_vmem[:].reshape(window)           # [W] (ring order)
    mask = jnp.logical_and(
        seg_q[:, None] == seg_k[None, :], seg_q[:, None] >= 0
    )
    if causal:
        qpos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, window), 0
        )
        # ring slot m holds absolute tile a_m = kb + ((m − kb) mod wb);
        # avoid a vector mod: (m − kb mod wb) ∈ (−wb, wb) so the mod is
        # a single conditional +wb
        kbm = jax.lax.rem(kb, wb)
        widx = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, window), 1
        )
        m_idx = widx // 128
        off = m_idx - kbm + jnp.where(m_idx < kbm, wb, 0)
        kpos = (kb + off) * 128 + (widx - m_idx * 128)
        mask = jnp.logical_and(mask, kpos <= qpos)

    kw = k_vmem[:].reshape(window, -1)
    vw = v_vmem[:].reshape(window, -1)
    for h in range(nq):
        g = (head_base + h) // n_rep
        q = q_ref[:, h * d : (h + 1) * d]
        if scale != 1.0:
            q = q * jnp.asarray(scale, q.dtype)
        k = kw[:, g * d : (g + 1) * d]
        v = vw[:, g * d : (g + 1) * d]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, W]
        scores = jnp.where(mask, scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # gap rows (seg -1) have ALL columns masked: exp(-1e30 − m)
        # degenerates to exp(0)=1 (m = -1e30), so l > 0 — zero them by
        # segment validity, and guard rows whose window truly has no
        # matching key (m stays -1e30 → any_live false)
        any_live = m > _NEG_INF / 2
        live = jnp.logical_and(seg_q[:, None] >= 0, any_live)
        out = jnp.where(live, pv / jnp.maximum(l, 1e-30), 0.0)
        out_ref[:, h * d : (h + 1) * d] = out.astype(out_ref.dtype)


def flash_attention_segmented_oneshot(
    q2: jax.Array,       # [TT, Nq*D] packed tokens
    k2: jax.Array,       # [TT, Nkv*D]
    v2: jax.Array,
    seg_ids: jax.Array,  # [TT] int32, -1 = gap
    *,
    nq: int,
    nkv: int,
    d: int,
    window: int,         # key-window ROWS (static; wrapper snaps to 128)
    block_q: int = 512,
    causal: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One-shot windowed segment attention → [TT, Nq*D]. `window` must
    cover max_segment_len + block_q (the widest span one q-block's
    segments can reach) — engine/packed.py computes it from the frame
    plan and snaps to 128. Replaces `flash_attention_segmented` as the
    packed encoder's kernel (same contract; ~3x faster at the bench
    pack, see BENCH_NOTES round 4)."""
    tt = q2.shape[0]
    n_rep = nq // nkv
    while tt % block_q:
        block_q //= 2
    window = min(-(-window // 128) * 128, tt)
    # many-head bodies (Qwen3 prompts: nq=16) cannot fit VMEM fully
    # unrolled at any legal block size — split into head-GROUP passes of
    # ≤8 heads (group-aligned so GQA kv slices stay shard-local); each
    # pass re-DMAs the k/v window (2× traffic, ~30 µs/layer at prompt
    # geometry) but runs the cheap one-shot body
    if nq > 8:
        half = (nq // 2 // n_rep) * n_rep or nq // 2
        outs = []
        for h0 in range(0, nq, half):
            nh = min(half, nq - h0)
            outs.append(_seg_oneshot_headgroup(
                q2[:, h0 * d : (h0 + nh) * d], k2, v2, seg_ids,
                nq=nh, nkv=nkv, d=d, window=window, block_q=block_q,
                causal=causal, interpret=interpret, head_base=h0,
                n_rep=n_rep,
            ))
        return jnp.concatenate(outs, axis=-1)
    return _seg_oneshot_headgroup(
        q2, k2, v2, seg_ids, nq=nq, nkv=nkv, d=d, window=window,
        block_q=block_q, causal=causal, interpret=interpret,
        head_base=0, n_rep=n_rep,
    )


def _seg_oneshot_headgroup(
    q2, k2, v2, seg_ids, *, nq, nkv, d, window, block_q, causal,
    interpret, head_base, n_rep,
):
    """One pallas_call over `nq` q-heads starting at `head_base` (kv
    groups resolved in-kernel); kv/seg inputs are the FULL arrays."""
    tt = q2.shape[0]
    # VMEM budget: k+v window scratch + double-buffered q/out blocks +
    # the f32 score tile must fit the ~16 MB scoped limit
    def _vmem(bq):
        kv = 2 * window * nkv * d * q2.dtype.itemsize
        qo = 2 * 2 * bq * nq * d * q2.dtype.itemsize
        # [BQ, W] transients scale with the UNROLLED head loop — the
        # Mosaic stack allocator keeps a large fraction of the per-head
        # scores/p buffers live simultaneously. Empirical model fit on
        # measured OOMs: extra ≈ (1 + 0.75·nq) f32 [BQ, W] buffers
        # (nq=4/bq=512/W=1536 → est 17.8M vs 16.1M actual;
        # nq=16/bq=128/W=1536 → est 18.6M vs 18.1M actual).
        sc = int((1 + 0.75 * nq) * bq * window * 4)
        return kv + qo + sc
    budget_mb = int(os.environ.get("FUN_ASR_ONESHOT_VMEM_MB", "12"))
    while block_q > 128 and (_vmem(block_q) > budget_mb * 1024 * 1024
                             or tt % block_q):
        block_q //= 2
    if _vmem(block_q) > max(15, budget_mb) * 1024 * 1024:
        raise ValueError(
            f"oneshot segment kernel cannot fit VMEM: nq={nq} "
            f"window={window} block_q={block_q} (est "
            f"{_vmem(block_q) / 1e6:.1f}M) — use the online "
            "flash_attention_segmented for this geometry"
        )
    seg_ids = seg_ids.astype(jnp.int32)

    # per-q-block 128-aligned window start row, in-graph (cheap [TT]
    # reductions, same machinery as the online variant)
    big = jnp.int32(2**30)
    segc = jnp.where(seg_ids >= 0, seg_ids, 0)
    seg_start = jnp.full((_MAX_SEGMENTS,), big, jnp.int32).at[segc].min(
        jnp.where(seg_ids >= 0, jnp.arange(tt, dtype=jnp.int32), big)
    )
    segq = seg_ids.reshape(tt // block_q, block_q)
    q_lo = jnp.min(jnp.where(segq >= 0, segq, big), axis=1)
    empty = jnp.max(segq, axis=1) < 0
    start = jnp.where(
        empty, 0, seg_start[jnp.clip(q_lo, 0, _MAX_SEGMENTS - 1)]
    )
    # start TILE index (128-row units; operands are tile-reshaped below)
    kstart = jnp.clip(start // 128, 0, (tt - window) // 128).astype(
        jnp.int32)
    # the kernel's rolling ring scratch requires NON-DECREASING window
    # starts across q-blocks. Packed segment ids are position-ordered
    # (the packers assign ids in layout order) so this is already true
    # except for all-gap q-blocks (start 0 above); the running max
    # makes those inherit the previous window — their rows are fully
    # masked, so any window content is correct for them.
    kstart = jax.lax.associative_scan(jnp.maximum, kstart)

    seg_row_q = jnp.broadcast_to(seg_ids[None, None, :], (1, 8, tt))
    seg_tiles = seg_ids.reshape(tt // 128, 128)
    k3 = k2.reshape(tt // 128, 128, nkv * d)
    v3 = v2.reshape(tt // 128, 128, nkv * d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tt // block_q,),
        in_specs=[
            pl.BlockSpec((1, 8, block_q), lambda qi, ks: (0, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, nq * d), lambda qi, ks: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_q, nq * d), lambda qi, ks: (qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((window // 128, 128, nkv * d), k2.dtype),
            pltpu.VMEM((window // 128, 128, nkv * d), v2.dtype),
            pltpu.VMEM((window // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3, window // 128)),
        ],
    )
    kernel = functools.partial(
        _seg_oneshot_kernel, nq=nq, n_rep=n_rep, d=d, block_q=block_q,
        window=window, causal=causal, scale=d ** -0.5,
        head_base=head_base,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tt, nq * d), q2.dtype),
        interpret=interpret,
    )(kstart, seg_row_q, q2, k3, v3, seg_tiles)
