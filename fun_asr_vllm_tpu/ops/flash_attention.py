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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    kv_lens_ref,   # [B] int32 (scalar prefetch)
    q_ref,         # [1, BQ, D]
    k_ref,         # [1, BK, D]
    v_ref,         # [1, BK, D]
    out_ref,       # [1, BQ, D]
    acc_ref,       # [BQ, D] f32
    m_ref,         # [BQ, 128] f32
    l_ref,         # [BQ, 128] f32
    *,
    block_q: int,
    block_k: int,
    num_q_heads: int,
    causal: bool,
):
    bn = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)
    b = bn // num_q_heads
    kv_len = kv_lens_ref[b]

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_start = qi * block_q
    k_start = kj * block_k
    # skip fully-masked blocks: beyond kv_len, strictly future (causal), or
    # padding query rows. Both call sites (encoder self-attention, LLM
    # prefill) have query position == kv position, so q rows at/after
    # kv_len are padding — skipping them is the big ragged-batch win
    # (~half the tile area at the SPEECHIO duration mix); their outputs
    # finalize to zeros.
    in_range = jnp.logical_and(k_start < kv_len, q_start < kv_len)
    if causal:
        in_range = jnp.logical_and(in_range, k_start <= q_start + block_q - 1)

    @pl.when(in_range)
    def _process():
        # keep the MXU inputs in the stored dtype (bf16 runs 8× f32 rate);
        # accumulate f32. The softmax scale is pre-folded into q by the
        # wrapper, saving a [BQ,BK] multiply per tile on the VPU.
        q = q_ref[0]  # [BQ, D]
        k = k_ref[0]  # [BK, D]
        v = v_ref[0]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK] f32
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
