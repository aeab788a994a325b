"""Fused SAN-M attention sublayer (Pallas TPU): qkv projection →
multi-head attention (one-shot softmax) → output projection → + FSMN
memory, in ONE kernel.

Motivation (BENCH_NOTES round-3 attribution): the unfused sublayer
materializes qkv [B,T,3D], the attention output [B,T,D] and the FSMN
memory [B,T,D] in HBM between dispatches — ~200 MB of avoidable HBM
traffic per layer at the bench shape [16,1200,512], on a path that is
48% of end-to-end device time. This kernel keeps every intermediate in
VMEM: the only HBM traffic is h in, weights in, out out.

Structure per grid program (one batch row):
  - qkv = h @ w_qkv + b_qkv computed ONCE into a VMEM scratch (bf16)
  - loop q-row blocks (static python loop, whole-T k):
      - per head: scores q_blk·kᵀ (f32 MXU) → one-shot masked softmax →
        ctx·w_out[head-slice] accumulated into a [BQ, D] f32 register
        block (the output projection distributes over head column
        blocks, so no full-T context buffer is ever needed)
      - FSMN depthwise conv over time on the v slice (K static shifted
        multiply-adds, rows masked to the valid length)
      - out rows = Σ_h ctx_h @ w_out_h + b_out + mem
Numerics match `models.encoder._sanm_attention` (funasr
MultiHeadedAttentionSANM semantics, reference model.py:40-67): softmax
in f32, conv in f32, bf16 MXU inputs, memory joined AFTER the output
projection. Parity is tested in interpret mode (tests/test_sanm_fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_bq(t: int) -> int:
    """Largest sublane-aligned q-row block ≤512 that divides T exactly
    (e.g. T=1200 → 400; a power-of-two-only ladder would fall through
    to 16-row blocks and starve the MXU — measured 2x slower)."""
    for bq in range(512, 7, -8):
        if t % bq == 0:
            return bq
    return t


def _sanm_fused_kernel(
    lens_ref,      # scalar prefetch: [B] int32 valid lengths
    h_ref,         # [1, T, Din]
    wqkv_ref,      # [Din, 3D]
    bqkv_ref,      # [1, 3D] f32
    fsmn_ref,      # [K8, D] f32 (K rows zero-padded to a sublane multiple)
    wout_ref,      # [D, D]
    bout_ref,      # [1, D] f32
    out_ref,       # [1, T, D]
    qkv_ref,       # scratch [T, 3D] bf16/input dtype
    *,
    t: int,
    d: int,
    heads: int,
    block_q: int,
    k_size: int,
    shift: int,
):
    b = pl.program_id(0)
    kv_len = lens_ref[b]
    dh = d // heads
    scale = dh ** -0.5

    h = h_ref[0]  # [T, Din]
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0][None, :]
    qkv_ref[:] = qkv.astype(qkv_ref.dtype)

    left = (k_size - 1) // 2 + shift
    right = k_size - 1 - left

    # one column-bias row per program: kv-length masking of keys
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    kbias = jnp.where(kpos < kv_len, 0.0, _NEG_INF)  # [1, T]

    for q0 in range(0, t, block_q):
        out_acc = jnp.zeros((block_q, d), jnp.float32)
        for hd in range(heads):
            q = qkv_ref[q0 : q0 + block_q, hd * dh : (hd + 1) * dh]
            k = qkv_ref[:, d + hd * dh : d + (hd + 1) * dh]  # [T, dh]
            v = qkv_ref[:, 2 * d + hd * dh : 2 * d + (hd + 1) * dh]
            scores = jax.lax.dot_general(
                (q.astype(jnp.float32) * scale).astype(q.dtype), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + kbias  # [BQ, T]
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            ctx = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, dh] f32
            # q rows at/past kv_len are padding: zero their context
            qpos = q0 + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            ctx = jnp.where(qpos < kv_len,
                            ctx / jnp.maximum(l, 1e-30), 0.0)
            # output projection distributes over head column blocks
            out_acc = out_acc + jax.lax.dot_general(
                ctx.astype(wout_ref.dtype),
                wout_ref[hd * dh : (hd + 1) * dh, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # FSMN memory for these rows: depthwise conv over time on the
        # MASKED merged-head v, residual, re-mask — in f32 like the XLA
        # path. Row r of the block needs v rows [q0+r-left, q0+r+right].
        lo, hi = q0 - left, q0 + block_q + right
        lo_c, hi_c = max(lo, 0), min(hi, t)
        v_ext = qkv_ref[lo_c:hi_c, 2 * d : 3 * d].astype(jnp.float32)
        vpos = lo_c + jax.lax.broadcasted_iota(
            jnp.int32, (hi_c - lo_c, 1), 0
        )
        v_ext = jnp.where(vpos < kv_len, v_ext, 0.0)
        pad_lo, pad_hi = lo_c - lo, hi - hi_c
        if pad_lo or pad_hi:
            v_ext = jnp.pad(v_ext, ((pad_lo, pad_hi), (0, 0)))
        mem = jnp.zeros((block_q, d), jnp.float32)
        for j in range(k_size):
            mem = mem + v_ext[j : j + block_q, :] * fsmn_ref[j, :][None, :]
        v_mid = v_ext[left : left + block_q, :]
        qpos_b = q0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        mem = jnp.where(qpos_b < kv_len, mem + v_mid, 0.0)

        out_ref[0, q0 : q0 + block_q, :] = (
            out_acc + bout_ref[0][None, :] + mem
        ).astype(out_ref.dtype)


def sanm_attention_fused(
    h: jax.Array,            # [B, T, Din] post-LN1 hidden
    w_qkv: jax.Array,        # [Din, 3D]
    b_qkv: jax.Array,        # [3D]
    fsmn_kernel: jax.Array,  # [K, D]
    w_out: jax.Array,        # [D, D]
    b_out: jax.Array,        # [D]
    lengths: jax.Array,      # [B] valid lengths
    *,
    heads: int,
    shift: int = 0,
    block_q: int = None,
    interpret: bool = False,
) -> jax.Array:
    """→ [B, T, D]: `_sanm_attention` in one dispatch per layer.

    Constraints (caller gates; models/encoder.py falls back to the
    unfused path otherwise): head_dim % 128 == 0, T a multiple of 8.
    Padding rows (≥ lengths) come out as b_out, matching the XLA path.
    """
    # resolve block_q OUTSIDE the jit so the cache keys on the actual
    # block size, not on None
    if block_q is None:
        block_q = _pick_bq(h.shape[1])
    return _sanm_attention_fused_jit(
        h, w_qkv, b_qkv, fsmn_kernel, w_out, b_out, lengths,
        heads=heads, shift=shift, block_q=block_q, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "shift", "block_q", "interpret"),
)
def _sanm_attention_fused_jit(
    h, w_qkv, b_qkv, fsmn_kernel, w_out, b_out, lengths,
    *, heads: int, shift: int, block_q: int, interpret: bool,
) -> jax.Array:
    b, t, din = h.shape
    d = w_out.shape[0]
    k_size = fsmn_kernel.shape[0]
    # pad the kernel's row count to a sublane multiple so the [K, D]
    # block is layout-legal; extra rows are zero and never indexed
    k8 = -(-k_size // 8) * 8
    fsmn8 = jnp.zeros((k8, d), jnp.float32).at[:k_size].set(
        fsmn_kernel.astype(jnp.float32)
    )

    kernel = functools.partial(
        _sanm_fused_kernel, t=t, d=d, heads=heads, block_q=block_q,
        k_size=k_size, shift=shift,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, din), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, 3 * d), lambda i, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k8, d), lambda i, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, d), lambda i, lens: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((t, 3 * d), h.dtype),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), h.dtype),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), h, w_qkv,
        b_qkv.astype(jnp.float32).reshape(1, -1), fsmn8, w_out,
        b_out.astype(jnp.float32).reshape(1, -1),
    )
