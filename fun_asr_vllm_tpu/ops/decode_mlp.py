"""Fused decode-step MLP (Pallas TPU): gate/up projection -> SiLU*mul ->
down projection in ONE kernel, streaming both weight matrices exactly
once with double-buffered DMAs.

Motivation (BENCH_NOTES round-5 xplane decomposition): the decode burst
is weight-read bound, and its skinny [S=16, H] x [H, N] XLA dots run at
~53% of the HBM floor - each op pays DMA pipeline ramp that the
(identically skinny but much wider) logits matmul amortizes to ~peak.
Fusing the MLP's two dots into one grid halves the op count on the
largest weight block of the layer (gate/up+down = 18.9 MB of the
31.5 MB/layer at Qwen3-0.6B shapes) and keeps h1 in VMEM.

Numerics mirror `models.qwen3._layer_mlp`'s value flow exactly: bf16
MXU inputs, f32 accumulation, gate/up outputs rounded to the model
dtype BEFORE SiLU (XLA's dot emits the operand dtype), down-projection
partial sums accumulated in f32 across I-blocks. Greedy-token parity vs
the XLA path is tested in tests/test_decode_mlp.py.

This is the vLLM-analogue surface of the fused MLP CUDA kernels the
reference gets from its engine (reference infer_kaldidata.py:641-667
delegates the whole decode loop to vLLM).

STATUS: built, measured, NOT adopted (BENCH_NOTES round 5). At the
real burst structure (28-layer scan x 16 steps, S=16, bf16) the fused
kernel measures ~5% SLOWER than the XLA dots it replaces
(tools/probe_decode_mlp.py: 38.0 vs 36.05 ms best-of interleaved), and
a Python-unrolled layer loop is ~37% slower still - XLA's scan already
pipelines the skinny dots' weight DMAs as well as the hand-rolled
double-buffered grid does, so the per-op-ramp hypothesis from the
xplane decomposition does not convert into a win. Kept (tested, parity
in tests/test_decode_mlp.py) as the measured record and for hardware
where the trade-off differs; the engine does NOT route it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bi(inter: int, hidden: int, vmem_budget: int = 8 * 2 ** 20) -> int:
    """Largest 128-multiple I-block that divides `inter` and keeps the
    three per-step weight blocks (gate, up, down) double-buffered under
    the VMEM budget (3 * hidden * bi * 2 bytes per pipeline stage)."""
    cap = max(128, vmem_budget // (2 * 3 * hidden * 2))
    for bi in range(min(inter, cap - cap % 128), 127, -128):
        if inter % bi == 0:
            return bi
    return 128


def _mlp_kernel(x_ref, wg_ref, wu_ref, wd_ref, o_ref, acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu_ref[...], preferred_element_type=jnp.float32)
    # round to the model dtype before SiLU - matches the XLA path where
    # the gate/up dot's OUTPUT is bf16 and silu/mul run on bf16 values.
    # (sigmoid itself runs in f32 on the ROUNDED values: Mosaic cannot
    # lower logistic on bf16 vectors - broadcast dtype verification bug)
    g = g.astype(x.dtype)
    u = u.astype(x.dtype)
    g32 = g.astype(jnp.float32)
    h1 = (g32 * jax.nn.sigmoid(g32)).astype(x.dtype) * u
    acc_ref[...] += jnp.dot(h1, wd_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mlp(
    x: jax.Array,          # [S, H]
    w_gateup: jax.Array,   # [H, 2*I]  (gate columns first, then up)
    w_down: jax.Array,     # [I, H]
    interpret: bool = False,
) -> jax.Array:
    """SwiGLU MLP for skinny decode activations: silu(x@Wg) * (x@Wu) @ Wd.

    One grid pass over I-blocks; every weight byte is read exactly once.
    Rows are padded to the bf16 sublane tile (16) when S is not aligned.
    """
    s, h = x.shape
    inter = w_down.shape[0]
    assert w_gateup.shape == (h, 2 * inter), (w_gateup.shape, h, inter)
    if inter % 128 != 0 or h % 128 != 0:
        # the I-block grid needs lane-aligned splits of BOTH column
        # ranges of w_gateup; a non-128-multiple inter would silently
        # misalign the `up` BlockSpec (j + n_blk) — route XLA instead
        gu = x @ w_gateup
        g32 = gu[..., :inter].astype(jnp.float32)
        h1 = (g32 * jax.nn.sigmoid(g32)).astype(x.dtype) * gu[..., inter:]
        return h1 @ w_down
    s_pad = -(-s // 16) * 16
    if s_pad != s:
        x = jnp.pad(x, ((0, s_pad - s), (0, 0)))
    bi = _pick_bi(inter, h)
    n_blk = inter // bi

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((s_pad, h), lambda j: (0, 0)),       # x
            pl.BlockSpec((h, bi), lambda j: (0, j)),          # gate cols
            pl.BlockSpec((h, bi), lambda j, _n=n_blk: (0, j + _n)),  # up
            pl.BlockSpec((bi, h), lambda j: (j, 0)),          # down rows
        ],
        out_specs=pl.BlockSpec((s_pad, h), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((s_pad, h), x.dtype),
        scratch_shapes=[pltpu.VMEM((s_pad, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w_gateup, w_gateup, w_down)
    return out[:s] if s_pad != s else out
