"""Parity tests for the fused decode-MLP Pallas kernel
(ops/decode_mlp.py - built/measured/not-adopted, see its docstring).

Interpret mode on CPU: the kernel must reproduce
`models.qwen3._layer_mlp`'s SwiGLU value flow (bf16 rounding before
SiLU, f32 accumulation) closely enough that greedy decisions driven by
peaked values never flip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fun_asr_vllm_tpu.ops.decode_mlp import _pick_bi, fused_mlp


def _xla_mlp(x, w_gateup, w_down):
    gu = x @ w_gateup
    i = gu.shape[-1] // 2
    return (jax.nn.silu(gu[..., :i]) * gu[..., i:]) @ w_down


@pytest.mark.parametrize("s,h,inter", [(16, 256, 512), (16, 128, 384),
                                       (8, 256, 256), (3, 128, 256)])
def test_fused_mlp_matches_xla(s, h, inter):
    kx, kg, kd = jax.random.split(jax.random.PRNGKey(s + h), 3)
    x = (jax.random.normal(kx, (s, h)) * 0.1).astype(jnp.bfloat16)
    wg = (jax.random.normal(kg, (h, 2 * inter)) * 0.05).astype(jnp.bfloat16)
    wd = (jax.random.normal(kd, (inter, h)) * 0.05).astype(jnp.bfloat16)
    ref = np.asarray(_xla_mlp(x, wg, wd), np.float32)
    got = np.asarray(fused_mlp(x, wg, wd, interpret=True), np.float32)
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-2  # bf16-ulp-level: sigmoid runs f32 in-kernel (Mosaic bf16 logistic bug), bf16 in XLA


def test_fused_mlp_block_accumulation_order():
    """Multiple I-blocks (the f32 partial-sum path) must agree with the
    single-dot reference on peaked inputs - no accumulation blowup."""
    h, inter = 1024, 3072  # the real Qwen3-0.6B shapes -> 6 I-blocks
    assert _pick_bi(inter, h) < inter
    kx, kg, kd = jax.random.split(jax.random.PRNGKey(7), 3)
    x = (jax.random.normal(kx, (16, h))).astype(jnp.bfloat16)
    wg = (jax.random.normal(kg, (h, 2 * inter)) * 0.2).astype(jnp.bfloat16)
    wd = (jax.random.normal(kd, (inter, h)) * 0.2).astype(jnp.bfloat16)
    ref = np.asarray(_xla_mlp(x, wg, wd), np.float32)
    got = np.asarray(fused_mlp(x, wg, wd, interpret=True), np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-2  # bf16-ulp-level: sigmoid runs f32 in-kernel (Mosaic bf16 logistic bug), bf16 in XLA
    # greedy stability: the argmax row decision never flips
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.95


def test_pick_bi_divides_and_aligns():
    for inter in (256, 384, 512, 768, 3072, 4096):
        bi = _pick_bi(inter, 1024)
        assert inter % bi == 0 and bi % 128 == 0
