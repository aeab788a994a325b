"""Parity: fused SAN-M attention sublayer kernel (ops/sanm_fused.py)
vs models.encoder._sanm_attention (the XLA reference), interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.models import encoder as enc
from fun_asr_vllm_tpu.ops.sanm_fused import sanm_attention_fused


def _mk(cfg, b, t, seed=0):
    key = jax.random.PRNGKey(seed)
    params = enc.init_params(cfg, key)
    lp = {k: v[0] for k, v in params["layers"].items()}
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, cfg.output_size),
                          jnp.float32).astype(cfg.dtype) * 0.5
    lens = jnp.asarray(
        np.linspace(max(1, 0.3 * t), t, b).astype(np.int32))
    return lp, x, lens


@pytest.mark.parametrize("t,block_q", [(256, None), (384, 128), (512, None)])
@pytest.mark.parametrize("shift", [0, 2])
def test_fused_matches_xla(t, block_q, shift):
    cfg = enc.SANMEncoderConfig(
        output_size=256, attention_heads=2, linear_units=512, num_blocks=2,
        sanm_shift=shift, dtype=jnp.float32, use_flash=False)
    lp, x, lens = _mk(cfg, 3, t)
    mask = (jnp.arange(t)[None, :, None] < lens[:, None, None]).astype(
        x.dtype)
    ref = enc._sanm_attention(lp, cfg, x, mask, lens)
    got = sanm_attention_fused(
        x, lp["w_qkv"], lp["b_qkv"], lp["fsmn_kernel"], lp["w_out"],
        lp["b_out"], lens, heads=cfg.attention_heads, shift=shift,
        block_q=block_q, interpret=True)
    # compare VALID rows only: the non-flash XLA reference computes
    # garbage-q attention on padding rows where the fused kernel (like
    # flash_attention) finalizes them to zeros + b_out — downstream
    # consumers mask by length either way
    ref, got = np.asarray(ref), np.asarray(got)
    lens = np.asarray(lens)
    for i in range(ref.shape[0]):
        np.testing.assert_allclose(got[i, : lens[i]], ref[i, : lens[i]],
                                   atol=2e-4, rtol=2e-4)


def test_fused_full_length_rows(t=256):
    """All rows valid (no padding) — the mask fast paths must not drop
    real rows."""
    cfg = enc.SANMEncoderConfig(
        output_size=256, attention_heads=2, linear_units=512, num_blocks=2,
        dtype=jnp.float32, use_flash=False)
    lp, x, _ = _mk(cfg, 2, t, seed=3)
    lens = jnp.asarray([t, t], jnp.int32)
    mask = jnp.ones((2, t, 1), x.dtype)
    ref = enc._sanm_attention(lp, cfg, x, mask, lens)
    got = sanm_attention_fused(
        x, lp["w_qkv"], lp["b_qkv"], lp["fsmn_kernel"], lp["w_out"],
        lp["b_out"], lens, heads=cfg.attention_heads,
        shift=cfg.sanm_shift, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fused_encode_matches_unfused(t=256):
    """Full encoder forward with the fused sublayer flag vs without."""
    cfg = enc.SANMEncoderConfig(
        output_size=256, attention_heads=2, linear_units=512,
        num_blocks=3, dtype=jnp.float32, use_flash=False)
    params = enc.init_params(cfg, jax.random.PRNGKey(0))
    b = 2
    speech = jax.random.normal(jax.random.PRNGKey(1), (b, t, 80),
                               jnp.float32)
    lens = jnp.asarray([t, int(0.6 * t)], jnp.int32)
    ref, rl = enc.encode(params, cfg, speech, lens)
    import dataclasses
    cfg_f = dataclasses.replace(cfg, fused_attention=True,
                                fused_interpret=True)
    got, gl = enc.encode(params, cfg_f, speech, lens)
    assert np.array_equal(np.asarray(rl), np.asarray(gl))
    ref, got = np.asarray(ref), np.asarray(got)
    lens_np = np.asarray(lens)
    for i in range(ref.shape[0]):
        np.testing.assert_allclose(got[i, : lens_np[i]],
                                   ref[i, : lens_np[i]],
                                   atol=5e-4, rtol=5e-4)
