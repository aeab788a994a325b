"""SAN-M encoder + Nano adaptor tests (shape/length/masking invariants)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.models import adaptor, encoder


def small_enc_cfg():
    return encoder.SANMEncoderConfig(
        input_size=80, output_size=64, attention_heads=4, linear_units=128,
        num_blocks=3, kernel_size=11, dtype=jnp.float32,
    )


def small_ad_cfg():
    return adaptor.NanoAdaptorConfig(
        encoder_dim=64, llm_dim=32, ffn_dim=64, dtype=jnp.float32
    )


class TestEncoder:
    def test_shapes(self):
        cfg = small_enc_cfg()
        params = encoder.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 50, 80))
        lens = jnp.asarray([50, 30])
        out, out_lens = encoder.encode(params, cfg, x, lens)
        assert out.shape == (2, 50, 64)
        assert out_lens.tolist() == [50, 30]

    def test_padding_invariance(self):
        """A shorter utterance inside a padded batch must produce the same
        states as when padded less — the batch=16 CER-regression avoidance
        property (reference BASELINE.md note on HF right-padding)."""
        cfg = small_enc_cfg()
        params = encoder.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 30, 80))
        lens = jnp.asarray([30])
        out_short, _ = encoder.encode(params, cfg, x, lens)
        x_pad = jnp.concatenate([x, jnp.zeros((1, 20, 80))], axis=1)
        out_pad, _ = encoder.encode(params, cfg, x_pad, lens)
        np.testing.assert_allclose(
            np.asarray(out_short)[0], np.asarray(out_pad)[0, :30], atol=1e-4
        )

    def test_masked_tail_zero(self):
        cfg = small_enc_cfg()
        params = encoder.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 40, 80))
        out, _ = encoder.encode(params, cfg, x, jnp.asarray([25]))
        assert np.abs(np.asarray(out)[0, 25:]).max() == 0.0

    def test_fsmn_memory_is_local(self):
        """FSMN memory kernel has finite receptive field: perturbing frame
        t far from frame 0 shouldn't change frame 0 through the conv branch
        alone — but attention is global, so just check output changes."""
        cfg = small_enc_cfg()
        params = encoder.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 40, 80))
        out1, _ = encoder.encode(params, cfg, x, jnp.asarray([40]))
        x2 = x.at[0, 39].add(1.0)
        out2, _ = encoder.encode(params, cfg, x2, jnp.asarray([40]))
        assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestAdaptor:
    def test_length_contract(self):
        # the T/8 downsample math (reference model.py:391-396)
        for t in (8, 17, 50, 100, 173, 998):
            o1 = 1 + (t - 3 + 2 * 1) // 2
            o2 = 1 + (o1 - 3 + 2 * 1) // 2
            expected = (o2 - 1) // 2 + 1
            assert adaptor.downsampled_length(t) == expected
            got = adaptor.downsampled_length_jnp(jnp.asarray(t))
            assert int(got) == expected

    def test_forward_shapes(self):
        cfg = small_ad_cfg()
        params = adaptor.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 64))
        lens = jnp.asarray([100, 40])
        out, out_lens = adaptor.forward(params, cfg, x, lens)
        assert out.shape[0] == 2 and out.shape[2] == 32
        assert out.shape[1] == adaptor.downsampled_length(100)
        assert out_lens.tolist() == [
            adaptor.downsampled_length(100),
            adaptor.downsampled_length(40),
        ]

    def test_mask_zeroes_tail(self):
        cfg = small_ad_cfg()
        params = adaptor.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 100, 64))
        out, out_lens = adaptor.forward(params, cfg, x, jnp.asarray([40]))
        n = int(out_lens[0])
        assert np.abs(np.asarray(out)[0, n:]).max() == 0.0
