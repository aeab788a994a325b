"""Qwen3 JAX decoder: logit parity vs transformers' reference implementation
(SURVEY.md §7 step 3) plus decode behavior."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from fun_asr_vllm_tpu.models.qwen3 import (
    Qwen3Config,
    embed_tokens,
    forward_hidden,
    forward_logits,
    greedy_decode_simple,
    init_params,
    lm_logits,
)

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=96,
    rope_theta=1_000_000.0,
    tie_word_embeddings=True,
)


def tiny_cfg(dtype=jnp.float32, **over):
    d = dict(TINY)
    d.update(over)
    return Qwen3Config(dtype=dtype, **d)


@pytest.fixture(scope="module")
def hf_pair():
    """A tiny random HF Qwen3 model + its converted JAX params."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config as HFConfig
    from transformers.models.qwen3 import Qwen3ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=TINY["vocab_size"],
        hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_hidden_layers"],
        num_attention_heads=TINY["num_attention_heads"],
        num_key_value_heads=TINY["num_key_value_heads"],
        head_dim=TINY["head_dim"],
        intermediate_size=TINY["intermediate_size"],
        rope_theta=TINY["rope_theta"],
        tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf_cfg).eval()

    from fun_asr_vllm_tpu.models.convert import qwen3_from_state_dict

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = tiny_cfg(dtype=jnp.float32)
    params = qwen3_from_state_dict(sd, cfg)
    return model, params, cfg


class TestParity:
    def test_logits_match_transformers(self, hf_pair):
        torch = pytest.importorskip("torch")
        model, params, cfg = hf_pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=(2, 11))
        with torch.no_grad():
            ref = model(torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(forward_logits(params, cfg, jnp.asarray(ids)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)

    def test_embeds_path_matches(self, hf_pair):
        torch = pytest.importorskip("torch")
        model, params, cfg = hf_pair
        rng = np.random.default_rng(1)
        embeds = rng.normal(scale=0.05, size=(1, 7, cfg.hidden_size)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = model(inputs_embeds=torch.from_numpy(embeds)).logits.numpy()
        pos = jnp.arange(7)[None, :]
        hidden, _ = forward_hidden(params, cfg, jnp.asarray(embeds), pos)
        got = np.asarray(lm_logits(params, cfg, hidden))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


class TestModel:
    def test_forward_shapes_and_kv(self):
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(0))
        x = embed_tokens(params, jnp.zeros((2, 5), jnp.int32)).astype(cfg.dtype)
        pos = jnp.broadcast_to(jnp.arange(5)[None], (2, 5))
        hidden, kvs = forward_hidden(params, cfg, x, pos, return_kv=True)
        assert hidden.shape == (2, 5, cfg.hidden_size)
        k, v = kvs
        assert k.shape == (
            cfg.num_hidden_layers, 2, 5, cfg.num_key_value_heads, cfg.head_dim
        )

    def test_causality(self):
        """Changing a future token must not change past logits."""
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(0))
        ids1 = jnp.asarray([[1, 2, 3, 4, 5]])
        ids2 = jnp.asarray([[1, 2, 3, 99, 100]])
        l1 = np.asarray(forward_logits(params, cfg, ids1))
        l2 = np.asarray(forward_logits(params, cfg, ids2))
        np.testing.assert_allclose(l1[0, :3], l2[0, :3], atol=1e-5)
        assert not np.allclose(l1[0, 3:], l2[0, 3:])

    def test_length_masking(self):
        """Padded tail must not influence valid positions."""
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.asarray([[5, 6, 7]])
        ids_padded = jnp.asarray([[5, 6, 7, 88, 99]])
        l_short = np.asarray(forward_logits(params, cfg, ids))
        l_pad = np.asarray(
            forward_logits(params, cfg, ids_padded, attn_lengths=jnp.asarray([3]))
        )
        np.testing.assert_allclose(l_short[0], l_pad[0, :3], atol=1e-5)

    def test_greedy_decode_deterministic(self):
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(1))
        embeds = jax.random.normal(
            jax.random.PRNGKey(2), (1, 4, cfg.hidden_size)
        ) * 0.05
        a = greedy_decode_simple(params, cfg, embeds, max_new_tokens=6)
        b = greedy_decode_simple(params, cfg, embeds, max_new_tokens=6)
        assert a.tolist() == b.tolist()
        assert len(a) <= 6


class TestPaddedBatchFallback:
    """greedy_decode_padded — the HF right-padded batch-generate analogue
    (reference infer.py:477-491; docs/MIGRATION.md)."""

    def _mk(self, seed=3):
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(seed))
        return cfg, params

    def test_equal_lengths_match_simple(self):
        """With no padding, every sequence must decode token-identically
        to the per-sequence slow path."""
        from fun_asr_vllm_tpu.models.qwen3 import greedy_decode_padded

        cfg, params = self._mk()
        embeds = (
            jax.random.normal(jax.random.PRNGKey(7), (3, 5, cfg.hidden_size))
            * 0.05
        )
        lens = jnp.asarray([5, 5, 5])
        batched = greedy_decode_padded(
            params, cfg, embeds, lens, max_new_tokens=6
        )
        for i in range(3):
            single = greedy_decode_simple(
                params, cfg, embeds[i][None], max_new_tokens=6
            )
            assert batched[i].tolist() == single.tolist()

    def test_ragged_longest_matches_simple(self):
        """The longest sequence sees no pad rows, so it must match its
        batch-1 decode exactly even in a ragged batch (the reference's
        padding geometry only perturbs the shorter members)."""
        from fun_asr_vllm_tpu.models.qwen3 import greedy_decode_padded

        cfg, params = self._mk(seed=4)
        h = cfg.hidden_size
        e_long = jax.random.normal(jax.random.PRNGKey(8), (7, h)) * 0.05
        e_short = jax.random.normal(jax.random.PRNGKey(9), (3, h)) * 0.05
        padded = jnp.zeros((2, 7, h)).at[0].set(e_long)
        padded = padded.at[1, :3].set(e_short)
        lens = jnp.asarray([7, 3])
        batched = greedy_decode_padded(
            params, cfg, padded, lens, max_new_tokens=5
        )
        single = greedy_decode_simple(
            params, cfg, e_long[None], max_new_tokens=5
        )
        assert batched[0].tolist() == single.tolist()
        assert len(batched[1]) <= 5

    def test_pad_keys_masked(self):
        """Pad rows are ONLY ever read as attention keys (the shared
        logits row t0-1 is the one pad row whose content is also a
        query, mirroring HF). Garbage in the non-queried pad rows must
        change nothing — proving the key mask masks — and the other
        batch member must be unaffected by any of it."""
        from fun_asr_vllm_tpu.models.qwen3 import greedy_decode_padded

        cfg, params = self._mk(seed=5)
        h = cfg.hidden_size
        e_long = jax.random.normal(jax.random.PRNGKey(10), (6, h)) * 0.05
        e_short = jax.random.normal(jax.random.PRNGKey(11), (2, h)) * 0.05
        base = jnp.zeros((2, 6, h)).at[0].set(e_long).at[1, :2].set(e_short)
        # garbage at pad rows 2..4 only; row 5 (the shared query row)
        # stays zero like pad_sequence fills it
        garbage = base.at[1, 2:5].set(
            jax.random.normal(jax.random.PRNGKey(12), (3, h)) * 5.0
        )
        lens = jnp.asarray([6, 2])
        a = greedy_decode_padded(params, cfg, base, lens, max_new_tokens=4)
        b = greedy_decode_padded(params, cfg, garbage, lens, max_new_tokens=4)
        assert a[1].tolist() == b[1].tolist()
        assert a[0].tolist() == b[0].tolist()
