"""Cache device-layout pin (engine pin_cache_layout).

The pin commits the paged KV caches token-major-within-page
(kv_cache.CACHE_TOKEN_MAJOR_M2M) and re-jits every cache-touching
program with cache outputs pinned to that Format, removing the
whole-cache relayout copies XLA otherwise inserts at dispatch
entry/exit (~2.2 ms/burst at the bench geometry, BENCH_NOTES round 5).

These tests verify the PLUMBING on CPU — token parity with an unpinned
engine, layout stability across dispatches (no signature flap →
recompile storm), and the auto-gate; the perf claim itself is pinned on
TPU by tools/probe_burst_layout.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.engine import LLM, SamplingParams
from fun_asr_vllm_tpu.engine.kv_cache import (
    CACHE_TOKEN_MAJOR_M2M,
    step_fns,
)
from fun_asr_vllm_tpu.models.qwen3 import (
    Qwen3Config,
    greedy_decode_simple,
    init_params,
)

TINY = dict(
    vocab_size=96,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
    intermediate_size=48,
    eos_token_id=1,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen3Config(dtype=jnp.float32, **TINY)
    params = init_params(cfg, jax.random.PRNGKey(7))
    return params, cfg


def make_llm(params, cfg, **kw):
    kw.setdefault("max_num_seqs", 2)
    kw.setdefault("max_model_len", 64)
    kw.setdefault("block_size", 4)
    return LLM(params=params, config=cfg, dtype="float32",
               use_pallas=False, **kw)


def rand_embeds(key, t, h, scale=0.3):
    return np.asarray(jax.random.normal(jax.random.PRNGKey(key), (t, h))) * scale


def ref_decode(params, cfg, embeds, max_new):
    return greedy_decode_simple(
        params, cfg, jnp.asarray(embeds)[None], max_new_tokens=max_new
    ).tolist()


class TestLayoutPin:
    def test_pinned_engine_token_parity(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg, pin_cache_layout=True)
        assert llm.pin_cache_layout
        assert llm.k_cache.format.layout.major_to_minor == CACHE_TOKEN_MAJOR_M2M
        lens = [5, 11, 3, 8]
        embeds = [rand_embeds(i + 1, t, cfg.hidden_size)
                  for i, t in enumerate(lens)]
        outs = llm.generate(
            [{"prompt_embeds": e} for e in embeds],
            SamplingParams(temperature=0.0, max_tokens=6),
        )
        for e, o in zip(embeds, outs):
            assert o.outputs[0].token_ids == ref_decode(params, cfg, e, 6)
        # layout survives the full prefill/burst round trip: same jit
        # signature every wave, no recompile flap
        assert llm.k_cache.format.layout.major_to_minor == CACHE_TOKEN_MAJOR_M2M
        assert llm.v_cache.format.layout.major_to_minor == CACHE_TOKEN_MAJOR_M2M

    def test_pinned_matches_unpinned_stream(self, setup):
        params, cfg = setup
        base = make_llm(params, cfg)
        pinned = make_llm(params, cfg, pin_cache_layout=True)
        embeds = [rand_embeds(i + 30, 4 + 2 * i, cfg.hidden_size)
                  for i in range(5)]
        sp = SamplingParams(temperature=0.0, max_tokens=5)
        reqs = [{"prompt_embeds": e} for e in embeds]
        a = base.generate(reqs, sp)
        b = pinned.generate(reqs, sp)
        for x, y in zip(a, b):
            assert x.outputs[0].token_ids == y.outputs[0].token_ids

    def test_auto_gate_off_cpu(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg)  # pin_cache_layout=None → auto
        assert not llm.pin_cache_layout  # CPU backend: gate stays off

    def test_pin_rejects_int8_pages(self, setup):
        params, cfg = setup
        with pytest.raises(ValueError, match="bf16 pages"):
            make_llm(params, cfg, pin_cache_layout=True,
                     kv_cache_dtype="int8")

    def test_step_fns_memoized(self, setup):
        params, cfg = setup
        a = make_llm(params, cfg, pin_cache_layout=True)
        b = make_llm(params, cfg, pin_cache_layout=True)
        # same Format → same namespace → shared jit compile caches
        assert a._step_fns is b._step_fns
        assert step_fns() is step_fns()


class TestPinPallasInteraction:
    def test_decode_once_routes_xla_when_pinned(self, setup):
        """Mosaic kernels want default operand layouts, so the pinned
        cache must NOT route the single-step Pallas decode path — it
        would relayout the whole cache inside every sampled-decode step
        (round-5 review finding)."""
        params, cfg = setup
        llm = make_llm(params, cfg, pin_cache_layout=True)
        # force the flag the TPU auto-gate would set
        llm.use_pallas = True
        llm._decode_once_pallas = (
            llm.use_pallas and not llm.pin_cache_layout)
        assert llm.pin_cache_layout
        assert not llm._decode_once_pallas

    def test_decode_once_keeps_pallas_unpinned(self, setup):
        params, cfg = setup
        llm = LLM(params=params, config=cfg, dtype="float32",
                  use_pallas=True, pin_cache_layout=False,
                  max_num_seqs=2, max_model_len=64, block_size=4)
        assert not llm.pin_cache_layout
        assert llm._decode_once_pallas
