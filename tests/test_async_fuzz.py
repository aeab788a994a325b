"""Randomized concurrency fuzz of the AsyncLLM stepper.

The stepper multiplexes three job kinds over one engine: whole-prompt
finals (`submit`), session partials (`submit_partial` = batched extend +
batched suffix arm + shared decode bursts), and slot-pressured
continuous batching. The directed tests pin each mechanism in isolation
(tests/test_engine.py, tests/test_serving.py); this fuzz interleaves
them randomly from concurrent client threads and asserts the one
invariant everything reduces to: every future resolves to the tokens
the SERIALIZED single-lane engine produces, and no slots or KV blocks
leak afterwards. This is exactly the class of bug the round-3 review
found by hand (a plan-phase exception leaking a slot placeholder) —
here random schedules hunt for the rest.
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.engine import LLM, SamplingParams
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
    kw.setdefault("max_num_seqs", 3)
    kw.setdefault("max_model_len", 96)
    kw.setdefault("block_size", 4)
    kw.setdefault("num_blocks", 400)
    return LLM(params=params, config=cfg, dtype="float32",
               use_pallas=False, **kw)


def rand_embeds(key, t, h, scale=0.3):
    return np.asarray(jax.random.normal(jax.random.PRNGKey(key), (t, h))) * scale


def _make_plans(rng, h, n_streams, n_finals):
    """Random per-stream tick scripts + standalone final prompts."""
    streams = []
    key = 1000
    for _ in range(n_streams):
        ticks = []
        for _ in range(int(rng.integers(2, 5))):
            ext_len = int(rng.integers(0, 7))     # 0 → suffix-only tick
            suf_len = int(rng.integers(1, 6))
            max_tok = int(rng.integers(2, 7))
            ticks.append((
                rand_embeds(key, ext_len, h) if ext_len else None,
                rand_embeds(key + 1, suf_len, h),
                max_tok,
            ))
            key += 2
        streams.append(ticks)
    finals = []
    for _ in range(n_finals):
        finals.append((rand_embeds(key, int(rng.integers(3, 12)), h),
                       int(rng.integers(3, 9))))
        key += 1
    return streams, finals


def _ground_truth(params, cfg, streams, finals):
    """Single-lane serialized engine = the reference schedule."""
    from fun_asr_vllm_tpu.engine.engine import PromptSession

    llm = make_llm(params, cfg)
    stream_want = []
    for ticks in streams:
        s = PromptSession(llm)
        outs = []
        for ext, suf, max_tok in ticks:
            if ext is not None:
                s.extend(ext)
            outs.append(s.decode_with_suffix(
                suf, SamplingParams(temperature=0.0, max_tokens=max_tok)))
        s.close()
        stream_want.append(outs)
    final_want = [
        greedy_decode_simple(params, cfg, jnp.asarray(e)[None],
                             max_new_tokens=mt).tolist()
        for e, mt in finals
    ]
    return stream_want, final_want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_concurrent_partials_and_finals(setup, seed):
    from fun_asr_vllm_tpu.engine.async_engine import AsyncLLM
    from fun_asr_vllm_tpu.engine.engine import PromptSession

    params, cfg = setup
    rng = np.random.default_rng(seed)
    streams, finals = _make_plans(rng, cfg.hidden_size,
                                  n_streams=4, n_finals=5)
    stream_want, final_want = _ground_truth(params, cfg, streams, finals)

    llm = make_llm(params, cfg)
    async_llm = AsyncLLM(llm)
    free_before = len(llm._free_blocks)
    stream_got = [[] for _ in streams]
    errors = []

    def run_stream(i):
        try:
            with async_llm.exclusive():
                s = PromptSession(llm)
            for ext, suf, max_tok in streams[i]:
                req = async_llm.submit_partial(
                    s, ext, suf,
                    SamplingParams(temperature=0.0, max_tokens=max_tok),
                ).result(timeout=120)
                stream_got[i].append(list(req.out_ids))
            with async_llm.exclusive():
                s.close()
        except Exception as e:  # noqa: BLE001 — re-raised below
            errors.append((i, e))

    try:
        threads = [threading.Thread(target=run_stream, args=(i,))
                   for i in range(len(streams))]
        for t in threads:
            t.start()
        futs = [
            async_llm.submit(
                e, SamplingParams(temperature=0.0, max_tokens=mt))
            for e, mt in finals
        ]
        final_got = [list(f.result(timeout=120).out_ids) for f in futs]
        for t in threads:
            t.join(timeout=180)
            assert not t.is_alive(), "stream thread hung"
    finally:
        async_llm.shutdown()

    assert not errors, errors
    assert final_got == final_want
    assert stream_got == stream_want
    # nothing leaked: all slots free, every block returned
    assert all(sl is None for sl in llm._slots)
    assert len(llm._free_blocks) == free_before
