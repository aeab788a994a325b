"""Serving engine tests with a tiny fake model (SURVEY.md §4 implication (b)):
scheduler / paged-KV / continuous batching without real weights.

Ground truth: the engine-less `greedy_decode_simple` path (full recompute
each step). The paged engine must produce identical token streams.
"""

import time

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
    kw.setdefault("max_num_seqs", 2)
    kw.setdefault("max_model_len", 64)
    kw.setdefault("block_size", 4)
    return LLM(params=params, config=cfg, dtype="float32", use_pallas=False, **kw)


def ref_decode(params, cfg, embeds, max_new):
    return greedy_decode_simple(
        params, cfg, jnp.asarray(embeds)[None], max_new_tokens=max_new
    ).tolist()


def rand_embeds(key, t, h, scale=0.3):
    return np.asarray(jax.random.normal(jax.random.PRNGKey(key), (t, h))) * scale


class TestEngine:
    def test_single_request_matches_reference(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg)
        embeds = rand_embeds(0, 9, cfg.hidden_size)
        want = ref_decode(params, cfg, embeds, 8)
        out = llm.generate(
            [{"prompt_embeds": embeds}], SamplingParams(temperature=0.0, max_tokens=8)
        )
        assert out[0].outputs[0].token_ids == want

    def test_batch_matches_reference(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=3)
        lens = [5, 11, 3, 8, 6]
        embeds = [rand_embeds(i + 1, t, cfg.hidden_size) for i, t in enumerate(lens)]
        outs = llm.generate(
            [{"prompt_embeds": e} for e in embeds],
            SamplingParams(temperature=0.0, max_tokens=6),
        )
        for e, o in zip(embeds, outs):
            assert o.outputs[0].token_ids == ref_decode(params, cfg, e, 6), (
                f"len={e.shape}"
            )

    def test_continuous_batching_more_requests_than_slots(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=2)
        embeds = [rand_embeds(i + 10, 4 + i, cfg.hidden_size) for i in range(6)]
        outs = llm.generate(
            [{"prompt_embeds": e} for e in embeds],
            SamplingParams(temperature=0.0, max_tokens=5),
        )
        assert len(outs) == 6
        for e, o in zip(embeds, outs):
            assert o.outputs[0].token_ids == ref_decode(params, cfg, e, 5)

    def test_max_tokens_respected(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg)
        embeds = rand_embeds(3, 6, cfg.hidden_size)
        outs = llm.generate(
            [{"prompt_embeds": embeds}], SamplingParams(temperature=0.0, max_tokens=2)
        )
        assert len(outs[0].outputs[0].token_ids) <= 2

    def test_block_reuse_across_calls(self, setup):
        """Blocks must be freed and reusable — run many sequential calls on a
        small pool."""
        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=1, num_blocks=20)
        for i in range(4):
            e = rand_embeds(20 + i, 7, cfg.hidden_size)
            out = llm.generate(
                [{"prompt_embeds": e}], SamplingParams(temperature=0.0, max_tokens=4)
            )
            assert out[0].outputs[0].token_ids == ref_decode(params, cfg, e, 4)
        assert len(llm._free_blocks) == 19  # all returned

    def test_cross_block_boundary(self, setup):
        """Sequence longer than one block: decode must allocate new blocks."""
        params, cfg = setup
        llm = make_llm(params, cfg, block_size=4)
        e = rand_embeds(30, 10, cfg.hidden_size)  # 10 prompt + 8 out > 4 blocks
        out = llm.generate(
            [{"prompt_embeds": e}], SamplingParams(temperature=0.0, max_tokens=8)
        )
        assert out[0].outputs[0].token_ids == ref_decode(params, cfg, e, 8)


class TestDeviceFastPath:
    def test_generate_from_audio_matches_generate(self, setup):
        """The in-graph prompt assembly must produce the same tokens as the
        host-side [prefix ⧺ audio ⧺ suffix] concatenation path."""
        import jax.numpy as jnp

        params, cfg = setup
        h = cfg.hidden_size
        rng = np.random.default_rng(5)
        prefix = rng.normal(scale=0.3, size=(3, h)).astype(np.float32)
        suffix = rng.normal(scale=0.3, size=(2, h)).astype(np.float32)
        audio = rng.normal(scale=0.3, size=(3, 7, h)).astype(np.float32)
        lens = np.asarray([7, 4, 6], np.int32)
        sp = SamplingParams(temperature=0.0, max_tokens=5)

        llm1 = make_llm(params, cfg, max_num_seqs=2)
        host_embeds = [
            np.concatenate([prefix, audio[i, : lens[i]], suffix])
            for i in range(3)
        ]
        want = [
            o.outputs[0].token_ids
            for o in llm1.generate([{"prompt_embeds": e} for e in host_embeds], sp)
        ]

        llm2 = make_llm(params, cfg, max_num_seqs=2)
        outs = llm2.generate_from_audio(
            jnp.asarray(audio), jnp.asarray(lens),
            jnp.asarray(prefix), jnp.asarray(suffix), sp,
        )
        got = [o.outputs[0].token_ids for o in outs]
        assert got == want


class TestSingleShot:
    def test_generate_fused_matches_generate(self, setup):
        """The one-dispatch encode+prefill+decode program must produce the
        same token streams as the host-side path, including sequences that
        need more tokens than one burst."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(0)
        wavs = [rng.normal(scale=0.05, size=n).astype(np.float32)
                for n in (16000, 9000, 12000)]
        pcm, frames = fe.batchify(wavs)
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)),
                             jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)),
                             jnp.float32)

        def run(burst, max_tokens):
            llm = make_llm(params, cfg, max_num_seqs=2,
                           decode_burst_size=burst)
            outs = llm.generate_fused(
                pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
                prefix, suffix,
                SamplingParams(temperature=0.0, max_tokens=max_tokens),
            )
            return [o.outputs[0].token_ids for o in outs]

        # small burst forces continuation bursts after the single shot
        want = run(burst=8, max_tokens=6)
        got = run(burst=2, max_tokens=6)
        assert got == want

    def test_pipelined_waves_match_sequential(self, setup):
        """pipeline_depth=2 (dispatch wave i+1 before fetching wave i) must
        produce identical tokens across multiple waves, including
        continuation bursts."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(4)
        # 7 utts with wave size 2 → 4 waves
        wavs = [rng.normal(scale=0.05, size=8000 + 1600 * i).astype(np.float32)
                for i in range(7)]
        pcm, frames = fe.batchify(wavs)
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)), jnp.float32)
        sp = SamplingParams(temperature=0.0, max_tokens=7)

        def run(depth):
            llm = make_llm(params, cfg, max_num_seqs=2, decode_burst_size=3,
                           pipeline_depth=depth)
            outs = llm.generate_fused(
                pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
                prefix, suffix, sp,
            )
            assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1
            return [o.outputs[0].token_ids for o in outs]

        assert run(2) == run(1)

    def test_async_wave_handles_match_sequential(self, setup):
        """generate_fused(async_result=True): overlapping handles across
        CALLS (dispatch batch i+1 before fetching batch i) must be
        token-identical to sequential calls, free all slots/blocks, and
        auto-finish the outstanding handle at depth 1."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(5)
        batches = []
        for i in range(3):
            wavs = [rng.normal(scale=0.05, size=8000 + 1600 * j
                               ).astype(np.float32) for j in (2 * i, 2 * i + 1)]
            batches.append(fe.batchify(wavs))
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)), jnp.float32)
        sp = SamplingParams(temperature=0.0, max_tokens=5)

        def call(llm, pcm, frames, **kw):
            return llm.generate_fused(
                pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
                prefix, suffix, sp, **kw,
            )

        def run_async(depth):
            llm = make_llm(params, cfg, max_num_seqs=2, decode_burst_size=8,
                           pipeline_depth=depth)
            handles = [call(llm, pcm, fr, async_result=True)
                       for pcm, fr in batches]
            toks = [[o.outputs[0].token_ids for o in han.result()]
                    for han in handles]
            assert not llm._fused_inflight
            assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1
            assert all(s is None for s in llm._slots)
            return toks

        def run_sync():
            llm = make_llm(params, cfg, max_num_seqs=2, decode_burst_size=8)
            return [[o.outputs[0].token_ids for o in call(llm, pcm, fr)]
                    for pcm, fr in batches]

        want = run_sync()
        assert run_async(2) == want   # true overlap (two waves in flight)
        assert run_async(1) == want   # auto-finish path
        # out-of-order result() resolves FIFO without deadlock
        llm = make_llm(params, cfg, max_num_seqs=2, decode_burst_size=8,
                       pipeline_depth=2)
        h1 = call(llm, *batches[0], async_result=True)
        h2 = call(llm, *batches[1], async_result=True)
        assert [o.outputs[0].token_ids for o in h2.result()] == want[1]
        assert [o.outputs[0].token_ids for o in h1.result()] == want[0]

    def test_generate_fused_packed_matches_padded(self, setup):
        """packed_prefill=True (ragged pipeline: packed encoder + adaptor
        + varlen prefill, engine/packed.py) must produce the same token
        streams as the padded fused path, including continuations."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(7)
        wavs = [rng.normal(scale=0.05, size=n).astype(np.float32)
                for n in (16000, 9000, 12000, 7000, 20000)]
        pcm, frames = fe.batchify(wavs)
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)), jnp.float32)
        sp = SamplingParams(temperature=0.0, max_tokens=5)

        def run(packed):
            llm = make_llm(params, cfg, max_num_seqs=3,
                           decode_burst_size=8, packed_prefill=packed)
            outs = llm.generate_fused(
                pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
                prefix, suffix, sp,
            )
            assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1
            return [o.outputs[0].token_ids for o in outs]

        assert run(True) == run(False)

        # packed-upload (uint32 int16-pairs) through the packed program
        # must match the f32 upload token-for-token (in-graph unpack +
        # halved t_pad_feat accounting)
        pcm_u32, frames_u32 = fe.batchify_packed(wavs)
        llm = make_llm(params, cfg, max_num_seqs=3,
                       decode_burst_size=8, packed_prefill=True)
        outs = llm.generate_fused(
            pcm_u32, frames_u32, enc_params, enc_cfg, ad_params, ad_cfg,
            fe, prefix, suffix, sp,
        )
        assert [o.outputs[0].token_ids for o in outs] == run(True)

        # sample-level ragged upload (one wave): fbank over ONE packed
        # row must be token-exact vs the padded batch
        from fun_asr_vllm_tpu.engine.packed import plan_frame_pack

        sub = wavs[:3]
        frames3 = np.asarray([fe.frame_count(len(w)) for w in sub],
                             np.int32)
        plan = plan_frame_pack(frames3, 0)
        row = fe.batchify_sample_packed(sub, plan.starts, plan.tt)
        llm = make_llm(params, cfg, max_num_seqs=3,
                       decode_burst_size=8, packed_prefill=True)
        outs_sp = llm.generate_fused(
            row, frames3, enc_params, enc_cfg, ad_params, ad_cfg,
            fe, prefix, suffix, sp, frame_plan=plan,
        )
        pcm3, f3 = fe.batchify(sub)
        llm = make_llm(params, cfg, max_num_seqs=3, decode_burst_size=8)
        outs_pad = llm.generate_fused(
            pcm3, f3, enc_params, enc_cfg, ad_params, ad_cfg,
            fe, prefix, suffix, sp,
        )
        assert ([o.outputs[0].token_ids for o in outs_sp]
                == [o.outputs[0].token_ids for o in outs_pad])

    def test_generate_fused_with_lfr_cmvn(self, setup):
        """The fused program must apply LFR + CMVN in-graph, matching the
        multi-dispatch frontend.extract → encoder → adaptor path under the
        real Fun-ASR-Nano frontend config (lfr_m=7, lfr_n=6, am.mvn)."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        lfr_m, lfr_n = 7, 6
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80 * lfr_m, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0, lfr_m=lfr_m, lfr_n=lfr_n)
        rng = np.random.default_rng(0)
        fe.cmvn = (
            rng.normal(scale=0.5, size=(80 * lfr_m,)).astype(np.float32),
            (1.0 + rng.uniform(size=(80 * lfr_m,))).astype(np.float32),
        )
        wavs = [rng.normal(scale=0.05, size=n).astype(np.float32)
                for n in (16000, 9000, 12000)]
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)), jnp.float32)
        sp = SamplingParams(temperature=0.0, max_tokens=6)

        # reference path: multi-dispatch extract → encode → adapt → generate
        speech, speech_lens = fe.extract(wavs)
        enc_out, enc_lens = encoder_mod.encode(
            enc_params, enc_cfg, speech, speech_lens
        )
        audio, audio_lens = adaptor_mod.forward(
            ad_params, ad_cfg, enc_out, enc_lens
        )
        llm1 = make_llm(params, cfg, max_num_seqs=2)
        want = [
            o.outputs[0].token_ids
            for o in llm1.generate_from_audio(
                audio, audio_lens, prefix, suffix, sp
            )
        ]

        llm2 = make_llm(params, cfg, max_num_seqs=2)
        pcm, frames = fe.batchify(wavs)
        outs = llm2.generate_fused(
            pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
            prefix, suffix, sp,
        )
        got = [o.outputs[0].token_ids for o in outs]
        assert got == want


class TestAsyncEngine:
    def test_async_submit_matches_reference_and_overlaps(self, setup):
        """Requests submitted to the async front must (a) produce the same
        tokens as the recompute reference and (b) share decode bursts when
        they overlap in time — the whole point of async admission."""
        from fun_asr_vllm_tpu.engine import AsyncLLM

        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=3, decode_burst_size=2)
        async_llm = AsyncLLM(llm, SamplingParams(temperature=0.0, max_tokens=6))
        embeds = [rand_embeds(50 + i, 5 + i, cfg.hidden_size) for i in range(3)]
        futs = [async_llm.submit(e) for e in embeds]
        reqs = [f.result(timeout=120) for f in futs]
        for e, req in zip(embeds, reqs):
            assert req.out_ids == ref_decode(params, cfg, e, 6)
        # with burst=2 and 6 max tokens, later submissions must join while
        # the first is still decoding
        assert max(async_llm.wave_sizes) >= 2, async_llm.wave_sizes
        async_llm.shutdown()

    def test_async_sequential_submissions(self, setup):
        """Requests arriving after the engine went idle still complete."""
        from fun_asr_vllm_tpu.engine import AsyncLLM

        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=2)
        async_llm = AsyncLLM(llm, SamplingParams(temperature=0.0, max_tokens=4))
        for i in range(3):
            e = rand_embeds(60 + i, 6, cfg.hidden_size)
            req = async_llm.submit(e).result(timeout=120)
            assert req.out_ids == ref_decode(params, cfg, e, 4)
        async_llm.shutdown()
        assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1

    def test_suffix_partials_share_bursts(self, setup):
        """PromptSession partials submitted through the stepper must
        (a) decode token-identically to the single-lane
        decode_with_suffix and (b) OVERLAP in shared bursts (VERDICT r2
        item 4 — previously N streams' partials serialized under the
        engine lock at ~N× latency)."""
        from fun_asr_vllm_tpu.engine import AsyncLLM
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=2, max_model_len=96,
                       decode_burst_size=2)
        sp = SamplingParams(top_p=0.001, max_tokens=8)
        async_llm = AsyncLLM(llm, sp)
        try:
            with async_llm.exclusive():
                s1, s2 = PromptSession(llm), PromptSession(llm)
                s1.extend(rand_embeds(70, 6, h))
                s2.extend(rand_embeds(71, 9, h))
                suf1 = rand_embeds(72, 3, h)
                suf2 = rand_embeds(73, 4, h)
                want1 = s1.decode_with_suffix(suf1, sp)
                want2 = s2.decode_with_suffix(suf2, sp)
                free_before = len(llm._free_blocks)
                # submit both while holding the engine lock so the
                # stepper sees both jobs in one step
                f1 = async_llm.submit_suffix(s1, suf1, sp)
                f2 = async_llm.submit_suffix(s2, suf2, sp)
            r1 = f1.result(timeout=300)
            r2 = f2.result(timeout=300)
            assert list(r1.out_ids) == want1
            assert list(r2.out_ids) == want2
            assert max(async_llm.wave_sizes) >= 2, async_llm.wave_sizes
            # scratch freed, session blocks intact → sessions reusable
            with async_llm.exclusive():
                assert len(llm._free_blocks) == free_before
                s1.extend(rand_embeds(74, 2, h))
                again = s1.decode_with_suffix(suf1, sp)
            assert isinstance(again, list)
        finally:
            async_llm.shutdown()
            with async_llm.exclusive():
                s1.close()
                s2.close()

    def test_suffix_job_fails_loudly_when_blocks_exhausted(self, setup):
        """A partial that can NEVER get KV blocks must fail its future
        with a loud error after suffix_arm_timeout_s — the pre-batching
        decode_with_suffix raised immediately; silently requeueing
        forever hangs every server executor thread on .result()."""
        from fun_asr_vllm_tpu.engine import AsyncLLM
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=1, max_model_len=64)
        async_llm = AsyncLLM(llm, suffix_arm_timeout_s=0.5)
        try:
            with async_llm.exclusive():
                s = PromptSession(llm)
                s.extend(rand_embeds(80, 40, h))
                # drain the free pool so the (table-width-legal) arm can
                # never allocate its scratch blocks while hoarder lives
                hoarder = PromptSession(llm)
                hoarder.extend(
                    rand_embeds(82, 4 * len(llm._free_blocks) - 1, h))
                assert not llm._free_blocks
                fut = async_llm.submit_suffix(
                    s, rand_embeds(81, 4, h),
                    SamplingParams(top_p=0.001, max_tokens=8),
                )
            with pytest.raises(RuntimeError, match="slot|blocks"):
                fut.result(timeout=60)
        finally:
            async_llm.shutdown()
            with async_llm.exclusive():
                s.close()
                hoarder.close()

    def test_extend_half_exhaustion_requeues_until_blocks_free(self, setup):
        """Transient KV exhaustion during the batched-extend half must
        REQUEUE (like the arm half), not permanently fail the stream: the
        blocks a completing request frees should unblock it (round-3
        review finding)."""
        import threading

        from fun_asr_vllm_tpu.engine import AsyncLLM
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=2, max_model_len=64)
        async_llm = AsyncLLM(llm, suffix_arm_timeout_s=30.0)
        try:
            with async_llm.exclusive():
                s = PromptSession(llm)
                s.extend(rand_embeds(85, 8, h))
                hoarder = PromptSession(llm)
                hoarder.extend(
                    rand_embeds(86, 4 * len(llm._free_blocks) - 1, h))
                assert not llm._free_blocks
                sp = SamplingParams(top_p=0.001, max_tokens=4)
                want = None
                fut = async_llm.submit_partial(
                    s, rand_embeds(87, 6, h), rand_embeds(88, 3, h), sp)

            def free_later():
                time.sleep(1.0)
                with async_llm.exclusive():
                    hoarder.close()

            t = threading.Thread(target=free_later)
            t.start()
            req = fut.result(timeout=120)
            t.join()
            # token-identity vs the single-lane path on a fresh session
            with async_llm.exclusive():
                s2 = PromptSession(llm)
                s2.extend(rand_embeds(85, 8, h))
                s2.extend(rand_embeds(87, 6, h))
                want = s2.decode_with_suffix(rand_embeds(88, 3, h), sp)
                s2.close()
                s.close()
            assert list(req.out_ids) == want
        finally:
            async_llm.shutdown()

    def test_one_oversized_partial_does_not_poison_the_batch(self, setup):
        """A stream whose continuation exceeds max_blocks_per_seq must
        fail ONLY its own future when co-batched with healthy streams."""
        from fun_asr_vllm_tpu.engine import AsyncLLM
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=2, max_model_len=64)
        async_llm = AsyncLLM(llm)
        try:
            with async_llm.exclusive():
                good, bad = PromptSession(llm), PromptSession(llm)
                good.extend(rand_embeds(90, 6, h))
                bad.extend(rand_embeds(91, 40, h))
                sp_ok = SamplingParams(top_p=0.001, max_tokens=4)
                suf = rand_embeds(92, 3, h)
                want = good.decode_with_suffix(suf, sp_ok)
                f_good = async_llm.submit_suffix(good, suf, sp_ok)
                f_bad = async_llm.submit_suffix(
                    bad, rand_embeds(93, 4, h),
                    SamplingParams(top_p=0.001, max_tokens=40))
            with pytest.raises(ValueError, match="max_blocks_per_seq"):
                f_bad.result(timeout=120)
            req = f_good.result(timeout=120)
            assert list(req.out_ids) == want
        finally:
            async_llm.shutdown()
            with async_llm.exclusive():
                good.close()
                bad.close()

    def test_suffix_over_table_width_raises_not_corrupts(self, setup):
        """A continuation whose block need exceeds max_blocks_per_seq must
        raise loudly at arm time: the decode block-table row is mbps wide,
        so a silent truncation would write suffix KV into wrong pages and
        corrupt the session (round-3 review finding)."""
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        # plenty of free blocks overall, but the per-seq table is 16 wide
        llm = make_llm(params, cfg, max_num_seqs=4, max_model_len=64)
        s = PromptSession(llm)
        s.extend(rand_embeds(95, 40, h))
        with pytest.raises(ValueError, match="max_blocks_per_seq"):
            s.decode_with_suffix(
                rand_embeds(96, 4, h),
                SamplingParams(top_p=0.001, max_tokens=40),
            )
        # the failed arm must not leak its slot or blocks
        assert all(x is None for x in llm._slots)
        s.close()

    def test_batched_suffix_arm_matches_single_lane(self, setup):
        """arm_suffix_batch (the packed-online dispatch sharing): three
        sessions with heterogeneous suffix lengths prefill in ONE
        batched extend and decode token-identically to the single-lane
        decode_with_suffix."""
        from fun_asr_vllm_tpu.engine.engine import (
            PromptSession, arm_suffix_batch,
        )

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=3, max_model_len=96)
        sp = SamplingParams(top_p=0.001, max_tokens=6)
        sessions, sufs, want = [], [], []
        for i, (plen, qlen) in enumerate(((5, 2), (9, 4), (7, 7))):
            s = PromptSession(llm)
            s.extend(rand_embeds(80 + i, plen, h))
            suf = rand_embeds(90 + i, qlen, h)
            sessions.append(s)
            sufs.append(suf)
            want.append(s.decode_with_suffix(suf, sp))
        free_before = len(llm._free_blocks)
        reqs = arm_suffix_batch(
            llm, [(s, suf, sp) for s, suf in zip(sessions, sufs)]
        )
        assert all(r is not None for r in reqs)
        # drive the armed slots to completion with the engine's own loop
        while any(not r.done for r in reqs):
            llm._grow_blocks_if_needed(horizon=8)
            llm._decode_burst(8)
        for r, w in zip(reqs, want):
            assert list(r.out_ids) == w
        assert len(llm._free_blocks) == free_before
        for s in sessions:
            s.close()

    def test_batched_suffix_arm_plan_failure_rolls_back(self, setup,
                                                        monkeypatch):
        """An exception while PLANNING a later job must roll back earlier
        jobs' slot reservations and scratch blocks (regression: a leaked
        bool placeholder in llm._slots crashed the stepper thread on the
        next step, hanging all future submissions)."""
        from fun_asr_vllm_tpu.engine.engine import (
            PromptSession, arm_suffix_batch,
        )

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=2, max_model_len=96)
        sp = SamplingParams(top_p=0.001, max_tokens=4)
        s1, s2 = PromptSession(llm), PromptSession(llm)
        s1.extend(rand_embeds(70, 5, h))
        s2.extend(rand_embeds(71, 5, h))
        free_before = len(llm._free_blocks)

        def boom(*a, **k):
            raise RuntimeError("plan failure")

        monkeypatch.setattr(s2, "_prepare_suffix", boom)
        with pytest.raises(RuntimeError, match="plan failure"):
            arm_suffix_batch(llm, [(s1, rand_embeds(72, 2, h), sp),
                                   (s2, rand_embeds(73, 2, h), sp)])
        assert all(sl is None for sl in llm._slots)
        assert len(llm._free_blocks) == free_before
        # the engine stays fully functional
        out = s1.decode_with_suffix(rand_embeds(72, 2, h), sp)
        assert len(out) > 0
        s1.close()
        s2.close()

    def test_extend_batch_matches_sequential(self, setup):
        """engine.extend_batch (the extend half of packed online mode):
        three sessions' heterogeneous appends in ONE batched dispatch
        must leave each cache identical to sequential single extends —
        asserted by token-identical suffix decodes."""
        from fun_asr_vllm_tpu.engine.engine import (
            PromptSession, extend_batch,
        )

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=3, max_model_len=96)
        sp = SamplingParams(top_p=0.001, max_tokens=6)
        chunks = [(100, 5), (101, 9), (102, 3)]
        seq_sess, bat_sess = [], []
        for i, (seed, t) in enumerate(chunks):
            e = rand_embeds(seed, t, h)
            s1, s2 = PromptSession(llm), PromptSession(llm)
            s1.extend(e)  # sequential reference
            seq_sess.append(s1)
            bat_sess.append((s2, e))
        extend_batch(llm, bat_sess)
        # second round of appends, also batched (boundary blocks mid-page)
        more = [(110, 4), (111, 2), (112, 7)]
        for s1, (seed, t) in zip(seq_sess, more):
            s1.extend(rand_embeds(seed, t, h))
        extend_batch(
            llm,
            [(s2, rand_embeds(seed, t, h))
             for (s2, _), (seed, t) in zip(bat_sess, more)],
        )
        for i, (s1, (s2, _)) in enumerate(zip(seq_sess, bat_sess)):
            assert s1.cached_len == s2.cached_len
            suf = rand_embeds(120 + i, 3, h)
            assert s1.decode_with_suffix(suf, sp) == \
                s2.decode_with_suffix(suf, sp)
        for s1, (s2, _) in zip(seq_sess, bat_sess):
            s1.close()
            s2.close()

    def test_partials_batch_extends_across_streams(self, setup):
        """AsyncLLM.submit_partial: two concurrent streams' ticks
        (append new prompt content + decode a suffix) must (a) match the
        single-lane extend + decode_with_suffix result and (b) share ONE
        batched extend dispatch (extend_batch_sizes records a 2)."""
        from fun_asr_vllm_tpu.engine import AsyncLLM
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        llm = make_llm(params, cfg, max_num_seqs=2, max_model_len=96,
                       decode_burst_size=2)
        sp = SamplingParams(top_p=0.001, max_tokens=6)
        async_llm = AsyncLLM(llm, sp)
        try:
            with async_llm.exclusive():
                # single-lane reference on twin sessions
                r1, r2 = PromptSession(llm), PromptSession(llm)
                pre1, pre2 = rand_embeds(130, 6, h), rand_embeds(131, 8, h)
                ext1, ext2 = rand_embeds(132, 4, h), rand_embeds(133, 5, h)
                suf1, suf2 = rand_embeds(134, 3, h), rand_embeds(135, 2, h)
                r1.extend(pre1)
                r2.extend(pre2)
                r1.extend(ext1)
                r2.extend(ext2)
                want1 = r1.decode_with_suffix(suf1, sp)
                want2 = r2.decode_with_suffix(suf2, sp)
                r1.close()
                r2.close()
                s1, s2 = PromptSession(llm), PromptSession(llm)
                s1.extend(pre1)
                s2.extend(pre2)
                # submit both ticks while holding the engine lock so the
                # stepper sees both jobs in one step
                f1 = async_llm.submit_partial(s1, ext1, suf1, sp)
                f2 = async_llm.submit_partial(s2, ext2, suf2, sp)
            o1 = f1.result(timeout=300)
            o2 = f2.result(timeout=300)
            assert list(o1.out_ids) == want1
            assert list(o2.out_ids) == want2
            assert 2 in async_llm.extend_batch_sizes, (
                async_llm.extend_batch_sizes
            )
        finally:
            async_llm.shutdown()
            with async_llm.exclusive():
                s1.close()
                s2.close()


class TestSampling:
    def test_topp_sampling_runs(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg)
        e = rand_embeds(40, 5, cfg.hidden_size)
        outs = llm.generate(
            [{"prompt_embeds": e}],
            SamplingParams(temperature=0.8, top_p=0.9, max_tokens=5),
        )
        assert len(outs[0].outputs[0].token_ids) <= 5

    def test_reference_config_is_greedy(self):
        # SamplingParams(top_p=0.001, max_tokens=500) — reference infer.py:384
        sp = SamplingParams(top_p=0.001, max_tokens=500)
        assert sp.is_greedy

    def test_mixed_batch_matches_per_request_decodes(self, setup):
        """vLLM per-prompt SamplingParams contract (VERDICT r2 item 6,
        reference model.py:645-653): heterogeneous distribution settings
        in ONE generate call. top_k=1 and a tiny top_p are deterministic
        (single-token nucleus), so every row must equal its own
        single-request decode."""
        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=3)
        embeds = [rand_embeds(50 + i, 5 + i, cfg.hidden_size)
                  for i in range(3)]
        sps = [
            SamplingParams(top_p=0.001, max_tokens=6),          # greedy
            SamplingParams(temperature=0.7, top_k=1, max_tokens=4),
            # temp 0.05 sharpens the tiny model's flat logits so the
            # top token's prob > top_p ⇒ single-token nucleus ⇒
            # deterministic despite not being greedy-classified
            SamplingParams(temperature=0.05, top_p=0.02, max_tokens=6),
        ]
        outs = llm.generate([{"prompt_embeds": e} for e in embeds], sps)
        for e, s, out in zip(embeds, sps, outs):
            single = make_llm(params, cfg).generate(
                [{"prompt_embeds": e}], s
            )
            assert (out.outputs[0].token_ids
                    == single[0].outputs[0].token_ids)
            assert len(out.outputs[0].token_ids) <= s.max_tokens

    def test_per_row_kernel_matches_uniform_kernel(self):
        """The vectorized per-row sampler must draw from the SAME
        distribution as the uniform-batch sampler for identical params —
        vLLM semantics are top-k, renormalize, then top-p; computing the
        nucleus over the unfiltered distribution instead makes a
        request's output distribution depend on batch composition.
        Same key + same masked logits ⇒ identical categorical draws."""
        from fun_asr_vllm_tpu.engine.sampling import (
            sample_tokens, sample_tokens_per_row,
        )

        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        key = jax.random.PRNGKey(11)
        for temp, top_p, top_k in [
            (1.0, 0.5, 2),    # nucleus must renormalize over the top-2
            (0.8, 0.9, 8),
            (1.3, 0.7, -1),   # top_k disabled
            (1.0, 1.0, 4),    # top_p disabled
        ]:
            uniform = sample_tokens(logits, key, temp, top_p, top_k)
            s = logits.shape[0]
            per_row = sample_tokens_per_row(
                logits, key,
                jnp.full((s,), temp, jnp.float32),
                jnp.full((s,), top_p, jnp.float32),
                jnp.full((s,), top_k, jnp.int32),
            )
            assert np.array_equal(np.asarray(uniform), np.asarray(per_row)), (
                temp, top_p, top_k)

    def test_mixed_batch_true_sampling_row_valid(self, setup):
        """A genuinely stochastic row (temp=1, top_k=3) in a mixed batch
        emits only tokens from that step's top-3 — checked by teacher
        forcing the emitted prefix through the reference forward."""
        from fun_asr_vllm_tpu.models.qwen3 import (
            embed_tokens, forward_hidden, lm_logits,
        )

        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=2)
        e = rand_embeds(60, 6, cfg.hidden_size)
        sps = [
            SamplingParams(top_p=0.001, max_tokens=5),
            SamplingParams(temperature=1.0, top_k=3, max_tokens=5),
        ]
        outs = llm.generate([{"prompt_embeds": e}, {"prompt_embeds": e}], sps)
        greedy_ids = outs[0].outputs[0].token_ids
        single = make_llm(params, cfg).generate([{"prompt_embeds": e}], sps[0])
        assert greedy_ids == single[0].outputs[0].token_ids
        sampled = outs[1].outputs[0].token_ids
        assert sampled, "sampled row emitted nothing"
        # teacher-force: each sampled token must be top-3 at its step
        seq = jnp.asarray(e, jnp.float32)
        for i, tok in enumerate(sampled):
            pos = jnp.arange(seq.shape[0])[None]
            hidden, _ = forward_hidden(params, cfg, seq[None], pos)
            logits = lm_logits(params, cfg, hidden[0, -1:])[0]
            top3 = np.argsort(np.asarray(logits))[::-1][:3]
            assert tok in top3, (i, tok, top3)
            seq = jnp.concatenate(
                [seq, embed_tokens(params, jnp.asarray([tok]))], axis=0
            )


class TestInt8Quantization:
    def test_quantized_generate_runs_and_tracks_reference(self, setup):
        """Weight-only int8 is opt-in: generation must run, and at tiny
        scale the greedy tokens should mostly track the fp engine (exact
        parity is NOT guaranteed — quantization perturbs logits)."""
        params, cfg = setup
        from fun_asr_vllm_tpu.models.qwen3 import quantize_params_int8

        e = rand_embeds(70, 8, cfg.hidden_size)
        llm_fp = make_llm(params, cfg)
        want = llm_fp.generate(
            [{"prompt_embeds": e}], SamplingParams(temperature=0.0, max_tokens=6)
        )[0].outputs[0].token_ids

        llm_q = LLM(params=params, config=cfg, dtype="float32",
                    use_pallas=False, max_num_seqs=2, max_model_len=64,
                    block_size=4, quantize="int8")
        got = llm_q.generate(
            [{"prompt_embeds": e}], SamplingParams(temperature=0.0, max_tokens=6)
        )[0].outputs[0].token_ids
        assert len(got) > 0
        # the first greedy token should survive int8 weight quantization
        assert got[0] == want[0]

    def test_quantized_logits_close(self, setup):
        params, cfg = setup
        from fun_asr_vllm_tpu.models.qwen3 import (
            forward_logits, quantize_params_int8,
        )

        qparams = quantize_params_int8(params)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, size=(1, 7))
        )
        ref = np.asarray(forward_logits(params, cfg, ids))
        got = np.asarray(forward_logits(qparams, cfg, ids))
        # per-channel int8: logits within a few percent of fp range
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 0.06

    def test_unknown_mode_raises(self, setup):
        params, cfg = setup
        with pytest.raises(ValueError, match="quantize"):
            make_llm(params, cfg, quantize="int2")


class TestInt4Quantization:
    def test_int4_mm_matches_dequantized_reference(self):
        """mm's grouped partial-sum formulation must equal the explicit
        x @ dequant(w) it factorizes (Σ_g (x_g @ q_g)·s_g), through the
        nibble pack/unpack round trip."""
        from fun_asr_vllm_tpu.models.qwen3 import (
            _unpack_int4, mm, quantize_int4,
        )

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 24)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(3, 5, 64)).astype(np.float32))
        qw = quantize_int4(w, group_size=16)
        g, gs2, out = qw["q4"].shape
        assert (g, gs2, out) == (4, 8, 24)
        assert qw["q4"].dtype == jnp.uint8
        even, odd = _unpack_int4(qw["q4"])
        deq = jnp.stack([even, odd], axis=-2)  # [G, gs/2, 2, out]
        deq = deq.reshape(g, 16, out).astype(jnp.float32) * qw["scale4"]
        want = np.asarray(x @ deq.reshape(64, 24))
        got = np.asarray(mm(x, qw))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_int4_generate_runs_and_tracks_reference(self, setup):
        """Weight-only int4 is opt-in; at tiny scale the first greedy
        token should survive the grouped 4-bit rounding."""
        params, cfg = setup
        e = rand_embeds(70, 8, cfg.hidden_size)
        want = make_llm(params, cfg).generate(
            [{"prompt_embeds": e}], SamplingParams(temperature=0.0, max_tokens=6)
        )[0].outputs[0].token_ids

        llm_q = make_llm(params, cfg, quantize="int4")
        got = llm_q.generate(
            [{"prompt_embeds": e}], SamplingParams(temperature=0.0, max_tokens=6)
        )[0].outputs[0].token_ids
        assert len(got) > 0
        assert got[0] == want[0]

    def test_int4_logits_close(self, setup):
        """Grouped int4 keeps logits within a modest fraction of the fp
        range — looser than int8 (4 bits), but bounded."""
        params, cfg = setup
        from fun_asr_vllm_tpu.models.qwen3 import (
            forward_logits, quantize_params_int4,
        )

        qparams = quantize_params_int4(params)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, size=(1, 7))
        )
        ref = np.asarray(forward_logits(params, cfg, ids))
        got = np.asarray(forward_logits(qparams, cfg, ids))
        scale = np.abs(ref).max()
        # random (incompressible) weights are the worst case for 4-bit:
        # measured ≈0.25 here vs int8's ≈0.014 — the exact 16× step-size
        # ratio, i.e. the error is the quantizer's, not a formula bug
        assert np.abs(got - ref).max() / scale < 0.35


class TestInt8KVCache:
    def test_quantize_roundtrip_error_bound(self):
        from fun_asr_vllm_tpu.engine.kv_cache import _quantize_kv

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(scale=2.0, size=(64, 4, 32)), jnp.float32)
        q, s = _quantize_kv(x)
        back = np.asarray(q, np.float32) * np.asarray(s)
        err = np.abs(back - np.asarray(x))
        # symmetric 8-bit: error bounded by half a quantization step
        bound = np.asarray(s) * 0.5 + 1e-6
        assert (err <= bound).all()

    def test_generate_matches_fp_cache_first_tokens(self, setup):
        """int8-paged KV: same API, token streams stay close to the fp
        cache at tiny scale (first token equal; decode plausible)."""
        params, cfg = setup
        sp = SamplingParams(temperature=0.0, max_tokens=6)
        embeds = [rand_embeds(70 + i, 5 + i, cfg.hidden_size)
                  for i in range(3)]
        llm_fp = make_llm(params, cfg)
        want = [o.outputs[0].token_ids for o in llm_fp.generate(
            [{"prompt_embeds": e} for e in embeds], sp)]
        llm_q = make_llm(params, cfg, kv_cache_dtype="int8")
        got = [o.outputs[0].token_ids for o in llm_q.generate(
            [{"prompt_embeds": e} for e in embeds], sp)]
        assert [g[0] for g in got] == [w[0] for w in want]
        assert all(len(g) == len(w) for g, w in zip(got, want))
        # block accounting unaffected
        assert len(llm_q._free_blocks) == llm_q.cache_cfg.num_blocks - 1

    def test_generate_fused_runs_with_int8_kv(self, setup):
        """The fused single-shot path works end-to-end on an int8 cache."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(9)
        wavs = [rng.normal(scale=0.05, size=n).astype(np.float32)
                for n in (9000, 14000)]
        pcm, frames = fe.batchify(wavs)
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)), jnp.float32)
        llm = make_llm(params, cfg, kv_cache_dtype="int8")
        outs = llm.generate_fused(
            pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
            prefix, suffix, SamplingParams(temperature=0.0, max_tokens=5),
        )
        assert len(outs) == 2
        assert all(len(o.outputs[0].token_ids) == 5 for o in outs)


class TestIncrementalDetok:
    def test_detokenizer_multibyte_holdback(self):
        """Partial UTF-8 sequences are held back until complete."""
        from fun_asr_vllm_tpu.engine.async_engine import IncrementalDetokenizer

        class ByteTok:
            def decode(self, ids, skip_special_tokens=True):
                return bytes(ids).decode("utf-8", errors="replace")

        d = IncrementalDetokenizer(ByteTok())
        b = "你好a".encode("utf-8")  # 3+3+1 bytes
        out = []
        for byte in b:
            out.append(d.add([byte]))
        assert "".join(out) == "你好a"
        # only 3 emissions are non-empty (one per completed char)
        assert sum(1 for o in out if o) == 3
        assert d.text == "你好a"

    def test_async_stream_callback(self, setup):
        """on_text receives the full transcript incrementally."""
        from fun_asr_vllm_tpu.engine import AsyncLLM

        params, cfg = setup

        class IdTok:
            eos_token_id = 1

            def decode(self, ids, skip_special_tokens=True):
                return "".join(chr(65 + (t % 26)) for t in ids)

        llm = make_llm(params, cfg, decode_burst_size=2)
        llm.tokenizer = IdTok()
        async_llm = AsyncLLM(llm, SamplingParams(temperature=0.0, max_tokens=7))
        chunks = []
        e = rand_embeds(80, 6, cfg.hidden_size)
        req = async_llm.submit(e, on_text=chunks.append).result(timeout=120)
        assert "".join(chunks) == IdTok().decode(req.out_ids)
        assert len(chunks) >= 2  # streamed across bursts, not one blob
        async_llm.shutdown()


class TestPromptSession:
    def test_incremental_prefill_matches_full(self, setup):
        """extend() in chunks + decode_with_suffix must equal a one-shot
        generate over [chunks ⧺ suffix] — the chunked-prefill parity."""
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        c1 = rand_embeds(90, 6, h)
        c2 = rand_embeds(91, 5, h)
        c3 = rand_embeds(92, 4, h)
        suffix = rand_embeds(93, 3, h)
        sp = SamplingParams(temperature=0.0, max_tokens=6)

        llm_ref = make_llm(params, cfg)
        want = llm_ref.generate(
            [{"prompt_embeds": np.concatenate([c1, c2, c3, suffix])}], sp
        )[0].outputs[0].token_ids

        llm = make_llm(params, cfg)
        sess = PromptSession(llm)
        sess.extend(c1)
        sess.extend(c2)
        sess.extend(c3)
        got = sess.decode_with_suffix(suffix, sp)
        assert got == want
        sess.close()
        assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1

    def test_repeated_decodes_do_not_corrupt_cache(self, setup):
        """Growing prompt with a decode after each extension: every
        partial must match the equivalent from-scratch decode (boundary
        block isolation)."""
        from fun_asr_vllm_tpu.engine.engine import PromptSession

        params, cfg = setup
        h = cfg.hidden_size
        chunks = [rand_embeds(100 + i, 3 + i, h) for i in range(3)]
        suffix = rand_embeds(110, 2, h)
        sp = SamplingParams(temperature=0.0, max_tokens=4)

        llm = make_llm(params, cfg, max_model_len=128, num_blocks=64)
        sess = PromptSession(llm)
        acc = []
        for ch in chunks:
            sess.extend(ch)
            acc.append(ch)
            got = sess.decode_with_suffix(suffix, sp)
            llm_ref = make_llm(params, cfg)
            want = llm_ref.generate(
                [{"prompt_embeds": np.concatenate(acc + [suffix])}], sp
            )[0].outputs[0].token_ids
            assert got == want, f"after {len(acc)} chunks"
        sess.close()


class TestPerRequestSampling:
    def test_per_request_max_tokens(self, setup):
        """vLLM contract: sampling_params may be a list, one per prompt."""
        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=3)
        embeds = [rand_embeds(120 + i, 6, cfg.hidden_size) for i in range(3)]
        sps = [SamplingParams(temperature=0.0, max_tokens=m)
               for m in (2, 5, 8)]
        outs = llm.generate([{"prompt_embeds": e} for e in embeds], sps)
        for o, m, e in zip(outs, (2, 5, 8), embeds):
            assert len(o.outputs[0].token_ids) <= m
            want = ref_decode(params, cfg, e, m)
            assert o.outputs[0].token_ids == want[:len(o.outputs[0].token_ids)]

    def test_wrong_count_raises(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg)
        e = rand_embeds(131, 5, cfg.hidden_size)
        with pytest.raises(ValueError, match="sampling_params"):
            llm.generate([{"prompt_embeds": e}], [SamplingParams(),
                                                  SamplingParams()])


class TestRequestMetrics:
    def test_outputs_carry_timing_metrics(self, setup):
        params, cfg = setup
        llm = make_llm(params, cfg)
        e = rand_embeds(140, 6, cfg.hidden_size)
        out = llm.generate(
            [{"prompt_embeds": e}], SamplingParams(temperature=0.0, max_tokens=3)
        )[0]
        m = out.metrics
        assert m["num_generated_tokens"] == len(out.outputs[0].token_ids)
        assert m["latency"] > 0
        assert m["time_to_first_token"] is not None
        assert 0 < m["time_to_first_token"] <= m["latency"]


class TestQuantizedFusedPath:
    def test_generate_fused_runs_with_int8(self, setup):
        """The single-dispatch program must accept quantized decoder
        leaves (dict params flow through the jit pytree)."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(0)
        wavs = [rng.normal(scale=0.05, size=16000).astype(np.float32)]
        pcm, frames = fe.batchify(wavs)
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)), jnp.float32)
        llm = LLM(params=params, config=cfg, dtype="float32",
                  max_num_seqs=2, max_model_len=64, block_size=4,
                  use_pallas=False, quantize="int8")
        outs = llm.generate_fused(
            pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
            prefix, suffix, SamplingParams(temperature=0.0, max_tokens=4),
        )
        assert len(outs[0].outputs[0].token_ids) > 0


class TestRandomizedSchedules:
    def test_fuzzed_request_mixes_match_reference(self, setup):
        """Property test: random request mixes (lengths, token budgets,
        arrival counts) through the continuous-batching scheduler must be
        token-exact vs the full-recompute reference — covers slot refill,
        block alloc/free, bucket selection, and early-exit interplay."""
        import random

        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=2, num_blocks=120,
                       decode_burst_size=3)
        rng = random.Random(0)
        for trial in range(4):
            n = rng.randint(1, 6)
            lens = [rng.randint(3, 20) for _ in range(n)]
            max_toks = [rng.randint(1, 9) for _ in range(n)]
            embeds = [rand_embeds(1000 + trial * 10 + i, t, cfg.hidden_size)
                      for i, t in enumerate(lens)]
            outs = llm.generate(
                [{"prompt_embeds": e} for e in embeds],
                [SamplingParams(temperature=0.0, max_tokens=m)
                 for m in max_toks],
            )
            for e, m, o in zip(embeds, max_toks, outs):
                want = ref_decode(params, cfg, e, m)
                got = o.outputs[0].token_ids
                assert got == want[: len(got)] and len(got) <= m, (
                    trial, e.shape, m, got, want
                )
            # pool fully reclaimed after every wave
            assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1


class TestPackedFuzz:
    def test_fuzzed_wave_mixes_packed_matches_padded(self, setup):
        """Property test: random utterance mixes (counts, durations,
        token budgets, multiple waves) through the PACKED fused program
        must be token-exact vs the padded fused program — covers the
        frame/prompt planners, segmented attention, page scatter and
        burst continuation interplay."""
        import random

        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        nrng = np.random.default_rng(5)
        prefix = jnp.asarray(nrng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(nrng.normal(scale=0.3, size=(2, h)), jnp.float32)
        rng = random.Random(1)
        for trial in range(3):
            n = rng.randint(1, 5)
            wavs = [nrng.normal(
                scale=0.05, size=rng.randint(4000, 24000)
            ).astype(np.float32) for _ in range(n)]
            pcm, frames = fe.batchify(wavs)
            sp = SamplingParams(temperature=0.0,
                                max_tokens=rng.randint(2, 7))

            def run(packed):
                llm = make_llm(params, cfg, max_num_seqs=2,
                               decode_burst_size=4, packed_prefill=packed)
                outs = llm.generate_fused(
                    pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg,
                    fe, prefix, suffix, sp,
                )
                assert (len(llm._free_blocks)
                        == llm.cache_cfg.num_blocks - 1)
                return [o.outputs[0].token_ids for o in outs]

            assert run(True) == run(False), trial


class TestAsyncSoak:
    def test_many_threads_many_submits(self, setup):
        """Soak: concurrent submitters from several threads; every result
        token-exact, no stuck futures, pool fully reclaimed."""
        import threading

        from fun_asr_vllm_tpu.engine import AsyncLLM

        params, cfg = setup
        llm = make_llm(params, cfg, max_num_seqs=3, num_blocks=200,
                       decode_burst_size=2)
        async_llm = AsyncLLM(llm, SamplingParams(temperature=0.0, max_tokens=4))
        results = {}
        errors = []

        def worker(tid):
            try:
                for i in range(5):
                    e = rand_embeds(2000 + tid * 100 + i, 4 + (i % 5),
                                    cfg.hidden_size)
                    req = async_llm.submit(e).result(timeout=300)
                    results[(tid, i)] = (e, req.out_ids)
            except Exception as ex:
                errors.append(ex)

        threads = [threading.Thread(target=worker, args=(t,))
                   for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        assert len(results) == 20
        for (tid, i), (e, out) in results.items():
            assert out == ref_decode(params, cfg, e, 4), (tid, i)
        async_llm.shutdown()
        assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1


class TestUploadFormats:
    def test_packed_uint32_matches_f32(self, setup):
        """The lossless packed-int16-pair upload path must produce the
        same tokens as the f32 path through the fused program."""
        import jax.numpy as jnp

        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        params, cfg = setup
        h = cfg.hidden_size
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=h, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(3)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(0)
        # int16-exact samples so f32 and packed agree bit-for-bit
        wavs = [(rng.integers(-3000, 3000, size=n).astype(np.float32)
                 / 32768.0) for n in (16000, 12000)]
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, h)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, h)), jnp.float32)
        sp = SamplingParams(temperature=0.0, max_tokens=5)

        def run(batchify):
            pcm, frames = batchify(wavs)
            llm = make_llm(params, cfg, max_num_seqs=2)
            outs = llm.generate_fused(
                pcm, frames, enc_params, enc_cfg, ad_params, ad_cfg, fe,
                prefix, suffix, sp,
            )
            return [o.outputs[0].token_ids for o in outs]

        assert run(fe.batchify_packed) == run(fe.batchify)


class TestAutoKvSizing:
    def test_memory_driven_pool_size(self, setup, monkeypatch):
        """gpu_memory_utilization sizes the KV pool from reported device
        memory (vLLM semantics); backends without stats keep the static
        floor."""
        import fun_asr_vllm_tpu.engine.engine as eng

        params, cfg = setup

        class FakeDev:
            def memory_stats(self):
                # small numbers so the CPU test cache stays tiny:
                # budget = 0.8*680M - 16M - 512M = 16 MB
                return {"bytes_limit": 680 * 2**20,
                        "bytes_in_use": 16 * 2**20}

        monkeypatch.setattr(eng.jax, "local_devices", lambda: [FakeDev()])
        llm = make_llm(params, cfg, max_num_seqs=2, max_model_len=64,
                       gpu_memory_utilization=0.8)
        # per block (bs=4): L*bs*Nkv*D*4bytes(f32 cache)*2(k+v)
        per_block = (cfg.num_hidden_layers * 4 * cfg.num_key_value_heads
                     * cfg.head_dim * 4 * 2)
        want = (int(680 * 2**20 * 0.8) - 16 * 2**20 - 512 * 2**20) \
            // per_block
        assert llm.cache_cfg.num_blocks == want
        assert len(llm._free_blocks) == want - 1  # block 0 = garbage

        # stats unavailable → static floor
        class NoStats:
            def memory_stats(self):
                return None

        monkeypatch.setattr(eng.jax, "local_devices", lambda: [NoStats()])
        llm2 = make_llm(params, cfg, max_num_seqs=2, max_model_len=64)
        mb = -(-64 // 4)
        assert llm2.cache_cfg.num_blocks == llm2.n_slots * mb + mb + 1

        # tiny budget never shrinks below the floor
        class Tiny:
            def memory_stats(self):
                return {"bytes_limit": 600 * 2**20, "bytes_in_use": 0}

        monkeypatch.setattr(eng.jax, "local_devices", lambda: [Tiny()])
        llm3 = make_llm(params, cfg, max_num_seqs=2, max_model_len=64)
        assert llm3.cache_cfg.num_blocks == llm2.cache_cfg.num_blocks

        # explicit num_blocks always wins
        monkeypatch.setattr(eng.jax, "local_devices", lambda: [FakeDev()])
        llm4 = make_llm(params, cfg, max_num_seqs=2, max_model_len=64,
                        num_blocks=33)
        assert llm4.cache_cfg.num_blocks == 33


class TestAutoBlockSize:
    """block_size=None auto-selects by window length (long-context
    windows prefer bigger pages — tools/bench_longctx.py ladder)."""

    def test_defaults_by_window(self, setup):
        params, cfg = setup
        short = LLM(params=params, config=cfg, dtype="float32",
                    use_pallas=False, max_num_seqs=1, max_model_len=512)
        assert short.cache_cfg.block_size == 16
        lng = LLM(params=params, config=cfg, dtype="float32",
                  use_pallas=False, max_num_seqs=1, max_model_len=2048,
                  num_blocks=40)
        assert lng.cache_cfg.block_size == 64

    def test_block_size_64_token_identical_to_16(self, setup):
        """The page size is a layout detail: greedy tokens must not
        depend on it (covers the prefill scatter, burst gather, and
        block-table paths at bs=64)."""
        params, cfg = setup
        e = rand_embeds(91, 37, cfg.hidden_size)
        sp = SamplingParams(temperature=0.0, max_tokens=8)
        llm16 = make_llm(params, cfg, block_size=16, max_model_len=128)
        llm64 = make_llm(params, cfg, block_size=64, max_model_len=128)
        t16 = llm16.generate([{"prompt_embeds": e}], sp)[0].outputs[0].token_ids
        t64 = llm64.generate([{"prompt_embeds": e}], sp)[0].outputs[0].token_ids
        assert t16 == t64 == ref_decode(params, cfg, e, 8)


class TestReviewRegressions:
    """Round-3 review findings (engine): int8-KV pool accounting and the
    explicit Pallas opt-out reaching the chunked long-context route."""

    def test_auto_pool_counts_per_head_scales(self, setup, monkeypatch):
        """int8 KV pages carry one f32 scale PER (token, head) — the
        auto-sizer must charge Nkv*4 bytes, not 4 (undercounting
        oversubscribes gpu_memory_utilization by ~3% at Nkv=8)."""
        import fun_asr_vllm_tpu.engine.engine as eng

        params, cfg = setup

        class FakeDev:
            def memory_stats(self):
                return {"bytes_limit": 680 * 2**20,
                        "bytes_in_use": 16 * 2**20}

        monkeypatch.setattr(eng.jax, "local_devices", lambda: [FakeDev()])
        llm = make_llm(params, cfg, max_num_seqs=2, max_model_len=64,
                       gpu_memory_utilization=0.8, kv_cache_dtype="int8")
        per_tok = cfg.num_key_value_heads * cfg.head_dim
        per_block = (cfg.num_hidden_layers * 4
                     * (per_tok + cfg.num_key_value_heads * 4) * 2)
        want = (int(680 * 2**20 * 0.8) - 16 * 2**20 - 512 * 2**20) \
            // per_block
        assert llm.cache_cfg.num_blocks == want

    def test_use_pallas_false_disables_chunked_burst(self, monkeypatch):
        """LLM(use_pallas=False) must run with NO Pallas kernels at all:
        the chunked long-context burst route (v2 kernel) honors the
        opt-out even on TPU with kernel-friendly shapes."""
        import fun_asr_vllm_tpu.engine.engine as eng

        class FakeTpu:
            platform = "tpu"
            device_kind = "TPU v5"

            def memory_stats(self):
                return None

        monkeypatch.setattr(eng.jax, "devices", lambda *a: [FakeTpu()])
        cfg = Qwen3Config(dtype=jnp.float32, **{
            **TINY, "num_attention_heads": 8, "num_key_value_heads": 2,
            "head_dim": 128,
        })
        params = init_params(cfg, jax.random.PRNGKey(5))
        auto = make_llm(params, cfg)  # make_llm pins use_pallas=False
        assert auto._chunked_burst is False
        on = LLM(params=params, config=cfg, dtype="float32",
                 max_num_seqs=2, max_model_len=64, block_size=4)
        assert on._chunked_burst is True
