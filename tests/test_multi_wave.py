"""Multi-wave single-dispatch fast path (engine.generate_fused_multi +
pipeline.transcribe_all): many waves scanned inside one fused program.

Token identity vs the per-wave generate_fused path is the contract —
the scan reuses the same KV pages across waves, so any page-lifetime
bug shows up as token divergence. Matches the reference's per-batch
vLLM loop semantics (reference infer.py:441-501) with the round trips
amortized."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.audio.frontend import WavFrontend
from fun_asr_vllm_tpu.engine import LLM, SamplingParams
from fun_asr_vllm_tpu.engine.packed import plan_frame_pack
from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
from fun_asr_vllm_tpu.models import encoder as encoder_mod
from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod


@pytest.fixture(scope="module")
def setup():
    enc_cfg = encoder_mod.SANMEncoderConfig(
        output_size=32, attention_heads=2, linear_units=48, num_blocks=2,
        dtype=jnp.float32)
    llm_cfg = qwen3_mod.Qwen3Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, dtype=jnp.float32, eos_token_id=1,
        pad_token_id=0, use_flash=False)
    ad_cfg = adaptor_mod.NanoAdaptorConfig(
        encoder_dim=32, llm_dim=32, ffn_dim=48, dtype=jnp.float32)
    key = jax.random.PRNGKey(11)
    enc_p = encoder_mod.init_params(enc_cfg, key)
    ad_p = adaptor_mod.init_params(ad_cfg, key)
    llm_p = qwen3_mod.init_params(llm_cfg, key)
    fe = WavFrontend(dither=0.0, bucket_seconds=1.0)
    rng = np.random.default_rng(3)
    prefix = jnp.asarray(rng.normal(scale=0.5, size=(3, 32)).astype(np.float32))
    suffix = jnp.asarray(rng.normal(scale=0.5, size=(2, 32)).astype(np.float32))
    return enc_cfg, llm_cfg, ad_cfg, enc_p, ad_p, llm_p, fe, prefix, suffix


def _mk_llm(llm_p, llm_cfg):
    return LLM(params=llm_p, config=llm_cfg, tokenizer=None,
               dtype="float32", max_num_seqs=2, max_model_len=256,
               block_size=8, packed_prefill=True, use_pallas=False)


def _mk_waves(n_waves, bsz, seed=3):
    rng = np.random.default_rng(seed)
    return [[rng.normal(size=int(rng.integers(4000, 16000)))
             .astype(np.float32) * 0.1 for _ in range(bsz)]
            for _ in range(n_waves)]


def _ref_tokens(setup, waves_wavs, sps):
    """Per-wave generate_fused (the established, fuzz-tested path)."""
    enc_cfg, llm_cfg, ad_cfg, enc_p, ad_p, llm_p, fe, prefix, suffix = setup
    llm = _mk_llm(llm_p, llm_cfg)
    out = []
    for wavs, sp in zip(waves_wavs, sps):
        frames = np.asarray([fe.frame_count(len(w)) for w in wavs], np.int32)
        plan = plan_frame_pack(frames, 0)
        packed = fe.batchify_sample_packed(wavs, plan.starts, plan.tt)
        outs = llm.generate_fused(
            jnp.asarray(packed), frames, enc_p, enc_cfg, ad_p, ad_cfg,
            fe, prefix, suffix, sp, frame_plan=plan)
        out.append([o.outputs[0].token_ids for o in outs])
    return out


class TestGenerateFusedMulti:
    def test_sample_packed_token_identity(self, setup):
        enc_cfg, llm_cfg, ad_cfg, enc_p, ad_p, llm_p, fe, prefix, suffix = setup
        waves_wavs = _mk_waves(3, 2)
        sp = SamplingParams(temperature=0.0, max_tokens=12)
        ref = _ref_tokens(setup, waves_wavs, [sp] * 3)

        llm = _mk_llm(llm_p, llm_cfg)
        frames_w = [np.asarray([fe.frame_count(len(w)) for w in wavs],
                               np.int32) for wavs in waves_wavs]
        tt = max(plan_frame_pack(fr, 0).tt for fr in frames_w)
        waves = []
        for wavs, fr in zip(waves_wavs, frames_w):
            plan = plan_frame_pack(fr, 0, bucket=tt)
            packed = fe.batchify_sample_packed(wavs, plan.starts, plan.tt)
            waves.append((jnp.asarray(packed), fr, plan))
        free0 = len(llm._free_blocks)
        res = llm.generate_fused_multi(
            waves, enc_p, enc_cfg, ad_p, ad_cfg, fe, prefix, suffix, sp)
        got = [[o.outputs[0].token_ids for o in outs] for outs in res]
        assert got == ref
        assert len(llm._free_blocks) == free0  # pages all returned

    def test_padded_variant_token_identity(self, setup):
        enc_cfg, llm_cfg, ad_cfg, enc_p, ad_p, llm_p, fe, prefix, suffix = setup
        waves_wavs = _mk_waves(3, 2, seed=7)
        sp = SamplingParams(temperature=0.0, max_tokens=12)
        ref = _ref_tokens(setup, waves_wavs, [sp] * 3)

        llm = _mk_llm(llm_p, llm_cfg)
        frames_w = [np.asarray([fe.frame_count(len(w)) for w in wavs],
                               np.int32) for wavs in waves_wavs]
        n = max(fe.padded_samples(max(len(w) for w in wavs))
                for wavs in waves_wavs)
        waves = []
        for wavs, fr in zip(waves_wavs, frames_w):
            batch, _ = fe.batchify(wavs)
            batch = np.pad(batch, ((0, 0), (0, n - batch.shape[1])))
            waves.append((jnp.asarray(batch), fr, None))
        res = llm.generate_fused_multi(
            waves, enc_p, enc_cfg, ad_p, ad_cfg, fe, prefix, suffix, sp)
        got = [[o.outputs[0].token_ids for o in outs] for outs in res]
        assert got == ref

    def test_per_wave_sampling_params(self, setup):
        """Each wave's max_tokens budget is honored independently (the
        vLLM per-request SamplingParams analogue at wave granularity)."""
        enc_cfg, llm_cfg, ad_cfg, enc_p, ad_p, llm_p, fe, prefix, suffix = setup
        waves_wavs = _mk_waves(2, 2, seed=5)
        sps = [SamplingParams(temperature=0.0, max_tokens=4),
               SamplingParams(temperature=0.0, max_tokens=11)]
        ref = _ref_tokens(setup, waves_wavs, sps)

        llm = _mk_llm(llm_p, llm_cfg)
        frames_w = [np.asarray([fe.frame_count(len(w)) for w in wavs],
                               np.int32) for wavs in waves_wavs]
        tt = max(plan_frame_pack(fr, 0).tt for fr in frames_w)
        waves = []
        for wavs, fr in zip(waves_wavs, frames_w):
            plan = plan_frame_pack(fr, 0, bucket=tt)
            packed = fe.batchify_sample_packed(wavs, plan.starts, plan.tt)
            waves.append((jnp.asarray(packed), fr, plan))
        res = llm.generate_fused_multi(
            waves, enc_p, enc_cfg, ad_p, ad_cfg, fe, prefix, suffix, sps)
        got = [[o.outputs[0].token_ids for o in outs] for outs in res]
        assert got == ref
        assert all(len(t) <= 4 for t in got[0])
        assert any(len(t) > 4 for t in got[1])  # budget actually differs

    def test_rejects_mixed_plans_and_non_greedy(self, setup):
        enc_cfg, llm_cfg, ad_cfg, enc_p, ad_p, llm_p, fe, prefix, suffix = setup
        waves_wavs = _mk_waves(2, 2)
        llm = _mk_llm(llm_p, llm_cfg)
        frames_w = [np.asarray([fe.frame_count(len(w)) for w in wavs],
                               np.int32) for wavs in waves_wavs]
        plan = plan_frame_pack(frames_w[0], 0)
        packed = fe.batchify_sample_packed(
            waves_wavs[0], plan.starts, plan.tt)
        batch, _ = fe.batchify(waves_wavs[1])
        mixed = [(jnp.asarray(packed), frames_w[0], plan),
                 (jnp.asarray(batch), frames_w[1], None)]
        with pytest.raises(ValueError, match="all-or-none"):
            llm.generate_fused_multi(
                mixed, enc_p, enc_cfg, ad_p, ad_cfg, fe, prefix, suffix,
                SamplingParams(temperature=0.0, max_tokens=4))
        with pytest.raises(ValueError, match="greedy"):
            llm.generate_fused_multi(
                mixed[:1], enc_p, enc_cfg, ad_p, ad_cfg, fe, prefix,
                suffix, SamplingParams(temperature=0.9, max_tokens=4))


class TestTranscribeAll:
    def test_matches_transcribe_many_with_ragged_tail(self, tmp_path):
        """transcribe_all (few dispatches) must produce the same texts as
        transcribe_many (one dispatch per wave), including a tail batch
        smaller than the wave size (dummy padding dropped)."""
        from fun_asr_vllm_tpu.models.nano import make_test_model_dir
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        md = make_test_model_dir(str(tmp_path))
        rng = np.random.default_rng(0)
        batches = [
            [rng.normal(size=int(rng.integers(3200, 9600)))
             .astype(np.float32) * 0.1 for _ in range(n)]
            for n in (2, 2, 1)  # ragged tail
        ]
        pipe = BatchPipeline(md, dtype="float32", enable_engine=True,
                             max_num_seqs=2, max_tokens=6,
                             max_model_len=512)
        ref = list(pipe.transcribe_many([list(b) for b in batches]))
        got = pipe.transcribe_all([list(b) for b in batches])
        assert got == ref

    def test_empty_batches(self, tmp_path):
        """All-empty input follows the transcribe_many contract instead
        of crashing on range(0, 0, 0) (review finding)."""
        from fun_asr_vllm_tpu.models.nano import make_test_model_dir
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        md = make_test_model_dir(str(tmp_path))
        pipe = BatchPipeline(md, dtype="float32", enable_engine=True,
                             max_num_seqs=2, max_tokens=4,
                             max_model_len=256)
        assert pipe.transcribe_all([[], []]) == [[], []]

    def test_f32_upload_matches_packed_wire(self, tmp_path):
        """The PADDED multi path ships uint32 int16-pairs by default
        (half the wire bytes); upload="f32" must produce identical
        texts — the packing is lossless for int16-range PCM. The
        sample_packed route is forced off so the padded branch (where
        the wire format lives) is the one under test."""
        import dataclasses

        from fun_asr_vllm_tpu.models.nano import make_test_model_dir
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        md = make_test_model_dir(str(tmp_path))
        rng = np.random.default_rng(7)
        # int16-representable PCM in [-1, 1): after batchify's x32768
        # scaling each sample is an exact int16, so the packed wire's
        # int16 quantization is a no-op and the formats must agree
        batches = [
            [(rng.integers(-12000, 12000,
                           size=int(rng.integers(3200, 9600)))
              .astype(np.float32) / 32768.0) for _ in range(n)]
            for n in (2, 1)
        ]
        pipe = BatchPipeline(md, dtype="float32", enable_engine=True,
                             max_num_seqs=2, max_tokens=6,
                             max_model_len=512)
        pipe.model.adaptor_cfg = dataclasses.replace(
            pipe.model.adaptor_cfg, use_low_frame_rate=False)
        packed = pipe.transcribe_all([list(b) for b in batches])
        f32 = pipe.transcribe_all([list(b) for b in batches],
                                  upload="f32")
        assert packed == f32

    def test_rejects_unknown_upload_mode(self, tmp_path):
        """upload is validated against one explicit set in BOTH entry
        points — a typo'd mode must not silently pick a wire format
        (review finding: the two paths used opposite conventions)."""
        from fun_asr_vllm_tpu.models.nano import make_test_model_dir
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        md = make_test_model_dir(str(tmp_path))
        pipe = BatchPipeline(md, dtype="float32", enable_engine=True,
                             max_num_seqs=2, max_tokens=4,
                             max_model_len=256)
        wavs = [np.zeros(3200, np.float32)]
        with pytest.raises(ValueError, match="upload"):
            pipe.transcribe_all([wavs], upload="int16")
        with pytest.raises(ValueError, match="upload"):
            list(pipe.transcribe_many([wavs], upload="int16"))


class TestEntryPointLfrMatrix:
    """Every pipeline entry point must accept every adaptor/frontend LFR
    combination the model dir can declare (reference model.py:112-124:
    the engine takes whatever adaptor config.yaml names) and agree on
    the texts. Regression for the round-3 bug where transcribe_all
    routed use_low_frame_rate=False into the packed program, which
    raises (adaptor.py forward_packed guard)."""

    @pytest.fixture(scope="class")
    def pipe(self, tmp_path_factory):
        from fun_asr_vllm_tpu.models.nano import make_test_model_dir
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        md = make_test_model_dir(
            str(tmp_path_factory.mktemp("lfr_matrix_model")))
        return BatchPipeline(md, dtype="float32", enable_engine=True,
                             max_num_seqs=2, max_tokens=5,
                             max_model_len=512)

    @pytest.mark.parametrize("low_frame_rate", [True, False])
    @pytest.mark.parametrize("lfr_n", [1, 2])
    def test_all_entry_points_agree(self, pipe, low_frame_rate, lfr_n):
        import dataclasses

        rng = np.random.default_rng(19 + lfr_n)
        batches = [
            [rng.normal(size=int(rng.integers(3200, 9600)))
             .astype(np.float32) * 0.1 for _ in range(n)]
            for n in (2, 1)
        ]
        orig_ad, orig_fe = pipe.model.adaptor_cfg, pipe.model.frontend
        try:
            pipe.model.adaptor_cfg = dataclasses.replace(
                orig_ad, use_low_frame_rate=low_frame_rate)
            if lfr_n != 1:
                # lfr_m stays 1 so the feature dim still matches the
                # test encoder's input_size
                pipe.model.frontend = WavFrontend(
                    dither=0.0, lfr_m=1, lfr_n=lfr_n)
            per_batch = [pipe.transcribe_batch(list(b)) for b in batches]
            many = list(pipe.transcribe_many([list(b) for b in batches]))
            alls = pipe.transcribe_all([list(b) for b in batches])
            assert many == per_batch
            assert alls == per_batch
        finally:
            pipe.model.adaptor_cfg = orig_ad
            pipe.model.frontend = orig_fe
