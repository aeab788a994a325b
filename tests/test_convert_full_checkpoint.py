"""Full-checkpoint landing proof (VERDICT r2 item 1).

Fabricates a COMPLETE synthetic funasr-format Fun-ASR-Nano model.pt
(SANM encoder incl. tp_encoders, every adaptor naming variant, HF Qwen3
key space under `llm.`) and proves, end to end:

  1. two-direction converter coverage — every source key consumed, every
     target leaf filled at the model code's own init shapes;
  2. `FunASRNano.from_pretrained` + engine decode is token-exact against
     an independent torch full stack (funasr-semantics encoder/adaptor
     mini-references + transformers Qwen3ForCausalLM greedy generate).

This pins the converter key space, every transpose, and the decode path
so the day real weights land, `tools/check_checkpoint.py` plus
`cli/infer.py` is all that remains (reference model.py:40-67, 112-124,
README.md:96 CER bar).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import check_checkpoint as cc  # noqa: E402  (tools/ on sys.path, conftest)
from torch_funasr_refs import ADAPTOR_NAMINGS  # noqa: E402

from fun_asr_vllm_tpu.audio.io import write_wav  # noqa: E402
from fun_asr_vllm_tpu.engine import LLM, SamplingParams  # noqa: E402
from fun_asr_vllm_tpu.models.nano import FunASRNano  # noqa: E402


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(7)
    t = np.arange(24000) / 16000
    wav = (0.2 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
    p = d / "utt.wav"
    write_wav(p, wav, 16000)
    return str(p)


class TestConverterCoverage:
    @pytest.mark.parametrize("naming", sorted(ADAPTOR_NAMINGS))
    def test_every_adaptor_naming_round_trips(self, tmp_path, naming):
        """Each plausible funasr adaptor key naming must fully convert:
        zero unconsumed source keys, zero missing/extra/mismatched target
        leaves (convert.py _ADAPTOR_ALIASES)."""
        d = tmp_path / naming
        cc.fabricate(str(d), adaptor_naming=naming)
        report = cc.check_model_dir(str(d))
        assert report.ok, "\n" + report.render()

    def test_redundant_tied_lm_head_is_expected(self, tmp_path):
        """Some exporters store the tied lm_head duplicate; it must be
        classified expected-unconsumed, not flagged."""
        d = tmp_path / "tied"
        cc.fabricate(str(d), tie_lm_head_copy=True)
        report = cc.check_model_dir(str(d))
        assert report.ok, "\n" + report.render()
        assert report.expected_unconsumed == ["llm.lm_head.weight"]

    def test_renamed_key_is_flagged_both_directions(self, tmp_path):
        """A drifted key name must surface as unconsumed-source AND
        missing-target — the failure mode the tool exists to catch."""
        import torch as _torch

        d = tmp_path / "drift"
        cc.fabricate(str(d))
        sd = _torch.load(d / "model.pt", map_location="cpu",
                         weights_only=True)
        val = sd.pop("audio_encoder.after_norm.weight")
        sd["audio_encoder.post_norm.weight"] = val
        _torch.save(sd, d / "model.pt")
        with pytest.raises(KeyError):
            cc.check_model_dir(str(d))


class TestFullStackTokenParity:
    def test_from_pretrained_engine_decode_matches_torch_stack(
        self, tmp_path, wav_path
    ):
        """Synthetic model.pt → from_pretrained → engine decode must be
        token-exact vs torch encoder+adaptor+HF Qwen3 greedy generate."""
        model_dir = tmp_path / "nano"
        enc_ref, ad_ref, hf_llm = cc.fabricate(str(model_dir), seed=3)

        m, _ = FunASRNano.from_pretrained(model=str(model_dir),
                                          dtype="float32")
        msgs = [
            {"role": "system", "content": "You are a helpful assistant."},
            {"role": "user",
             "content": ("语音转写：<|startofspeech|>!" + wav_path
                         + "<|endofspeech|>")},
            {"role": "assistant", "content": "null"},
        ]
        embeds, _, output, _, _ = m.inference_prepare(
            [msgs], tokenizer=m.tokenizer, frontend=m.frontend
        )

        # --- independent torch full stack over the same fbank + ids ---
        ids = np.maximum(np.asarray(output["source_ids"]), 0)
        with torch.no_grad():
            t_embeds = hf_llm.get_input_embeddings()(
                torch.from_numpy(ids)
            ).clone()
            speech = torch.from_numpy(np.array(output["speech"]))
            lens = torch.from_numpy(
                np.asarray(output["speech_lengths"], np.int64)
            )
            audio = ad_ref(enc_ref(speech, lens))
            speech_idx = 0
            for turn, beg in enumerate(np.asarray(output["fbank_beg"])):
                if beg <= 0:
                    continue
                n = int(output["fake_token_len"][turn])
                t_embeds[beg: beg + n] = audio[speech_idx, :n]
                speech_idx += 1
            assert speech_idx == 1
            hf_out = hf_llm.generate(
                inputs_embeds=t_embeds[None], max_new_tokens=12,
                do_sample=False, eos_token_id=1, pad_token_id=0,
            )
        want = []
        for tok in hf_out[0].tolist():
            if tok == 1:
                break
            want.append(tok)
        assert want, "torch reference emitted nothing"

        # numerics sanity: the two stacks' spliced prompts agree closely
        np.testing.assert_allclose(
            embeds, t_embeds.numpy(), atol=2e-4, rtol=1e-3
        )

        # --- our engine over the converted weights ---
        m.vllm = LLM(
            params=m.llm_params, config=m.llm_cfg, tokenizer=m.tokenizer,
            dtype="float32", max_num_seqs=2, max_model_len=512,
            block_size=16, use_pallas=False,
        )
        outputs = m.vllm.generate(
            {"prompt_embeds": embeds},
            SamplingParams(top_p=0.001, max_tokens=12),
            use_tqdm=False,
        )
        got = list(outputs[0].outputs[0].token_ids)
        assert got == want

        # and the engine-less greedy fallback agrees too
        ref, _ = m.inference(data_in=[msgs], max_tokens=12)
        m.vllm = None
        engineless, _ = m.inference(data_in=[msgs], max_tokens=12)
        assert ref[0]["text"] == engineless[0]["text"]
