"""End-to-end FunASRNano tests on a tiny fabricated model dir
(the test.py-shaped smoke path, SURVEY.md §7 step 5)."""

import numpy as np
import pytest

from fun_asr_vllm_tpu.audio.io import write_wav
from fun_asr_vllm_tpu.engine import LLM, SamplingParams
from fun_asr_vllm_tpu.models.nano import FunASRNano, make_test_model_dir


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nano_model")
    return make_test_model_dir(str(d))


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    t = np.arange(16000) / 16000
    wav = (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    p = d / "a.wav"
    write_wav(p, wav, 16000)
    return str(p)


class TestFromPretrained:
    def test_roundtrip(self, model_dir):
        m, kwargs = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        assert kwargs["tokenizer"] is not None
        assert kwargs["frontend"].fs == 16000
        assert m.llm_cfg.hidden_size == 64
        assert m.encoder_cfg.num_blocks == 2

    def test_llm_dir_override_loads_decoder_weights(self, tmp_path):
        """llm_dir (the --vllm_model_dir analogue, reference
        infer_kaldidata.py:386-391) loads the decoder from an HF-format
        dir when the model dir carries no combined checkpoint."""
        import os
        import shutil

        import numpy as np
        pytest.importorskip("torch")
        from transformers import Qwen3Config as HFConfig
        from transformers.models.qwen3 import Qwen3ForCausalLM

        from fun_asr_vllm_tpu.models.nano import make_test_model_dir

        model_dir = make_test_model_dir(str(tmp_path / "m"))
        os.remove(os.path.join(model_dir, "model.safetensors"))

        import torch

        hf_cfg = HFConfig(
            vocab_size=258, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=128, tie_word_embeddings=True,
            attn_implementation="eager",
        )
        torch.manual_seed(3)
        hf = Qwen3ForCausalLM(hf_cfg).eval()
        llm_dir = str(tmp_path / "hf_llm")
        hf.save_pretrained(llm_dir)

        m, _ = FunASRNano.from_pretrained(
            model=model_dir, dtype="float32", llm_dir=llm_dir)
        want = hf.get_input_embeddings().weight.detach().numpy()
        got = np.asarray(m.llm_params["embed"], dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        shutil.rmtree(llm_dir)

    def test_instruction_variants(self, model_dir):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        assert m.build_instruction() == "语音转写："
        assert m.build_instruction(language="中文") == "语音转写成中文："
        assert m.build_instruction(itn=False) == "语音转写，不进行文本规整："
        hot = m.build_instruction(hotwords=["北京", "上海"])
        assert "热词列表：[北京, 上海]" in hot


class TestInference:
    def test_engineless_inference(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        results, meta = m.inference(data_in=[wav_path], max_tokens=4)
        assert len(results) == 1
        r = results[0]
        assert set(r) >= {"key", "text", "text_tn", "label"}
        assert meta["batch_data_time"] == pytest.approx(1.0, rel=0.05)
        assert "load_data" in meta and "extract_feat" in meta

    def test_engine_inference_matches_engineless(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        ref, _ = m.inference(data_in=[wav_path], max_tokens=6)
        m.vllm = LLM(
            params=m.llm_params, config=m.llm_cfg, tokenizer=m.tokenizer,
            dtype="float32", max_num_seqs=2, max_model_len=256, block_size=16,
            use_pallas=False,
        )
        m.vllm_sampling_params = SamplingParams(top_p=0.001, max_tokens=6)
        got, _ = m.inference(data_in=[wav_path], max_tokens=6)
        assert got[0]["text"] == ref[0]["text"]

    def test_batch_raises(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        with pytest.raises(NotImplementedError):
            m.inference(data_in=[wav_path, wav_path])

    def test_output_dir_writing(self, model_dir, wav_path, tmp_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        out = tmp_path / "out"
        m.inference(
            data_in=[wav_path], key=["utt1"], output_dir=str(out), max_tokens=3
        )
        text = (out / "1best_recog" / "text").read_text()
        assert text.startswith("utt1\t")

    def test_batch_embeds_pipeline(self, model_dir):
        """The infer.py-shaped batch path: encode_batch + prompt embeds."""
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        rng = np.random.default_rng(0)
        wavs = [rng.normal(scale=0.05, size=n).astype(np.float32)
                for n in (16000, 8000)]
        audio_embeds, lens = m.encode_batch(wavs)
        assert audio_embeds.shape[0] == 2
        assert audio_embeds.shape[2] == m.llm_cfg.hidden_size
        pre, suf = m.chatml_parts(m.build_instruction())
        embeds = m.build_prompt_embeds(audio_embeds, lens, pre, suf)
        assert len(embeds) == 2
        assert embeds[0].shape[0] == len(pre) + int(lens[0]) + len(suf)
        # token-length contract: T/8 of 10ms frames
        from fun_asr_vllm_tpu.models.adaptor import downsampled_length

        assert int(lens[0]) == downsampled_length(m.frontend.frame_count(16000))


class TestMultiturn:
    """Message-format inference: speech-span parsing, multi-audio splicing,
    caps, teacher forcing (reference model.py:267-450, 666-683)."""

    def _messages(self, wav_path, turns):
        msgs = [{"role": "system", "content": "You are a helpful assistant."}]
        for i in range(turns):
            msgs.append({
                "role": "user",
                "content": f"语音转写：<|startofspeech|>!{wav_path}"
                           f"<|endofspeech|>",
            })
            msgs.append({"role": "assistant", "content": f"回答{i}"})
        return msgs

    def test_two_audio_spans_splice(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = self._messages(wav_path, 2)
        embeds, contents, batch, source_ids, meta = m.inference_prepare(
            [msgs]
        )
        assert len(contents["user"]) == 2
        assert batch["speech"].shape[0] == 2  # two fbank utterances
        assert (batch["fbank_beg"] >= 0).all()
        # each fake-token span must equal the downsampled length
        from fun_asr_vllm_tpu.models.adaptor import downsampled_length

        want = downsampled_length(m.frontend.frame_count(16000))
        assert list(batch["fake_token_len"]) == [want, want]
        # the spliced rows differ from the plain embedding of token id 0
        zero_row = np.asarray(m.embed_ids([0]))[0]
        beg = int(batch["fbank_beg"][0])
        assert not np.allclose(embeds[beg], zero_row)

    def test_multiturn_cap(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = self._messages(wav_path, 8)
        _, contents, batch, _, _ = m.inference_prepare(
            [msgs], multiturn_num_max=3
        )
        assert batch["speech"].shape[0] == 3  # capped at 3 turns

    def test_max_token_length_cap(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = self._messages(wav_path, 5)
        _, _, batch, _, _ = m.inference_prepare(
            [msgs], max_token_length=50
        )
        # the first turn exceeds 50 tokens (audio span ~101 fake tokens),
        # so only one turn is admitted
        assert batch["speech"].shape[0] == 1

    def test_message_input_through_inference(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = self._messages(wav_path, 2)
        results, meta = m.inference(data_in=[msgs], max_tokens=4)
        assert results[0]["label"] == "回答1"
        assert "batch_data_time" in meta

    def test_raw_samples_input(self, model_dir):
        """`!!` span marker: audio passed as an in-memory sample array."""
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        wav = np.random.default_rng(0).normal(
            scale=0.05, size=16000
        ).astype(np.float32)
        results, _ = m.inference(data_in=[wav], max_tokens=4)
        assert isinstance(results[0]["text"], str)

    def test_teacher_forcing_loss(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = self._messages(wav_path, 1)
        results, _ = m.inference(data_in=[msgs], teacher_forcing=True)
        r = results[0]
        assert "loss" in r and np.isfinite(r["loss"]) and r["loss"] > 0
        # the reference's typo'd kwarg must work too (model.py:641)
        results2, _ = m.inference(data_in=[msgs], teachforing=True)
        assert results2[0]["loss"] == pytest.approx(r["loss"], rel=1e-5)


class TestMultiturnVariants:
    def test_do_think_false_appends_think_block(self, model_dir, wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = [{"role": "system", "content": "s"},
                {"role": "user",
                 "content": f"转写：<|startofspeech|>!{wav_path}"
                            f"<|endofspeech|>"},
                {"role": "assistant", "content": "null"}]
        out_think = m.data_load_speech(m.data_template(msgs), do_think=True)
        out_nothink = m.data_load_speech(m.data_template(msgs), do_think=False)
        # "<think>\n\n</think>\n\n" adds tokens to the source
        assert len(out_nothink["source_ids"]) > len(out_think["source_ids"])

    def test_assistant_input_variant_omits_assistant_tag(self, model_dir,
                                                         wav_path):
        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = [{"role": "system", "content": "s"},
                {"role": "user",
                 "content": f"转写：<|startofspeech|>!{wav_path}"
                            f"<|endofspeech|>"},
                {"role": "assistant", "content": "null"}]
        a = m.data_load_speech(m.data_template(msgs))
        b = m.data_load_speech(m.data_template(msgs),
                               infer_with_assistant_input=True)
        # the assistant-input variant drops the <|im_end|>/assistant tail
        assert len(b["source_ids"]) < len(a["source_ids"])

    def test_precomputed_audio_embedding_kwargs(self, model_dir, wav_path):
        """reference model.py:477-480: audio_embedding(+lens) kwargs skip
        the encoder/adaptor and splice the given embeddings."""
        import jax.numpy as jnp

        m, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
        msgs = [{"role": "system", "content": "s"},
                {"role": "user",
                 "content": f"转写：<|startofspeech|>!{wav_path}"
                            f"<|endofspeech|>"},
                {"role": "assistant", "content": "null"}]
        # reference embeddings from the real chain
        out = m.data_load_speech(m.data_template(msgs))
        enc, enc_lens = m.audio_encoder(out["speech"], out["speech_lengths"])
        audio, audio_lens = m.audio_adaptor(enc, enc_lens)

        e_ref, *_ = m.inference_prepare([msgs])
        e_pre, *_ = m.inference_prepare(
            [msgs], audio_embedding=audio, audio_embedding_lens=audio_lens
        )
        np.testing.assert_allclose(e_pre, e_ref, atol=1e-6)
        # a DIFFERENT embedding changes the splice
        e_other, *_ = m.inference_prepare(
            [msgs], audio_embedding=audio * 2.0,
            audio_embedding_lens=audio_lens,
        )
        assert not np.allclose(e_other, e_ref)


class TestResolveModelDir:
    def test_local_dir_passthrough(self, model_dir):
        from fun_asr_vllm_tpu.models.nano import resolve_model_dir

        assert resolve_model_dir(model_dir) == model_dir

    def test_missing_path_raises(self):
        from fun_asr_vllm_tpu.models.nano import resolve_model_dir

        with pytest.raises(FileNotFoundError, match="not found"):
            resolve_model_dir("/no/such/model_dir")

    def test_hub_id_offline_raises_clearly(self):
        """An org/name id routes to the hubs (reference model.py:44-55);
        offline the error names both attempts."""
        from fun_asr_vllm_tpu.models.nano import resolve_model_dir

        with pytest.raises(FileNotFoundError, match="ModelScope/HF"):
            resolve_model_dir("FunAudioLLM/Fun-ASR-Nano-2512")
