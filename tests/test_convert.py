"""Checkpoint converter golden tests.

A torch mini-reference implements funasr's SANM semantics exactly as
documented in funasr/models/sanm/{encoder,attention}.py (ESPnet lineage:
LayerNorm eps=1e-12, scores scaled by d_k**-0.5, fsmn memory joined AFTER
linear_out, sanm_shift as extra left padding). Random funasr-format
state_dicts are converted with models/convert.py and activations compared
— this pins the key mapping, every transpose, and the layer math before
real Fun-ASR-Nano weights exist (reference model.py:40-67, 112-124).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from fun_asr_vllm_tpu.models import adaptor as adaptor_mod  # noqa: E402
from fun_asr_vllm_tpu.models import encoder as encoder_mod  # noqa: E402
from fun_asr_vllm_tpu.models.convert import (  # noqa: E402
    adaptor_from_funasr_sd,
    encoder_from_funasr_sd,
)


# torch funasr mini-references shared with tools/check_checkpoint.py
from torch_funasr_refs import (  # noqa: E402
    AdaptorRef,
    SANMEncoderRef,
)


def _sd_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --------------------------------- tests ------------------------------------


class TestEncoderConversion:
    @pytest.mark.parametrize("sanm_shift,tp_blocks", [(0, 0), (3, 0), (0, 2)])
    def test_activation_parity(self, sanm_shift, tp_blocks):
        torch.manual_seed(0)
        d, heads, lu, blocks, ksz = 32, 4, 48, 3, 7
        ref = SANMEncoderRef(80, d, heads, lu, blocks, ksz,
                             sanm_shift=sanm_shift, tp_blocks=tp_blocks)
        cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=d, attention_heads=heads,
            linear_units=lu, num_blocks=blocks, kernel_size=ksz,
            sanm_shift=sanm_shift, tp_blocks=tp_blocks, dtype=jnp.float32,
        )
        params = encoder_from_funasr_sd(_sd_np(ref), cfg)

        rng = np.random.default_rng(1)
        x = rng.normal(scale=0.5, size=(2, 20, 80)).astype(np.float32)
        lens = np.asarray([20, 13], np.int32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(lens)).numpy()
        got, _ = encoder_mod.encode(params, cfg, jnp.asarray(x),
                                    jnp.asarray(lens))
        got = np.asarray(got)
        for i, n in enumerate(lens):
            np.testing.assert_allclose(
                got[i, :n], want[i, :n], atol=2e-4, rtol=1e-3
            )

    def test_missing_key_raises(self):
        cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=48, num_blocks=2, dtype=jnp.float32,
        )
        with pytest.raises(KeyError):
            encoder_from_funasr_sd({}, cfg)


class TestAdaptorConversion:
    def test_activation_parity(self):
        torch.manual_seed(2)
        e, llm_dim, ffn = 32, 24, 40
        ref = AdaptorRef(e, llm_dim, ffn)
        cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=e, llm_dim=llm_dim, ffn_dim=ffn, dtype=jnp.float32
        )
        params = adaptor_from_funasr_sd(_sd_np(ref), cfg)

        rng = np.random.default_rng(3)
        x = rng.normal(scale=0.5, size=(2, 50, e)).astype(np.float32)
        lens = np.asarray([50, 29], np.int32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got, got_lens = adaptor_mod.forward(
            params, cfg, jnp.asarray(x), jnp.asarray(lens)
        )
        got = np.asarray(got)
        assert got.shape == want.shape
        for i in range(2):
            n = int(got_lens[i])
            np.testing.assert_allclose(
                got[i, :n], want[i, :n], atol=2e-4, rtol=1e-3
            )

    def test_alias_miss_reports_available(self):
        cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=8, llm_dim=8, ffn_dim=8, dtype=jnp.float32
        )
        with pytest.raises(KeyError, match="available"):
            adaptor_from_funasr_sd({"something.weight": np.zeros(1)}, cfg)


class TestCombinedCheckpoint:
    def test_from_pretrained_funasr_model_pt(self, tmp_path):
        """A synthetic funasr-format model.pt (audio_encoder.* /
        audio_adaptor.* / llm.* HF naming) must load through
        FunASRNano.from_pretrained and reproduce the torch encoder."""
        import yaml

        from fun_asr_vllm_tpu.models.nano import FunASRNano

        torch.manual_seed(4)
        d, heads, lu, blocks, ksz = 32, 4, 48, 2, 7
        hidden, n_layers, vocab = 24, 1, 64
        enc_ref = SANMEncoderRef(80, d, heads, lu, blocks, ksz)
        ad_ref = AdaptorRef(d, hidden, 40)

        sd = {}
        for k, v in enc_ref.state_dict().items():
            sd["audio_encoder." + k] = v
        for k, v in ad_ref.state_dict().items():
            sd["audio_adaptor." + k] = v
        # tiny HF-named Qwen3 decoder
        head_dim = 8
        g = torch.Generator().manual_seed(5)

        def t(*shape):
            return torch.randn(*shape, generator=g) * 0.05

        sd["llm.model.embed_tokens.weight"] = t(vocab, hidden)
        sd["llm.model.norm.weight"] = torch.ones(hidden)
        p = "llm.model.layers.0."
        sd[p + "input_layernorm.weight"] = torch.ones(hidden)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(hidden)
        sd[p + "self_attn.q_proj.weight"] = t(4 * head_dim, hidden)
        sd[p + "self_attn.k_proj.weight"] = t(2 * head_dim, hidden)
        sd[p + "self_attn.v_proj.weight"] = t(2 * head_dim, hidden)
        sd[p + "self_attn.o_proj.weight"] = t(hidden, 4 * head_dim)
        sd[p + "self_attn.q_norm.weight"] = torch.ones(head_dim)
        sd[p + "self_attn.k_norm.weight"] = torch.ones(head_dim)
        sd[p + "mlp.gate_proj.weight"] = t(48, hidden)
        sd[p + "mlp.up_proj.weight"] = t(48, hidden)
        sd[p + "mlp.down_proj.weight"] = t(hidden, 48)

        model_dir = tmp_path / "funasr_nano"
        model_dir.mkdir()
        torch.save(sd, model_dir / "model.pt")
        conf = {
            "model": "FunASRNano",
            "input_size": 80,
            "audio_encoder": "SenseVoiceEncoderSmall",
            "audio_encoder_conf": {
                "output_size": d, "attention_heads": heads,
                "linear_units": lu, "num_blocks": blocks,
                "kernel_size": ksz, "tp_blocks": 0,
            },
            "audio_adaptor": "Linear",
            "audio_adaptor_conf": {
                "encoder_dim": d, "llm_dim": hidden, "ffn_dim": 40,
                "use_low_frame_rate": True,
            },
            "llm_conf": {
                "vocab_size": vocab, "hidden_size": hidden,
                "num_hidden_layers": n_layers, "num_attention_heads": 4,
                "num_key_value_heads": 2, "head_dim": head_dim,
                "intermediate_size": 48, "eos_token_id": 1,
            },
            "frontend_conf": {"fs": 16000, "lfr_m": 1, "lfr_n": 1},
        }
        with open(model_dir / "config.yaml", "w") as f:
            yaml.safe_dump(conf, f)

        m, kwargs = FunASRNano.from_pretrained(
            model=str(model_dir), dtype="float32"
        )
        rng = np.random.default_rng(6)
        x = rng.normal(scale=0.5, size=(1, 16, 80)).astype(np.float32)
        lens = np.asarray([16], np.int32)
        with torch.no_grad():
            want = enc_ref(torch.from_numpy(x), torch.from_numpy(lens)).numpy()
        got, _ = m.audio_encoder(x, lens)
        np.testing.assert_allclose(
            np.asarray(got)[0], want[0], atol=2e-4, rtol=1e-3
        )


class TestQwen3ASRConvert:
    """Qwen3-ASR-style multimodal checkpoint converter (VERDICT r4 ask
    #5): the data factory's dedicated transcriber (reference
    run_audio_cat_cut.py:566, 603-609; simple_audio_processor.py:791-822)
    is a Qwen3 decoder variant under a multimodal key prefix + an audio
    tower. Fabricates a synthetic checkpoint dir and proves converter
    coverage + a full from_pretrained load + engine-less decode."""

    H, V, L, NH, NKV, HD, I = 32, 64, 2, 2, 1, 16, 48
    ENC_D, ENC_B, ENC_FF = 32, 2, 64

    def _fab_sd(self, rng, audio_tower=True, prefix="thinker."):
        sd = {}

        def add(k, *shape):
            sd[k] = rng.normal(scale=0.1, size=shape).astype(np.float32)

        p = prefix
        add(p + "model.embed_tokens.weight", self.V, self.H)
        add(p + "model.norm.weight", self.H)
        for i in range(self.L):
            q = p + f"model.layers.{i}."
            add(q + "input_layernorm.weight", self.H)
            add(q + "post_attention_layernorm.weight", self.H)
            add(q + "self_attn.q_proj.weight", self.NH * self.HD, self.H)
            add(q + "self_attn.k_proj.weight", self.NKV * self.HD, self.H)
            add(q + "self_attn.v_proj.weight", self.NKV * self.HD, self.H)
            add(q + "self_attn.o_proj.weight", self.H, self.NH * self.HD)
            add(q + "self_attn.q_norm.weight", self.HD)
            add(q + "self_attn.k_norm.weight", self.HD)
            add(q + "mlp.gate_proj.weight", self.I, self.H)
            add(q + "mlp.up_proj.weight", self.I, self.H)
            add(q + "mlp.down_proj.weight", self.H, self.I)
        if audio_tower:
            d, ff = self.ENC_D, self.ENC_FF
            layer_names = ["audio_encoder.encoders0.0."] + [
                f"audio_encoder.encoders.{i}." for i in range(self.ENC_B - 1)
            ]
            for ln in layer_names:
                in_d = 80 if ln.endswith("encoders0.0.") else d
                add(ln + "norm1.weight", in_d)
                add(ln + "norm1.bias", in_d)
                add(ln + "self_attn.linear_q_k_v.weight", 3 * d, in_d)
                add(ln + "self_attn.linear_q_k_v.bias", 3 * d)
                sd[ln + "self_attn.fsmn_block.weight"] = rng.normal(
                    scale=0.1, size=(d, 1, 11)).astype(np.float32)
                add(ln + "self_attn.linear_out.weight", d, d)
                add(ln + "self_attn.linear_out.bias", d)
                add(ln + "norm2.weight", d)
                add(ln + "norm2.bias", d)
                add(ln + "feed_forward.w_1.weight", ff, d)
                add(ln + "feed_forward.w_1.bias", ff)
                add(ln + "feed_forward.w_2.weight", d, ff)
                add(ln + "feed_forward.w_2.bias", d)
            add("audio_encoder.after_norm.weight", d)
            add("audio_encoder.after_norm.bias", d)
            # adaptor: two strided convs + two linears (torch layouts)
            sd["audio_adaptor.conv1d1.weight"] = rng.normal(
                scale=0.1, size=(d, d, 3)).astype(np.float32)
            add("audio_adaptor.conv1d1.bias", d)
            sd["audio_adaptor.conv1d2.weight"] = rng.normal(
                scale=0.1, size=(d, d, 3)).astype(np.float32)
            add("audio_adaptor.conv1d2.bias", d)
            add("audio_adaptor.linear1.weight", 2 * self.H, d)
            add("audio_adaptor.linear1.bias", 2 * self.H)
            add("audio_adaptor.linear2.weight", self.H, 2 * self.H)
            add("audio_adaptor.linear2.bias", self.H)
        return sd

    def _fab_dir(self, path, audio_tower=True, audio_conf=True,
                 prefix="thinker."):
        import json

        from safetensors.numpy import save_file

        os.makedirs(path, exist_ok=True)
        rng = np.random.default_rng(7)
        sd = self._fab_sd(rng, audio_tower=audio_tower, prefix=prefix)
        save_file(sd, os.path.join(path, "model.safetensors"))
        cfg = {
            "model_type": "qwen3_asr",
            # nested decoder config exercises the sub-config resolution
            "thinker_config": {"text_config": {
                "vocab_size": self.V, "hidden_size": self.H,
                "num_hidden_layers": self.L,
                "num_attention_heads": self.NH,
                "num_key_value_heads": self.NKV, "head_dim": self.HD,
                "intermediate_size": self.I, "tie_word_embeddings": True,
                "eos_token_id": 1, "pad_token_id": 0,
            }},
            "frontend_conf": {"fs": 16000, "lfr_m": 1, "lfr_n": 1},
        }
        if audio_conf:
            cfg["audio_encoder_conf"] = {
                "output_size": self.ENC_D, "attention_heads": 2,
                "linear_units": self.ENC_FF, "num_blocks": self.ENC_B,
                "kernel_size": 11,
            }
            cfg["audio_adaptor_conf"] = {
                "encoder_dim": self.ENC_D, "llm_dim": self.H,
                "ffn_dim": 2 * self.H, "use_low_frame_rate": True,
            }
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(cfg, f)
        return sd

    def test_converter_coverage_and_values(self, tmp_path):
        from fun_asr_vllm_tpu.models.convert import (
            is_qwen3_asr_dir, qwen3_asr_from_pretrained,
        )

        d = str(tmp_path / "qwen3asr")
        sd = self._fab_dir(d)
        assert is_qwen3_asr_dir(d)
        enc, ad, llm, enc_cfg, ad_cfg, llm_cfg = qwen3_asr_from_pretrained(
            d, dtype=jnp.float32)
        # decoder values round-trip (embed verbatim, qkv fused+transposed)
        np.testing.assert_array_equal(
            np.asarray(llm["embed"]), sd["thinker.model.embed_tokens.weight"])
        want_wqkv = np.concatenate([
            sd["thinker.model.layers.0.self_attn.q_proj.weight"].T,
            sd["thinker.model.layers.0.self_attn.k_proj.weight"].T,
            sd["thinker.model.layers.0.self_attn.v_proj.weight"].T,
        ], axis=-1)
        np.testing.assert_allclose(
            np.asarray(llm["layers"]["wqkv"][0]), want_wqkv, rtol=1e-6)
        # audio tower mapped through the funasr SANM converter
        np.testing.assert_allclose(
            np.asarray(enc["layer0"]["w_qkv"]),
            sd["audio_encoder.encoders0.0.self_attn.linear_q_k_v.weight"].T,
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ad["conv1_w"]),
            np.transpose(sd["audio_adaptor.conv1d1.weight"], (2, 1, 0)),
            rtol=1e-6)
        assert llm_cfg.hidden_size == self.H
        assert llm_cfg.num_hidden_layers == self.L
        assert enc_cfg.num_blocks == self.ENC_B
        assert ad_cfg.llm_dim == self.H

    def test_from_pretrained_and_decode(self, tmp_path):
        from fun_asr_vllm_tpu.audio.io import write_wav
        from fun_asr_vllm_tpu.models.nano import FunASRNano

        d = str(tmp_path / "qwen3asr")
        self._fab_dir(d)
        m, kwargs = FunASRNano.from_pretrained(model=d, dtype="float32")
        assert kwargs["model_path"] == d
        wav = (np.sin(np.linspace(0, 300, 8000)) * 0.3).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, wav, 16000)
        results, _meta = m.inference(data_in=[p], max_tokens=4)
        assert isinstance(results[0]["text"], str)

    def test_language_model_prefix_variant(self, tmp_path):
        from fun_asr_vllm_tpu.models.convert import qwen3_asr_from_pretrained

        d = str(tmp_path / "lm_prefix")
        self._fab_dir(d, prefix="language_model.")
        *_, llm_cfg = qwen3_asr_from_pretrained(d, dtype=jnp.float32)
        assert llm_cfg.hidden_size == self.H

    def test_decoder_only_random_audio(self, tmp_path):
        from fun_asr_vllm_tpu.models.nano import FunASRNano

        d = str(tmp_path / "dec_only")
        self._fab_dir(d, audio_tower=False, audio_conf=False)
        m, _ = FunASRNano.from_pretrained(model=d, dtype="float32")
        assert m.llm_cfg.hidden_size == self.H

    def test_unknown_tower_raises_named_seam(self, tmp_path):
        from fun_asr_vllm_tpu.models.convert import qwen3_asr_from_pretrained

        d = str(tmp_path / "odd_tower")
        self._fab_dir(d, audio_tower=True, audio_conf=False)
        with pytest.raises(NotImplementedError, match="SANM"):
            qwen3_asr_from_pretrained(d, dtype=jnp.float32)


class TestQwen3ASRFromPretrainedGuards:
    def test_llm_dir_override_refused(self, tmp_path):
        """A Qwen3-ASR checkpoint bundles its own decoder; llm_dir must
        raise loudly instead of being silently ignored (round-5 review
        finding)."""
        import pytest as _pytest

        from fun_asr_vllm_tpu.models.nano import FunASRNano

        d = str(tmp_path / "qwen3asr")
        TestQwen3ASRConvert()._fab_dir(d)
        with _pytest.raises(ValueError, match="llm_dir"):
            FunASRNano.from_pretrained(model=d, dtype="float32",
                                       llm_dir="/some/other/decoder")
