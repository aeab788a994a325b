"""Checkpoint converter golden tests.

A torch mini-reference implements funasr's SANM semantics exactly as
documented in funasr/models/sanm/{encoder,attention}.py (ESPnet lineage:
LayerNorm eps=1e-12, scores scaled by d_k**-0.5, fsmn memory joined AFTER
linear_out, sanm_shift as extra left padding). Random funasr-format
state_dicts are converted with models/convert.py and activations compared
— this pins the key mapping, every transpose, and the layer math before
real Fun-ASR-Nano weights exist (reference model.py:40-67, 112-124).
"""

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
