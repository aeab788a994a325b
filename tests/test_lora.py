"""LoRA merge tests (reference model.py:83-102 PEFT path, merged at load)."""

import numpy as np
import pytest

from fun_asr_vllm_tpu.models.convert import merge_lora


class TestMergeLora:
    def test_basic_merge(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(8, 8)).astype(np.float32)
        a = rng.normal(size=(2, 8)).astype(np.float32)  # [r, in]
        b = rng.normal(size=(8, 2)).astype(np.float32)  # [out, r]
        sd = {"model.layers.0.self_attn.q_proj.weight": w.copy()}
        lora = {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
        }
        out = merge_lora(sd, lora, scaling=0.5)
        np.testing.assert_allclose(
            out["model.layers.0.self_attn.q_proj.weight"], w + 0.5 * (b @ a),
            rtol=1e-6,
        )

    def test_default_adapter_segment(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(4, 4)).astype(np.float32)
        a = rng.normal(size=(1, 4)).astype(np.float32)
        b = rng.normal(size=(4, 1)).astype(np.float32)
        sd = {"model.layers.0.mlp.gate_proj.weight": w.copy()}
        lora = {
            "base_model.model.model.layers.0.mlp.gate_proj.lora_A.default.weight": a,
            "base_model.model.model.layers.0.mlp.gate_proj.lora_B.default.weight": b,
        }
        out = merge_lora(sd, lora, alpha=2.0)  # scaling = alpha/r = 2
        np.testing.assert_allclose(
            out["model.layers.0.mlp.gate_proj.weight"], w + 2.0 * (b @ a),
            rtol=1e-6,
        )

    def test_missing_target_raises(self):
        lora = {
            "base_model.model.nope.lora_A.weight": np.ones((1, 4), np.float32),
            "base_model.model.nope.lora_B.weight": np.ones((4, 1), np.float32),
        }
        with pytest.raises(KeyError):
            merge_lora({}, lora)

    def test_lora_changes_model_logits(self):
        """End-to-end: merged LoRA must change converted-model logits."""
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from transformers import Qwen3Config as HFConfig
        from transformers.models.qwen3 import Qwen3ForCausalLM

        from fun_asr_vllm_tpu.models.convert import qwen3_from_state_dict
        from fun_asr_vllm_tpu.models.qwen3 import Qwen3Config, forward_logits

        hf_cfg = HFConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            intermediate_size=48, tie_word_embeddings=True,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = Qwen3ForCausalLM(hf_cfg)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        cfg = Qwen3Config(
            vocab_size=64, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            intermediate_size=48, tie_word_embeddings=True, dtype=jnp.float32,
        )
        rng = np.random.default_rng(2)
        lora = {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
                rng.normal(size=(2, 32)).astype(np.float32),
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
                rng.normal(size=(32, 2)).astype(np.float32),
        }
        base = qwen3_from_state_dict(sd, cfg)
        tuned = qwen3_from_state_dict(merge_lora(sd, lora, scaling=0.1), cfg)
        ids = jnp.asarray([[1, 2, 3]])
        l0 = np.asarray(forward_logits(base, cfg, ids))
        l1 = np.asarray(forward_logits(tuned, cfg, ids))
        assert not np.allclose(l0, l1)
