"""Checkpoint serialization + config.yaml round-trip tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from fun_asr_vllm_tpu.config import NanoModelConfig
from fun_asr_vllm_tpu.utils.serialization import (
    cast_tree,
    flatten_tree,
    load_params,
    save_params,
    unflatten_tree,
)


class TestSerialization:
    def test_flatten_roundtrip(self):
        tree = {"a": {"b": np.ones((2, 2)), "c": np.zeros(3)}, "d": np.arange(4)}
        flat = flatten_tree(tree)
        assert set(flat) == {"a/b", "a/c", "d"}
        back = unflatten_tree(flat)
        np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])

    def test_save_load(self, tmp_path):
        tree = {
            "layers": {"wq": np.random.default_rng(0).normal(size=(2, 4, 4))
                       .astype(np.float32)},
            "embed": np.ones((8, 4), np.float32),
        }
        p = tmp_path / "m.safetensors"
        save_params(str(p), tree)
        back = load_params(str(p), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(back["layers"]["wq"]), tree["layers"]["wq"]
        )

    def test_cast_tree_keeps_norms_f32(self):
        tree = {"wq": np.ones(4, np.float32),
                "input_ln": np.ones(4, np.float32),
                "q_norm": np.ones(4, np.float32)}
        out = cast_tree(tree, jnp.bfloat16)
        assert out["wq"].dtype == jnp.bfloat16
        assert out["input_ln"].dtype == jnp.float32
        assert out["q_norm"].dtype == jnp.float32


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = NanoModelConfig(
            audio_encoder="SANMEncoder",
            audio_encoder_conf={"output_size": 512, "num_blocks": 50},
            audio_adaptor_conf={"llm_dim": 1024, "use_low_frame_rate": True},
            llm_conf={"init_param_path": "llm"},
            frontend_conf={"fs": 16000, "cmvn_file": None},
            input_size=80,
        )
        cfg.save(str(tmp_path))
        back = NanoModelConfig.from_dir(str(tmp_path))
        assert back.audio_encoder_conf["num_blocks"] == 50
        assert back.audio_adaptor_conf["use_low_frame_rate"] is True
        # relative init_param_path resolved against the model dir
        assert back.llm_conf["init_param_path"].endswith("/llm")
        assert back.input_size == 80
