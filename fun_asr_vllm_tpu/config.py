"""Model-dir config layer (the funasr `config.yaml` shape).

The reference builds FunASRNano from a model dir whose config.yaml carries
`audio_encoder`/`audio_encoder_conf`, `audio_adaptor`/`audio_adaptor_conf`,
`llm_conf`, `frontend_conf` component dicts threaded through the funasr
registry (reference model.py:25-130, SURVEY.md §5 config system). This
module reproduces that shape 1:1 so reference checkpoint configs map
directly, plus helpers to fabricate tiny test model dirs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import yaml


@dataclasses.dataclass
class NanoModelConfig:
    """Parsed config.yaml of a FunASRNano model dir."""

    model: str = "FunASRNano"
    audio_encoder: str = "SANMEncoder"
    audio_encoder_conf: Dict[str, Any] = dataclasses.field(default_factory=dict)
    audio_adaptor: str = "NanoAdaptor"
    audio_adaptor_conf: Dict[str, Any] = dataclasses.field(default_factory=dict)
    llm: str = "Qwen3"
    llm_conf: Dict[str, Any] = dataclasses.field(default_factory=dict)
    frontend: str = "WavFrontend"
    frontend_conf: Dict[str, Any] = dataclasses.field(default_factory=dict)
    input_size: int = 80
    model_dir: str = ""

    @classmethod
    def from_dir(cls, model_dir: str) -> "NanoModelConfig":
        path = os.path.join(model_dir, "config.yaml")
        with open(path, "r", encoding="utf-8") as f:
            raw = yaml.safe_load(f) or {}
        cfg = cls(
            model=raw.get("model", "FunASRNano"),
            audio_encoder=raw.get("audio_encoder", "SANMEncoder"),
            audio_encoder_conf=raw.get("audio_encoder_conf", {}) or {},
            audio_adaptor=raw.get("audio_adaptor", "NanoAdaptor"),
            audio_adaptor_conf=raw.get("audio_adaptor_conf", {}) or {},
            llm=raw.get("llm", "Qwen3"),
            llm_conf=raw.get("llm_conf", {}) or {},
            frontend=raw.get("frontend", "WavFrontend"),
            frontend_conf=raw.get("frontend_conf", {}) or {},
            input_size=raw.get("input_size", 80),
            model_dir=model_dir,
        )
        # resolve relative init_param_path / cmvn_file against the model dir
        ipp = cfg.llm_conf.get("init_param_path")
        if ipp and not os.path.isabs(ipp):
            cfg.llm_conf["init_param_path"] = os.path.join(model_dir, ipp)
        cmvn = cfg.frontend_conf.get("cmvn_file")
        if cmvn and not os.path.isabs(cmvn):
            cfg.frontend_conf["cmvn_file"] = os.path.join(model_dir, cmvn)
        return cfg

    def save(self, model_dir: str) -> None:
        d = dataclasses.asdict(self)
        d.pop("model_dir", None)
        with open(os.path.join(model_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(d, f, allow_unicode=True, sort_keys=False)


# Fun-ASR-Nano-2512-scale defaults: SenseVoice-small-family encoder
# (~220M @ 512×50 blocks) + Qwen3-0.6B decoder. Used when fabricating model
# dirs (tests, benches) and as documentation of the flagship shape.
FLAGSHIP_ENCODER_CONF = dict(
    output_size=512, attention_heads=4, linear_units=2048, num_blocks=50,
    kernel_size=11, freeze=True,
)
FLAGSHIP_ADAPTOR_CONF = dict(
    encoder_dim=512, llm_dim=1024, ffn_dim=2048, use_low_frame_rate=True,
)
FLAGSHIP_FRONTEND_CONF = dict(
    fs=16000, window="hamming", n_mels=80, frame_length=25, frame_shift=10,
    lfr_m=1, lfr_n=1, dither=0.0,
)
