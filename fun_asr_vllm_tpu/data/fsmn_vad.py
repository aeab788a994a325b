"""FSMN-VAD: funasr's fsmn-vad scoring network in functional JAX.

The reference's data factory segments device audio with funasr's
`fsmn-vad` model (reference simple_audio_processor.py:158-257,
`max_end_silence_time=800, max_single_segment_time=30000`). This module
implements the FSMN inference graph faithfully (weights-pluggable from
the funasr checkpoint key space) plus the segmenting decision logic with
the same contract as `data/vad.py`.

funasr FSMN architecture (funasr/models/fsmn_vad_streaming/encoder.py):

    in_linear1: Affine(input_dim=400 → 140)         # 80 mel × LFR m=5
    in_linear2: Affine(140 → linear_dim=250)
    relu
    fsmn × 4:  Linear(250 → proj=128, no bias)
               FsmnBlock: depthwise causal conv over time, lorder=20
                          left taps (stride 1), residual add
               Affine(128 → 250) + relu
    out_linear1: Affine(250 → 140)
    out_linear2: Affine(140 → output_dim=248)
    softmax → frame posteriors; sil prob = posterior[..., sil_pdf_ids].sum,
    speech prob = 1 - sil.

Checkpoint keys: `in_linear1.linear.{weight,bias}`,
`fsmn.{i}.0.linear.weight`, `fsmn.{i}.1.conv_left.weight` (depthwise
[P, 1, lorder, 1]), `fsmn.{i}.2.linear.{weight,bias}`,
`out_linear{1,2}.linear.{weight,bias}` — optionally under an `encoder.`
prefix in the full funasr VAD model.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, List, Mapping, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class FSMNVadConfig:
    input_dim: int = 400          # 80 mel × LFR m=5
    input_affine_dim: int = 140
    fsmn_layers: int = 4
    linear_dim: int = 250
    proj_dim: int = 128
    lorder: int = 20
    rorder: int = 0
    output_affine_dim: int = 140
    output_dim: int = 248
    sil_pdf_ids: Tuple[int, ...] = (0,)
    # decision logic (FireRedVadConfig-compatible fields, reference
    # simple_audio_processor.py:175-186)
    speech_threshold: float = 0.5
    smooth_window_size: int = 1   # moving-average over frame probs
    frame_ms: int = 10
    min_speech_ms: int = 100
    max_end_silence_ms: int = 800
    max_single_segment_ms: int = 30000
    pad_ms: int = 100


def init_params(cfg: FSMNVadConfig, key) -> Dict:
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 4 + 3 * cfg.fsmn_layers)

    def w(k, shape, fan_in):
        return jax.random.normal(k, shape, jnp.float32) * fan_in ** -0.5

    params = {
        "in1_w": w(ks[0], (cfg.input_dim, cfg.input_affine_dim), cfg.input_dim),
        "in1_b": jnp.zeros((cfg.input_affine_dim,), jnp.float32),
        "in2_w": w(ks[1], (cfg.input_affine_dim, cfg.linear_dim),
                   cfg.input_affine_dim),
        "in2_b": jnp.zeros((cfg.linear_dim,), jnp.float32),
        "out1_w": w(ks[2], (cfg.linear_dim, cfg.output_affine_dim),
                    cfg.linear_dim),
        "out1_b": jnp.zeros((cfg.output_affine_dim,), jnp.float32),
        "out2_w": w(ks[3], (cfg.output_affine_dim, cfg.output_dim),
                    cfg.output_affine_dim),
        "out2_b": jnp.zeros((cfg.output_dim,), jnp.float32),
        "blocks": [],
    }
    blocks = []
    for i in range(cfg.fsmn_layers):
        k0, k1, k2 = ks[4 + 3 * i : 7 + 3 * i]
        blocks.append({
            "proj_w": w(k0, (cfg.linear_dim, cfg.proj_dim), cfg.linear_dim),
            "conv_left": w(k1, (cfg.lorder, cfg.proj_dim), cfg.lorder),
            "affine_w": w(k2, (cfg.proj_dim, cfg.linear_dim), cfg.proj_dim),
            "affine_b": jnp.zeros((cfg.linear_dim,), jnp.float32),
        })
    params["blocks"] = blocks
    return params


def _fsmn_block(bp: Dict, cfg: FSMNVadConfig, x):
    """Linear → depthwise causal conv (lorder left taps, residual) →
    Affine → relu (funasr BasicBlock)."""
    import jax
    import jax.numpy as jnp

    p = x @ bp["proj_w"]  # [B, T, P] (no bias)
    # causal depthwise conv: lorder taps ending at t (left pad lorder-1)
    k = bp["conv_left"].shape[0]
    out = jax.lax.conv_general_dilated(
        p,
        bp["conv_left"][:, None, :],  # [K, 1, P] (W, I/g, O)
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=p.shape[-1],
    )
    mem = p + out
    return jax.nn.relu(mem @ bp["affine_w"] + bp["affine_b"])


def forward(params: Dict, cfg: FSMNVadConfig, feats):
    """[B, T, input_dim] LFR+CMVN features → frame posteriors
    [B, T, output_dim] (softmax applied, funasr FSMN.forward)."""
    import jax
    import jax.numpy as jnp

    x = feats @ params["in1_w"] + params["in1_b"]
    x = x @ params["in2_w"] + params["in2_b"]
    x = jax.nn.relu(x)
    for bp in params["blocks"]:
        x = _fsmn_block(bp, cfg, x)
    x = x @ params["out1_w"] + params["out1_b"]
    x = x @ params["out2_w"] + params["out2_b"]
    return jax.nn.softmax(x, axis=-1)


def speech_probs(params: Dict, cfg: FSMNVadConfig, feats) -> np.ndarray:
    """[T] speech probability per 10 ms frame (1 - sil posterior)."""
    post = np.asarray(forward(params, cfg, feats))
    sil = post[..., list(cfg.sil_pdf_ids)].sum(-1)
    return 1.0 - sil[0]


def from_funasr_sd(sd: Mapping[str, np.ndarray], cfg: FSMNVadConfig,
                   prefix: str = "") -> Dict:
    """funasr fsmn-vad state_dict → param tree (torch Linear [out, in] →
    [in, out]; depthwise Conv2d [P, 1, K, 1] → [K, P])."""
    import jax.numpy as jnp

    for pfx in (prefix, prefix + "encoder."):
        if pfx + "in_linear1.linear.weight" in sd:
            p = pfx
            break
    else:
        avail = sorted(sd)[:20]
        raise KeyError(f"no FSMN keys under {prefix!r}; available: {avail}")

    def lin(name):
        return jnp.asarray(sd[p + name + ".linear.weight"]).T, jnp.asarray(
            sd[p + name + ".linear.bias"]
        )

    in1_w, in1_b = lin("in_linear1")
    in2_w, in2_b = lin("in_linear2")
    out1_w, out1_b = lin("out_linear1")
    out2_w, out2_b = lin("out_linear2")
    blocks = []
    for i in range(cfg.fsmn_layers):
        conv = np.asarray(sd[p + f"fsmn.{i}.1.conv_left.weight"])
        blocks.append({
            "proj_w": jnp.asarray(sd[p + f"fsmn.{i}.0.linear.weight"]).T,
            "conv_left": jnp.asarray(conv[:, 0, :, 0].T),  # [P,1,K,1]→[K,P]
            "affine_w": jnp.asarray(sd[p + f"fsmn.{i}.2.linear.weight"]).T,
            "affine_b": jnp.asarray(sd[p + f"fsmn.{i}.2.linear.bias"]),
        })
    return {
        "in1_w": in1_w, "in1_b": in1_b, "in2_w": in2_w, "in2_b": in2_b,
        "out1_w": out1_w, "out1_b": out1_b, "out2_w": out2_w,
        "out2_b": out2_b, "blocks": blocks,
    }


class FSMNVad:
    """Model-based VAD with the `segments()`/`cut()` contract of
    `data.vad.EnergyVAD` (reference VADModelWrapper.detect_segments,
    simple_audio_processor.py:200-257)."""

    def __init__(
        self,
        model_dir: Optional[str] = None,
        config: Optional[FSMNVadConfig] = None,
        params: Optional[Dict] = None,
        fs: int = 16000,
    ) -> None:
        self.cfg = config or FSMNVadConfig()
        self.fs = fs
        from ..audio.frontend import WavFrontend

        cmvn_file = None
        if model_dir:
            mvn = os.path.join(model_dir, "am.mvn")
            cmvn_file = mvn if os.path.exists(mvn) else None
        self.frontend = WavFrontend(
            fs=fs, n_mels=80, lfr_m=5, lfr_n=1, dither=0.0,
            cmvn_file=cmvn_file,
        )
        if params is not None:
            self.params = params
        elif model_dir:
            from ..models.convert import load_state_dict

            self.params = from_funasr_sd(load_state_dict(model_dir), self.cfg)
        else:
            import jax

            self.params = init_params(self.cfg, jax.random.PRNGKey(0))

    def frame_speech_probs(self, wav: np.ndarray) -> np.ndarray:
        feats, _ = self.frontend.extract([np.asarray(wav, np.float32)])
        return speech_probs(self.params, self.cfg, feats)

    def segments(self, wav: np.ndarray) -> List[Tuple[int, int]]:
        """[(start_ms, end_ms)] with the reference contract: cut after
        max_end_silence_ms of silence, force-cut at
        max_single_segment_ms, drop < min_speech_ms."""
        cfg = self.cfg
        if len(wav) < self.fs * 25 // 1000:
            return []
        probs = self.frame_speech_probs(wav)
        if cfg.smooth_window_size > 1:
            k = cfg.smooth_window_size
            kernel = np.ones(k, np.float32) / k
            probs = np.convolve(probs, kernel, mode="same")
        active = probs > cfg.speech_threshold
        out: List[Tuple[int, int]] = []
        start = None
        silence = 0
        max_sil = cfg.max_end_silence_ms // cfg.frame_ms
        max_len = cfg.max_single_segment_ms // cfg.frame_ms
        for i, a in enumerate(active):
            if a:
                if start is None:
                    start = i
                silence = 0
            elif start is not None:
                silence += 1
                if silence >= max_sil:
                    out.append((start, i - silence + 1))
                    start, silence = None, 0
                    continue
            if start is not None and i - start >= max_len:
                out.append((start, i + 1))
                start, silence = None, 0
        if start is not None:
            out.append((start, len(active)))
        min_frames = cfg.min_speech_ms // cfg.frame_ms
        pad = cfg.pad_ms // cfg.frame_ms
        total = len(active)
        res = []
        for s, e in out:
            if e - s < min_frames:
                continue
            res.append((max(0, s - pad) * cfg.frame_ms,
                        min(total, e + pad) * cfg.frame_ms))
        merged: List[Tuple[int, int]] = []
        for s, e in res:
            if (merged and s <= merged[-1][1]
                    and max(e, merged[-1][1]) - merged[-1][0]
                    <= cfg.max_single_segment_ms):
                merged[-1] = (merged[-1][0], max(e, merged[-1][1]))
            else:
                merged.append((s, e))
        return merged

    def cut(self, wav: np.ndarray) -> List[np.ndarray]:
        return [wav[s * self.fs // 1000 : e * self.fs // 1000]
                for s, e in self.segments(wav)]

    def detect_segments(self, wav: np.ndarray) -> List[Dict]:
        """Reference VADModelWrapper.detect_segments dict shape
        (simple_audio_processor.py:240-257)."""
        return [
            {"segment_id": i, "start_time": s, "end_time": e,
             "duration": e - s}
            for i, (s, e) in enumerate(self.segments(wav))
        ]


#: FireRedVadConfig field defaults the reference passes
#: (simple_audio_processor.py:175-186); frame-count fields are 10 ms
#: frames. Mapped onto FSMNVadConfig's ms fields by `firered_config`.
FIRERED_VAD_DEFAULTS = dict(
    smooth_window_size=5,
    speech_threshold=0.4,
    min_speech_frame=20,
    max_speech_frame=2000,
    min_silence_frame=20,
    merge_silence_frame=0,
    extend_speech_frame=0,
    chunk_max_frame=30000,
)


def firered_config(**overrides) -> FSMNVadConfig:
    """FSMNVadConfig carrying the reference's FireRedVadConfig decision
    parameters (simple_audio_processor.py:175-186), frame counts
    converted to ms at the 10 ms frame rate."""
    c = dict(FIRERED_VAD_DEFAULTS, **overrides)
    return FSMNVadConfig(
        speech_threshold=c["speech_threshold"],
        smooth_window_size=c["smooth_window_size"],
        min_speech_ms=c["min_speech_frame"] * 10,
        max_single_segment_ms=c["max_speech_frame"] * 10,
        max_end_silence_ms=c["min_silence_frame"] * 10,
        pad_ms=c["extend_speech_frame"] * 10,
    )


class VADModelWrapper:
    """Reference VADModelWrapper parity (simple_audio_processor.py:158-257):
    route by model name — "fireredvad" prefers the external FireRedASR2S
    library exactly as the reference does (and raises ImportError when it
    is missing, same as reference :171-172, unless `fallback=True` routes
    to the in-repo FSMN graph with FireRed decision params); anything
    else is fsmn-vad (our JAX graph, weights-pluggable)."""

    def __init__(self, model_name: str = "fsmn-vad",
                 model_dir: Optional[str] = None, fallback: bool = False,
                 fs: int = 16000):
        self.model_name = model_name
        if model_name.lower() == "fireredvad":
            try:
                from fireredasr2s.fireredvad import (  # external, optional
                    FireRedVad, FireRedVadConfig,
                )
                self.model = FireRedVad.from_pretrained(
                    model_dir or
                    "FireRedASR2S/pretrained_models/FireRedVAD/VAD",
                    FireRedVadConfig(use_gpu=False, **FIRERED_VAD_DEFAULTS),
                )
                self.model_type = "fireredvad"
                return
            except ImportError:
                if not fallback:
                    raise ImportError(
                        "FireRedVad unavailable: install FireRedASR2S, or "
                        "pass fallback=True to use the in-repo FSMN-VAD "
                        "with FireRedVadConfig decision parameters"
                    )
                self.model = FSMNVad(model_dir=model_dir,
                                     config=firered_config(), fs=fs)
                self.model_type = "fsmnvad"
                return
        self.model = make_vad(model_dir, fs=fs)
        self.model_type = "fsmnvad"

    def detect_segments(self, wav: np.ndarray) -> List[Dict]:
        if self.model_type == "fireredvad":
            result, _probs = self.model.detect(wav)
            return [
                {"segment_id": i, "start_time": s * 1000,
                 "end_time": e * 1000, "duration": (e - s) * 1000}
                for i, (s, e) in enumerate(result.get("timestamps", []))
            ]
        return self.model.detect_segments(wav)


def make_vad(model_dir: Optional[str] = None, model_name: str = "auto",
             **kw):
    """VAD factory: FSMN weights when a model dir exists, energy VAD
    otherwise (the reference's fsmn-vad / FireRedVAD selection seam)."""
    if model_dir and os.path.isdir(model_dir):
        return FSMNVad(model_dir=model_dir, **kw)
    from .vad import EnergyVAD

    return EnergyVAD(**kw)
