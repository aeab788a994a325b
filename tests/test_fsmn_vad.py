"""FSMN-VAD tests: torch mini-reference of funasr's FSMN scoring network
(conversion + activation parity on a synthetic funasr-format state dict),
plus the segmenting contract (reference simple_audio_processor.py:158-257).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from fun_asr_vllm_tpu.data.fsmn_vad import (  # noqa: E402
    FSMNVad,
    FSMNVadConfig,
    forward,
    from_funasr_sd,
    init_params,
)


class AffineRef(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.linear = nn.Linear(i, o)

    def forward(self, x):
        return self.linear(x)


class LinearRef(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.linear = nn.Linear(i, o, bias=False)

    def forward(self, x):
        return self.linear(x)


class FsmnBlockRef(nn.Module):
    """funasr Fsmn: depthwise causal conv over time + residual."""

    def __init__(self, dim, lorder):
        super().__init__()
        self.conv_left = nn.Conv2d(dim, dim, (lorder, 1), groups=dim,
                                   bias=False)
        self.lorder = lorder

    def forward(self, x):  # [B, T, D]
        xp = x.unsqueeze(1).permute(0, 3, 2, 1)  # [B, D, T, 1]
        y = nn.functional.pad(xp, (0, 0, self.lorder - 1, 0))
        out = xp + self.conv_left(y)
        return out.permute(0, 3, 2, 1).squeeze(1)


class FSMNRef(nn.Module):
    """funasr FSMN with the checkpoint's module naming."""

    def __init__(self, cfg: FSMNVadConfig):
        super().__init__()
        self.in_linear1 = AffineRef(cfg.input_dim, cfg.input_affine_dim)
        self.in_linear2 = AffineRef(cfg.input_affine_dim, cfg.linear_dim)
        self.fsmn = nn.ModuleList([
            nn.Sequential(
                LinearRef(cfg.linear_dim, cfg.proj_dim),
                FsmnBlockRef(cfg.proj_dim, cfg.lorder),
                AffineRef(cfg.proj_dim, cfg.linear_dim),
                nn.ReLU(),
            )
            for _ in range(cfg.fsmn_layers)
        ])
        self.out_linear1 = AffineRef(cfg.linear_dim, cfg.output_affine_dim)
        self.out_linear2 = AffineRef(cfg.output_affine_dim, cfg.output_dim)

    def forward(self, x):
        x = torch.relu(self.in_linear2(self.in_linear1(x)))
        for blk in self.fsmn:
            x = blk(x)
        x = self.out_linear2(self.out_linear1(x))
        return torch.softmax(x, dim=-1)


SMALL = FSMNVadConfig(
    input_dim=40, input_affine_dim=16, fsmn_layers=2, linear_dim=24,
    proj_dim=12, lorder=5, output_affine_dim=16, output_dim=8,
)


class TestConversionParity:
    def test_activations_match_torch_reference(self):
        torch.manual_seed(0)
        ref = FSMNRef(SMALL)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = from_funasr_sd(sd, SMALL)
        x = np.random.default_rng(1).normal(
            size=(1, 30, SMALL.input_dim)
        ).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = np.asarray(forward(params, SMALL, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_encoder_prefix(self):
        torch.manual_seed(0)
        ref = FSMNRef(SMALL)
        sd = {"encoder." + k: v.detach().numpy()
              for k, v in ref.state_dict().items()}
        params = from_funasr_sd(sd, SMALL)
        assert params["in1_w"].shape == (SMALL.input_dim,
                                         SMALL.input_affine_dim)

    def test_missing_keys_raise(self):
        with pytest.raises(KeyError, match="available"):
            from_funasr_sd({"x.weight": np.zeros(1)}, SMALL)


class TestSegmentContract:
    def _vad(self):
        # random weights; force the probability path through a stub so the
        # contract logic is tested deterministically
        vad = FSMNVad(config=FSMNVadConfig())
        return vad

    def test_segments_shape_and_caps(self):
        vad = self._vad()
        frames = 5000  # 50 s
        probs = np.zeros(frames, np.float32)
        probs[100:600] = 1.0      # 5 s speech
        probs[700:4500] = 1.0     # 38 s speech → must be force-cut at 30 s
        vad.frame_speech_probs = lambda wav: probs
        segs = vad.segments(np.zeros(frames * 160, np.float32))
        # force-cut bound (+ pad_ms each side + the inclusive cut frame,
        # as in EnergyVAD)
        cap = (vad.cfg.max_single_segment_ms + 2 * vad.cfg.pad_ms
               + vad.cfg.frame_ms)
        assert all(e - s <= cap for s, e in segs)
        assert len(segs) >= 3
        total_speech = sum(e - s for s, e in segs)
        assert total_speech >= 41000  # covers both speech spans

    def test_silence_cut(self):
        vad = self._vad()
        probs = np.zeros(400, np.float32)
        probs[10:100] = 1.0
        probs[250:350] = 1.0  # 1.5 s gap > 800 ms → two segments
        vad.frame_speech_probs = lambda wav: probs
        segs = vad.segments(np.zeros(400 * 160, np.float32))
        assert len(segs) == 2

    def test_detect_segments_dict_shape(self):
        vad = self._vad()
        probs = np.zeros(300, np.float32)
        probs[50:150] = 1.0
        vad.frame_speech_probs = lambda wav: probs
        out = vad.detect_segments(np.zeros(300 * 160, np.float32))
        assert out and set(out[0]) == {
            "segment_id", "start_time", "end_time", "duration"
        }

    def test_forward_runs_on_real_audio(self):
        """End-to-end with the real frontend + random weights: valid
        probabilities out."""
        vad = FSMNVad(config=FSMNVadConfig())
        wav = np.random.default_rng(0).normal(
            scale=0.05, size=16000
        ).astype(np.float32)
        probs = vad.frame_speech_probs(wav)
        assert probs.shape[0] > 90
        assert np.all(probs >= 0) and np.all(probs <= 1)

    def test_make_vad_fallback(self, tmp_path):
        from fun_asr_vllm_tpu.data.fsmn_vad import make_vad
        from fun_asr_vllm_tpu.data.vad import EnergyVAD

        assert isinstance(make_vad(None), EnergyVAD)
        assert isinstance(make_vad(str(tmp_path / "nope")), EnergyVAD)

class TestVADModelWrapper:
    """Reference VADModelWrapper parity (simple_audio_processor.py:158-257)."""

    def test_fireredvad_without_lib_raises(self):
        from fun_asr_vllm_tpu.data.fsmn_vad import VADModelWrapper

        with pytest.raises(ImportError):
            VADModelWrapper("fireredvad")

    def test_fireredvad_fallback_uses_firered_params(self):
        from fun_asr_vllm_tpu.data.fsmn_vad import FSMNVad, VADModelWrapper

        w = VADModelWrapper("fireredvad", fallback=True)
        assert w.model_type == "fsmnvad"
        assert isinstance(w.model, FSMNVad)
        # FireRedVadConfig defaults mapped frames→ms (reference :175-186)
        assert w.model.cfg.speech_threshold == 0.4
        assert w.model.cfg.smooth_window_size == 5
        assert w.model.cfg.max_single_segment_ms == 20000

    def test_default_routes_to_energy_vad(self):
        from fun_asr_vllm_tpu.data.fsmn_vad import VADModelWrapper
        from fun_asr_vllm_tpu.data.vad import EnergyVAD

        w = VADModelWrapper("fsmn-vad")
        assert isinstance(w.model, EnergyVAD)
        wav = np.zeros(16000, np.float32)
        out = w.detect_segments(wav)
        assert isinstance(out, list)

    def test_firered_config_mapping(self):
        from fun_asr_vllm_tpu.data.fsmn_vad import firered_config

        cfg = firered_config(min_speech_frame=30, speech_threshold=0.6)
        assert cfg.min_speech_ms == 300
        assert cfg.speech_threshold == 0.6
