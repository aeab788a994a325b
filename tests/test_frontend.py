"""Audio I/O + fbank frontend tests (golden-vector strategy per SURVEY.md §4)."""

import numpy as np
import pytest

from fun_asr_vllm_tpu.audio import (
    WavFrontend,
    extract_fbank,
    fbank_numpy,
    load_audio,
    num_frames,
    read_wav,
    resample,
    write_wav,
)
from fun_asr_vllm_tpu.audio.fbank_ref import apply_lfr, mel_banks


def _tone(seconds=1.0, freq=440.0, fs=16000):
    t = np.arange(int(seconds * fs)) / fs
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestWavIO:
    def test_roundtrip_pcm16(self, tmp_path):
        x = _tone()
        p = tmp_path / "a.wav"
        write_wav(p, x, 16000)
        y, sr = read_wav(p)
        assert sr == 16000
        assert y.shape == x.shape
        assert np.max(np.abs(x - y)) < 1.0 / 32000

    def test_roundtrip_float(self, tmp_path):
        x = _tone()
        p = tmp_path / "f.wav"
        write_wav(p, x, 16000, subtype="FLOAT")
        y, sr = read_wav(p)
        assert np.allclose(x, y)

    def test_stereo(self, tmp_path):
        x = np.stack([_tone(), _tone(freq=880)], axis=1)
        p = tmp_path / "s.wav"
        write_wav(p, x, 16000)
        y, sr = read_wav(p)
        assert y.shape == x.shape

    def test_load_audio_resamples(self, tmp_path):
        x = _tone(fs=8000)
        p = tmp_path / "r8k.wav"
        write_wav(p, x, 8000)
        y = load_audio(str(p), fs=16000)
        assert abs(len(y) - 2 * len(x)) <= 2

    def test_load_audio_array_passthrough(self):
        x = _tone()
        y = load_audio(x)
        assert np.allclose(x, y)

    def test_resample_preserves_tone(self):
        x = _tone(fs=48000, freq=1000)
        y = resample(x, 48000, 16000)
        # dominant FFT bin should stay at 1 kHz
        spec = np.abs(np.fft.rfft(y))
        peak_hz = np.argmax(spec) * 16000 / len(y)
        assert abs(peak_hz - 1000) < 10


class TestFbankRef:
    def test_frame_count_contract(self):
        # speech_length = (dur_ms - 25) // 10 + 1 (reference scp2nanojsonl.py:171)
        for dur_ms in (1000, 2530, 10000):
            n = dur_ms * 16
            assert num_frames(n) == (dur_ms - 25) // 10 + 1

    def test_output_shape(self):
        x = _tone() * 32768.0
        f = fbank_numpy(x)
        assert f.shape == (num_frames(len(x)), 80)

    def test_mel_banks_rows_nonzero(self):
        b = mel_banks()
        assert b.shape == (80, 256)
        assert (b.sum(axis=1) > 0).all()
        assert (b >= 0).all()

    def test_tone_peaks_at_right_mel(self):
        # 440 Hz tone should put max energy in a low mel bin; 4 kHz in a higher
        f_low = fbank_numpy(_tone(freq=440) * 32768).mean(axis=0)
        f_high = fbank_numpy(_tone(freq=4000) * 32768).mean(axis=0)
        assert np.argmax(f_low) < np.argmax(f_high)

    def test_short_audio_zero_frames(self):
        assert fbank_numpy(np.zeros(100, np.float32)).shape == (0, 80)

    def test_lfr(self):
        x = np.arange(10, dtype=np.float32)[:, None].repeat(3, axis=1)
        y = apply_lfr(x, lfr_m=7, lfr_n=6)
        assert y.shape == (2, 21)
        # first output: 3 copies of frame0 (left pad) + frames 0..3
        assert np.allclose(y[0, :3 * 3], 0.0)

    def test_lfr_identity(self):
        x = np.random.default_rng(0).normal(size=(9, 4)).astype(np.float32)
        assert np.allclose(apply_lfr(x, 1, 1), x)


class TestFrontendJax:
    def test_matches_numpy_golden(self):
        rng = np.random.default_rng(42)
        wav = rng.normal(scale=0.1, size=16000).astype(np.float32)
        fe = WavFrontend(dither=0.0)
        feats, lens = fe.extract([wav])
        ref = fe.extract_numpy(wav)
        got = np.asarray(feats)[0, : int(lens[0])]
        assert got.shape == ref.shape
        assert np.max(np.abs(got - ref)) < 2e-2  # f32 jax fft vs f64 numpy fft
        # relative agreement on the active range
        assert np.mean(np.abs(got - ref)) < 2e-3

    def test_batch_lengths(self):
        rng = np.random.default_rng(0)
        wavs = [
            rng.normal(scale=0.1, size=n).astype(np.float32)
            for n in (16000, 8000, 24000)
        ]
        fe = WavFrontend()
        feats, lens = extract_fbank(wavs, frontend=fe)
        assert feats.shape[0] == 3 and feats.shape[2] == 80
        assert [int(x) for x in lens] == [fe.frame_count(n) for n in (16000, 8000, 24000)]
        # each item's valid region matches its solo extraction
        solo, _ = fe.extract([wavs[1]])
        np.testing.assert_allclose(
            np.asarray(feats)[1, : int(lens[1])],
            np.asarray(solo)[0, : int(lens[1])],
            atol=1e-4,
        )

    def test_lfr_jax_matches_ref(self):
        rng = np.random.default_rng(1)
        wav = rng.normal(scale=0.1, size=16000).astype(np.float32)
        fe = WavFrontend(lfr_m=7, lfr_n=6)
        feats, lens = fe.extract([wav])
        ref = fe.extract_numpy(wav)
        got = np.asarray(feats)[0, : int(lens[0])]
        assert got.shape == ref.shape
        assert np.max(np.abs(got - ref)) < 2e-2

    def test_cmvn(self, tmp_path):
        p = tmp_path / "am.mvn"
        d = 80
        add = np.full(d, -1.5)
        scale = np.full(d, 0.5)
        p.write_text(
            "<Nnet>\n<AddShift> %d %d\n<LearnRateCoef> 0 [ %s ]\n"
            "<Rescale> %d %d\n<LearnRateCoef> 0 [ %s ]\n</Nnet>\n"
            % (d, d, " ".join(map(str, add)), d, d, " ".join(map(str, scale)))
        )
        fe = WavFrontend(cmvn_file=str(p))
        fe_raw = WavFrontend()
        wav = _tone()
        a, _ = fe.extract([wav])
        b, _ = fe_raw.extract([wav])
        np.testing.assert_allclose(
            np.asarray(a), (np.asarray(b) - 1.5) * 0.5, atol=1e-5
        )

    def test_frontend_attrs(self):
        fe = WavFrontend()
        # attributes read by the model core (reference model.py:363, 384-385)
        assert fe.fs == 16000 and fe.frame_shift == 10 and fe.lfr_n == 1


class TestTorchFbankCrossCheck:
    """The fbank was previously validated only against its own numpy
    re-derivation (fbank_ref.py) — a self-referential loop. This
    cross-checks both the numpy golden AND the jitted JAX frontend
    against an INDEPENDENT pure-torch derivation of the
    torchaudio.compliance.kaldi fbank (tools/torch_funasr_refs.py
    fbank_torch), the exact surface funasr's WavFrontend wraps
    (reference model.py:372-377)."""

    @pytest.mark.parametrize("window", ["hamming", "povey", "hanning"])
    def test_fbank_numpy_matches_torch(self, window):
        import torch
        from torch_funasr_refs import fbank_torch

        rng = np.random.default_rng(5)
        wav = (rng.integers(-20000, 20000, size=16000 + 37)
               .astype(np.float32))  # already int16 scale
        ref = fbank_torch(torch.from_numpy(wav),
                          window_type=window).numpy()
        got = fbank_numpy(wav, window_type=window, dither=0.0)
        assert got.shape == ref.shape
        # 2e-4 in the log-mel domain: float32 accumulation-order noise
        # between torch matmul and numpy matmul
        assert np.max(np.abs(got - ref)) < 2e-4

    def test_frontend_extract_matches_torch(self):
        """End-to-end WavFrontend.extract (jitted fbank, [-1,1] input,
        x32768 scaling) against the torch derivation, multiple lengths
        in one padded batch."""
        import torch
        from torch_funasr_refs import fbank_torch

        rng = np.random.default_rng(9)
        wavs = [
            (rng.integers(-20000, 20000, size=n).astype(np.float32)
             / 32768.0)
            for n in (7 * 160 + 400, 16000, 16000 + 81)
        ]
        fe = WavFrontend(dither=0.0)
        feats, lens = fe.extract(wavs)
        feats, lens = np.asarray(feats), np.asarray(lens)
        for i, w in enumerate(wavs):
            ref = fbank_torch(torch.from_numpy(w * 32768.0)).numpy()
            assert int(lens[i]) == ref.shape[0]
            assert np.max(np.abs(feats[i, : ref.shape[0]] - ref)) < 1e-3

    def test_frontend_lfr_cmvn_vs_torch_composition(self):
        """LFR + CMVN on top of the torch fbank (composed with the
        numpy apply_lfr/cmvn contract) matches extract() with the real
        Fun-ASR frontend config lfr_m=7, lfr_n=6."""
        import torch
        from torch_funasr_refs import fbank_torch
        from fun_asr_vllm_tpu.audio.fbank_ref import apply_cmvn

        rng = np.random.default_rng(11)
        wav = (rng.integers(-20000, 20000, size=16000).astype(np.float32)
               / 32768.0)
        cmvn_add = rng.normal(size=560).astype(np.float32)
        cmvn_scale = (1.0 + 0.1 * rng.normal(size=560)).astype(np.float32)
        fe = WavFrontend(dither=0.0, lfr_m=7, lfr_n=6)
        fe.cmvn = (cmvn_add, cmvn_scale)
        feats, lens = fe.extract([wav])
        feats = np.asarray(feats)[0, : int(np.asarray(lens)[0])]
        ref = fbank_torch(torch.from_numpy(wav * 32768.0)).numpy()
        ref = apply_cmvn(apply_lfr(ref, 7, 6), cmvn_add, cmvn_scale)
        assert feats.shape == ref.shape
        assert np.max(np.abs(feats - ref)) < 1e-3
