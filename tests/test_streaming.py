"""Windowed-incremental streaming encoder tests (audio/streaming.py):
exactness within the window, frozen-frame stability across pushes, and
bounded per-push compute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.audio.frontend import WavFrontend
from fun_asr_vllm_tpu.audio.streaming import StreamingEncoder
from fun_asr_vllm_tpu.models import encoder as encoder_mod


@pytest.fixture(scope="module")
def setup():
    cfg = encoder_mod.SANMEncoderConfig(
        input_size=80, output_size=32, attention_heads=4, linear_units=48,
        num_blocks=2, dtype=jnp.float32,
    )
    params = encoder_mod.init_params(cfg, jax.random.PRNGKey(0))
    fe = WavFrontend(dither=0.0, bucket_seconds=0.5)
    return params, cfg, fe


def offline(params, cfg, fe, wav):
    feats, lens = fe.extract([wav])
    out, _ = encoder_mod.encode(params, cfg, feats, lens)
    return np.asarray(out[0, : int(lens[0])])


class TestStreamingEncoder:
    def test_exact_within_window(self, setup):
        """Streams shorter than the window must match offline encoding
        bit-for-bit (same padded-bucket shapes)."""
        params, cfg, fe = setup
        senc = StreamingEncoder(params, cfg, fe, window_s=6.0)
        rng = np.random.default_rng(0)
        wav = rng.normal(scale=0.1, size=32000).astype(np.float32)  # 2 s
        frames = None
        for s in range(0, len(wav), 8000):
            frames = senc.push(wav[s : s + 8000])
        want = offline(params, cfg, fe, wav)
        assert frames.shape == want.shape
        np.testing.assert_allclose(frames, want, atol=1e-5)

    def test_frozen_frames_stable(self, setup):
        """Once a frame leaves the window it never changes again."""
        params, cfg, fe = setup
        senc = StreamingEncoder(params, cfg, fe, window_s=1.0)
        rng = np.random.default_rng(1)
        chunks = [rng.normal(scale=0.1, size=8000).astype(np.float32)
                  for _ in range(8)]  # 4 s total, 1 s window
        history = []
        frozen_counts = []
        for c in chunks:
            history.append(senc.push(c).copy())
            frozen_counts.append(senc._frozen_upto)
        # frames frozen at push i must be identical in every LATER push
        # (live frames may still refine until they freeze)
        final = history[-1]
        assert frozen_counts[-1] > 0
        for h, n_frozen in zip(history, frozen_counts):
            if n_frozen:
                np.testing.assert_allclose(
                    h[:n_frozen], final[:n_frozen], atol=1e-5
                )

    def test_monotonic_growth_and_reset(self, setup):
        params, cfg, fe = setup
        senc = StreamingEncoder(params, cfg, fe, window_s=2.0)
        rng = np.random.default_rng(2)
        n_prev = 0
        for _ in range(5):
            frames = senc.push(
                rng.normal(scale=0.1, size=8000).astype(np.float32)
            )
            assert len(frames) >= n_prev
            n_prev = len(frames)
        assert senc.stream_seconds == pytest.approx(2.5)
        senc.reset()
        assert senc.stream_seconds == 0.0
        assert senc._frozen is None

    def test_bounded_window_compute(self, setup):
        """The live re-encode never sees more than window_s+chunk of
        samples regardless of stream length."""
        params, cfg, fe = setup
        senc = StreamingEncoder(params, cfg, fe, window_s=1.0)
        rng = np.random.default_rng(3)
        seen = []
        orig = senc._encode

        def spy(wav):
            seen.append(len(wav))
            return orig(wav)

        senc._encode = spy
        for _ in range(10):
            senc.push(rng.normal(scale=0.1, size=4000).astype(np.float32))
        assert max(seen) <= senc.window_samples + 4000


class TestStreamingResampler:
    """Incremental resample for non-16 kHz online streams (VERDICT r2
    item 4): emitted output identical to the offline resample, state
    bounded by the filter length (O(new) per push, not O(stream))."""

    @pytest.mark.parametrize("sr_in", [8000, 44100, 48000])
    def test_matches_offline_resample(self, sr_in):
        from fun_asr_vllm_tpu.audio.io import resample
        from fun_asr_vllm_tpu.audio.streaming import StreamingResampler

        rng = np.random.default_rng(0)
        x = rng.normal(size=sr_in * 2).astype(np.float32)
        want = resample(x, sr_in, 16000)
        rs = StreamingResampler(sr_in, 16000)
        outs, i = [], 0
        while i < len(x):
            n = int(rng.integers(80, 3000))
            outs.append(rs.push(x[i : i + n]))
            i += n
        outs.append(rs.flush())
        got = np.concatenate(outs)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_state_bounded_in_stream_length(self):
        from fun_asr_vllm_tpu.audio.streaming import StreamingResampler

        rs = StreamingResampler(8000, 16000)
        rng = np.random.default_rng(1)
        sizes = []
        for _ in range(200):  # ~20 s of 8 kHz audio in 100 ms chunks
            rs.push(rng.normal(size=800).astype(np.float32))
            sizes.append(len(rs._buf))
        # retained input ≤ chunk + filter context, NOT the stream
        assert max(sizes) < 800 + 4 * rs.half_len

    def test_identity_rate_passthrough(self):
        from fun_asr_vllm_tpu.audio.streaming import StreamingResampler

        rs = StreamingResampler(16000, 16000)
        x = np.arange(100, dtype=np.float32)
        np.testing.assert_array_equal(rs.push(x), x)
        assert rs.flush().size == 0


class TestStreamingEndpointer:
    @staticmethod
    def _epd(**kw):
        from fun_asr_vllm_tpu.audio.streaming import StreamingEndpointer

        return StreamingEndpointer(**kw)

    @staticmethod
    def _speech(ms, fs=16000, amp=0.3):
        t = np.arange(int(fs * ms / 1000)) / fs
        return (amp * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

    @staticmethod
    def _sil(ms, fs=16000):
        return np.zeros(int(fs * ms / 1000), np.float32)

    def test_tail_silence_fires(self):
        epd = self._epd(tail_sil_ms=400, max_len_ms=60000)
        assert not epd.push(self._speech(500))
        assert epd.push(self._sil(600))

    def test_silence_only_never_fires(self):
        epd = self._epd(tail_sil_ms=400, max_len_ms=60000)
        assert not epd.push(self._sil(5000))

    def test_pre_speech_silence_does_not_eat_max_len(self):
        """The segment clock starts at the first speech frame: a long
        idle stretch before speech must not trigger the force-cut the
        moment the user starts talking."""
        epd = self._epd(tail_sil_ms=0, max_len_ms=1000)
        assert not epd.push(self._sil(3000))   # 3 s idle > max_len
        assert not epd.push(self._speech(500))  # speech begins — no cut
        assert epd.push(self._speech(600))      # ...until 1 s of speech

    def test_zero_disables_trigger(self):
        epd = self._epd(tail_sil_ms=0, max_len_ms=0)
        assert not epd.push(self._speech(500))
        assert not epd.push(self._sil(5000))

    def test_peak_decays_after_transient(self):
        """One loud transient must not permanently raise the speech
        threshold: after the decay window, quieter speech re-arms the
        endpointer and silence cuts again."""
        epd = self._epd(tail_sil_ms=400, max_len_ms=60000)
        epd.push(self._speech(100, amp=0.9))  # loud pop
        epd.push(self._sil(600))              # fires for segment 1
        epd.reset()
        # ~30 s of quiet lets the peak decay (0.998^3000 ≈ 2e-3)
        epd.push(self._sil(30000))
        assert not epd.push(self._speech(500, amp=0.02))  # quiet speech
        assert epd._seen_speech, "quiet speech not re-armed after decay"
        assert epd.push(self._sil(600))
