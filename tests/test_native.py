"""C++ native runtime tests (csrc/native.cpp via ctypes)."""

import numpy as np
import pytest

from fun_asr_vllm_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeAlign:
    def test_matches_python_dp(self, lib):
        from fun_asr_vllm_tpu.text.wer import _edit_align

        rng = np.random.default_rng(0)
        for _ in range(20):
            n, m = rng.integers(0, 40, size=2)
            ref = [str(x) for x in rng.integers(0, 10, size=n)]
            hyp = [str(x) for x in rng.integers(0, 10, size=m)]
            py_ops = _edit_align(ref, hyp)
            ids = {}
            ref_ids = [ids.setdefault(t, len(ids)) for t in ref]
            hyp_ids = [ids.setdefault(t, len(ids)) for t in hyp]
            c_ops = native.align_ops_native(ref_ids, hyp_ids)
            # distance (op-cost sum) must be identical; alignment path may
            # differ only at equal-cost ties
            cost = lambda ops: sum(1 for o in ops if o != 0)
            assert cost(c_ops) == cost(py_ops), (ref, hyp)
            assert len(c_ops) == len(py_ops)

    def test_long_pair_routes_native(self, lib):
        from fun_asr_vllm_tpu.text.wer import compute_wer_line

        ref = "你好世界" * 40
        hyp = "你好世间" * 40
        r = compute_wer_line(ref, hyp)
        assert r["stats"]["all"] == 160
        assert r["stats"]["sub"] == 40


class TestNativeAudio:
    def test_pcm16_roundtrip(self, lib):
        pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
        f = native.pcm16_to_float(pcm)
        assert f.dtype == np.float32
        assert abs(f[0] + 1.0) < 1e-6 and abs(f[-1] - 32767 / 32768) < 1e-6

    def test_nlms_cancels_echo(self, lib):
        """mic = speech + echo(ref); NLMS should strip most of the echo."""
        rng = np.random.default_rng(0)
        n = 16000
        ref = rng.normal(size=n).astype(np.float32)
        echo = np.convolve(ref, np.array([0.6, 0.3, 0.1], np.float32))[:n]
        speech = 0.05 * np.sin(2 * np.pi * 5 * np.arange(n) / 16000).astype(
            np.float32
        )
        mic = speech + echo
        out = native.nlms_echo_cancel(mic, ref, taps=16, mu=0.5)
        # residual echo energy in the steady state must drop well below input
        before = float(np.mean(mic[8000:] ** 2))
        after = float(np.mean((out[8000:] - speech[8000:]) ** 2))
        assert after < before * 0.05


def _wav_bytes(fmt_code, bits, channels, rate, payload, extensible=False):
    import io
    import struct

    out = io.BytesIO()
    if extensible:
        guid = (struct.pack("<H", fmt_code) + b"\x00\x00"
                + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")
        fmt = struct.pack("<HHIIHH", 0xFFFE, channels, rate,
                          rate * channels * bits // 8,
                          channels * bits // 8, bits)
        fmt += struct.pack("<HHI", 22, bits, 0x3) + guid
    else:
        fmt = struct.pack("<HHIIHH", fmt_code, channels, rate,
                          rate * channels * bits // 8,
                          channels * bits // 8, bits)
    out.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
              + b"WAVE")
    out.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    out.write(b"data" + struct.pack("<I", len(payload)) + payload)
    return out.getvalue()


class TestNativeWavDecode:
    """The C++ container parse + PCM decode must be bit-identical to the
    python parser in audio/io.py (the behavioural reference)."""

    def _parity(self, buf, monkeypatch):
        import fun_asr_vllm_tpu.audio.io as aio

        a, ra = aio.read_wav(buf)
        monkeypatch.setattr(native, "wav_read_native", lambda b: None)
        b, rb = aio.read_wav(buf)
        assert ra == rb and a.shape == b.shape
        assert np.array_equal(a, b)
        return a, ra

    def test_all_formats(self, lib, monkeypatch):
        rng = np.random.default_rng(1)
        n = 777
        f = (rng.normal(size=n) * 0.3).clip(-1, 1).astype(np.float32)
        cases = [
            _wav_bytes(1, 16, 1, 16000, (f * 32767).astype("<i2").tobytes()),
            _wav_bytes(1, 16, 2, 44100,
                       (rng.normal(size=2 * n).clip(-1, 1) * 20000)
                       .astype("<i2").tobytes()),
            _wav_bytes(1, 8, 1, 8000,
                       ((f * 127) + 128).astype(np.uint8).tobytes()),
            _wav_bytes(1, 32, 1, 48000,
                       (f * 2**31 * 0.9).astype("<i4").tobytes()),
            _wav_bytes(3, 32, 1, 16000, f.astype("<f4").tobytes()),
            _wav_bytes(3, 64, 1, 16000, f.astype("<f8").tobytes()),
            _wav_bytes(1, 16, 4, 16000,
                       (rng.normal(size=4 * n).clip(-1, 1) * 20000)
                       .astype("<i2").tobytes(), extensible=True),
        ]
        v24 = (f * (2**23 - 1)).astype(np.int32)
        b24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in v24)
        cases.append(_wav_bytes(1, 24, 1, 16000, b24))
        for buf in cases:
            self._parity(buf, monkeypatch)

    def test_extra_chunk_and_rf64(self, lib, monkeypatch, tmp_path):
        import struct

        import fun_asr_vllm_tpu.audio.io as aio

        rng = np.random.default_rng(2)
        f = (rng.normal(size=501) * 0.3).clip(-1, 1).astype(np.float32)
        base = _wav_bytes(1, 16, 1, 16000, (f * 32767).astype("<i2").tobytes())
        # odd-size LIST chunk before fmt/data exercises chunk padding
        body = b"LIST" + struct.pack("<I", 3) + b"abc\x00" + base[12:]
        odd = b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body
        self._parity(odd, monkeypatch)

        p = tmp_path / "rf64.wav"
        with aio.StreamingWavWriter(p, 16000, 4, force_rf64=True) as w:
            w.write(rng.normal(size=(500, 4)).clip(-1, 1).astype(np.float32))
            w.write(rng.normal(size=(300, 4)).clip(-1, 1).astype(np.float32))
        a, _ = self._parity(p.read_bytes(), monkeypatch)
        assert a.shape == (800, 4)

    def test_malformed_raises_same_error(self, lib):
        import fun_asr_vllm_tpu.audio.io as aio

        with pytest.raises(ValueError, match="RIFF"):
            aio.read_wav(b"NOTAWAVEFILE")


class TestNativeResample:
    def test_matches_scipy_bitexact(self, lib):
        from scipy.signal import resample_poly

        rng = np.random.default_rng(3)
        for (si, so) in [(8000, 16000), (44100, 16000), (22050, 16000),
                         (48000, 16000), (16000, 8000), (11025, 16000)]:
            from math import gcd

            g = gcd(si, so)
            up, down = so // g, si // g
            for shape in [(3201,), (1000, 2)]:
                x = rng.normal(size=shape).astype(np.float32)
                a = native.resample_poly_native(x, up, down)
                b = resample_poly(x.astype(np.float64), up, down,
                                  axis=0).astype(np.float32)
                assert a is not None and a.shape == b.shape
                np.testing.assert_array_equal(a, b)

    def test_io_resample_routes_native(self, lib):
        """audio.io.resample must give identical output with and without
        the native path (scipy fallback is the reference)."""
        import fun_asr_vllm_tpu.audio.io as aio

        rng = np.random.default_rng(4)
        x = rng.normal(size=8000).astype(np.float32)
        a = aio.resample(x, 44100, 16000)
        lib_bak, native._lib = native._lib, None
        tried_bak, native._tried = native._tried, True
        try:
            b = aio.resample(x, 44100, 16000)
        finally:
            native._lib, native._tried = lib_bak, tried_bak
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.float32
