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
