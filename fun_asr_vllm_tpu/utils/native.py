"""ctypes bindings for the C++ native runtime (csrc/native.cpp).

Auto-builds `csrc/build/libfunasr_native.so` with the system g++ on first
use (no pybind11 in this environment; plain C ABI + ctypes). All callers
fall back to the pure-python/numpy implementations when the toolchain is
unavailable, so the framework never hard-depends on the build.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "build", "libfunasr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC], check=True, capture_output=True, timeout=120
        )
        return True
    except Exception as e:  # toolchain missing / build error
        logger.warning("native build failed: %s", e)
        return False


def _stale() -> bool:
    """True when any csrc source is newer than the built .so."""
    so_mtime = os.path.getmtime(_SO)
    for name in os.listdir(_CSRC):
        if name.endswith((".cpp", ".h", ".hpp")) or name == "Makefile":
            if os.path.getmtime(os.path.join(_CSRC, name)) > so_mtime:
                return True
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # rebuild when missing or older than the sources — a stale binary
        # could silently diverge from the python DP it must mirror
        if (not os.path.exists(_SO) or _stale()) and not _build():
            if not os.path.exists(_SO):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.warning("native load failed: %s", e)
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C")
        lib.align_tokens.restype = ctypes.c_int
        lib.align_tokens.argtypes = [i32p, ctypes.c_int, i32p, ctypes.c_int, i32p]
        lib.pcm16_to_float.restype = None
        lib.pcm16_to_float.argtypes = [i16p, ctypes.c_int64, f32p]
        lib.float_to_pcm16.restype = None
        lib.float_to_pcm16.argtypes = [f32p, ctypes.c_int64, i16p]
        lib.resample_linear.restype = None
        lib.resample_linear.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_double,
            f32p, ctypes.c_int64, ctypes.c_double,
        ]
        lib.nlms_echo_cancel.restype = None
        lib.nlms_echo_cancel.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, f32p,
        ]
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i32s = ctypes.POINTER(ctypes.c_int32)
        i64s = ctypes.POINTER(ctypes.c_int64)
        lib.wav_probe.restype = ctypes.c_int
        lib.wav_probe.argtypes = [
            u8p, ctypes.c_int64, i32s, i32s, i32s, i32s, i64s, i64s,
        ]
        lib.wav_decode_f32.restype = ctypes.c_int64
        lib.wav_decode_f32.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, f32p,
        ]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.resample_upfirdn_f32.restype = None
        lib.resample_upfirdn_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, f64p, ctypes.c_int64, ctypes.c_int64,
            f32p, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def align_ops_native(ref_ids: Sequence[int], hyp_ids: Sequence[int]
                     ) -> Optional[List[int]]:
    """Levenshtein op sequence via C++; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ref = np.ascontiguousarray(ref_ids, dtype=np.int32)
    hyp = np.ascontiguousarray(hyp_ids, dtype=np.int32)
    out = np.empty(len(ref) + len(hyp) + 1, dtype=np.int32)
    k = lib.align_tokens(ref, len(ref), hyp, len(hyp), out)
    return out[:k].tolist()


def pcm16_to_float(pcm: np.ndarray) -> np.ndarray:
    lib = get_lib()
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(pcm.shape, dtype=np.float32)
    lib.pcm16_to_float(pcm, pcm.size, out.reshape(-1))
    return out


def wav_read_native(buf: bytes) -> Optional[tuple]:
    """Parse+decode a WAV/RF64 byte buffer via C++ → (samples, rate).

    Returns float32 samples ([N] mono, [N, C] multi-channel, values in
    [-1, 1]) like `audio.io.read_wav`, or None when the native library is
    unavailable or the format needs the python fallback."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.frombuffer(buf, dtype=np.uint8)
    fmt = ctypes.c_int32()
    bits = ctypes.c_int32()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    off = ctypes.c_int64()
    nbytes = ctypes.c_int64()
    rc = lib.wav_probe(
        arr, arr.size, ctypes.byref(fmt), ctypes.byref(bits),
        ctypes.byref(channels), ctypes.byref(rate), ctypes.byref(off),
        ctypes.byref(nbytes),
    )
    if rc != 0:
        return None  # malformed / unusual: python parser is authoritative
    bytes_per = {8: 1, 16: 2, 24: 3, 32: 4, 64: 8}.get(bits.value)
    if bytes_per is None:
        return None  # python path raises the detailed error
    n_samples = nbytes.value // bytes_per
    out = np.empty(n_samples, dtype=np.float32)
    data = np.ascontiguousarray(
        arr[off.value:off.value + nbytes.value])
    got = lib.wav_decode_f32(data, data.size, bits.value, fmt.value, out)
    if got < 0:
        return None
    out = out[:got]
    ch = channels.value
    if ch > 1:
        out = out[: got // ch * ch].reshape(-1, ch)
    return out, rate.value


_taps_cache: dict = {}


def _resample_taps(up: int, down: int):
    """FIR taps + output offset to the scipy.signal.resample_poly spec:
    firwin(2*10*max_rate + 1, 1/max_rate, kaiser beta 5.0) * up, zero-
    pre-padded so the kept outputs start on a down-sample phase."""
    key = (up, down)
    hit = _taps_cache.get(key)
    if hit is not None:
        return hit
    max_rate = max(up, down)
    half_len = 10 * max_rate
    m = np.arange(2 * half_len + 1, dtype=np.float64) - half_len
    f_c = 1.0 / max_rate
    h = f_c * np.sinc(f_c * m) * np.kaiser(2 * half_len + 1, 5.0)
    h /= h.sum()
    h *= up
    n_pre_pad = down - half_len % down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    n_pre_remove = (half_len + n_pre_pad) // down
    hit = (np.ascontiguousarray(h), n_pre_remove)
    _taps_cache[key] = hit
    return hit


def resample_poly_native(x: np.ndarray, up: int, down: int
                         ) -> Optional[np.ndarray]:
    """Polyphase resample along axis 0 via the C++ upfirdn core; None when
    native is unavailable. Matches scipy.signal.resample_poly(x, up, down)
    (float64 taps, double accumulation, same centering/trim)."""
    lib = get_lib()
    if lib is None:
        return None
    squeeze = x.ndim == 1
    x2 = np.ascontiguousarray(x, dtype=np.float32)
    if squeeze:
        x2 = x2[:, None]
    n, ch = x2.shape
    n_up = n * up
    out_n = n_up // down + bool(n_up % down)
    taps, offset = _resample_taps(up, down)
    out = np.empty((out_n, ch), dtype=np.float32)
    lib.resample_upfirdn_f32(
        x2.reshape(-1), n, ch, up, down, taps, taps.size, offset,
        out.reshape(-1), out_n,
    )
    return out[:, 0] if squeeze else out


def nlms_echo_cancel(
    mic: np.ndarray, ref: np.ndarray, taps: int = 256,
    mu: float = 0.5, eps: float = 1e-6,
) -> np.ndarray:
    """NLMS echo cancellation (reference simple_audio_processor.py:667-718).
    numpy fallback when native is unavailable."""
    mic = np.ascontiguousarray(mic, dtype=np.float32)
    ref = np.ascontiguousarray(ref, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty_like(mic)
        lib.nlms_echo_cancel(mic, ref, mic.size, taps, mu, eps, out)
        return out
    # numpy fallback (same recursion, slower)
    w = np.zeros(taps, np.float32)
    buf = np.zeros(taps, np.float32)
    out = np.empty_like(mic)
    energy = eps
    for i in range(mic.size):
        energy -= buf[-1] * buf[-1]
        buf[1:] = buf[:-1]
        buf[0] = ref[i]
        energy += ref[i] * ref[i]
        est = float(w @ buf)
        err = mic[i] - est
        out[i] = err
        w += (mu * err / (energy + eps)) * buf
    return out
