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
