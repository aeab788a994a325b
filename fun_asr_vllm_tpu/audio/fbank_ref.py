"""Numpy golden-reference kaldi log-mel fbank (+ LFR + CMVN).

Bit-comparable re-derivation of the kaldi fbank math used through
torchaudio.compliance.kaldi by funasr's WavFrontend (the `extract_fbank`
surface, reference model.py:372-377, infer.py:446-450): 25 ms hamming
window / 10 ms shift / 80 mel bins / snip_edges, DC removal, 0.97
preemphasis, 512-point FFT, kaldi mel scale (1127·ln(1+f/700), low 20 Hz,
high nyquist), log with FLT_EPSILON floor. The JAX/TPU frontend is tested
against this module.

Frame-count contract: ``num_frames = 1 + (n_samples - 400) // 160``,
matching the reference's ``speech_length = (dur_ms - 25) // 10 + 1``
(reference scp2nanojsonl.py:171).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

EPSILON = float(np.finfo(np.float32).eps)  # 1.1920929e-07, kaldi's log floor


def num_frames(n_samples: int, frame_length: int = 400, frame_shift: int = 160,
               snip_edges: bool = True) -> int:
    if snip_edges:
        return 0 if n_samples < frame_length else 1 + (n_samples - frame_length) // frame_shift
    return (n_samples + frame_shift // 2) // frame_shift


def feature_window(window_size: int, window_type: str = "hamming") -> np.ndarray:
    n = np.arange(window_size, dtype=np.float64)
    a = 2.0 * np.pi / (window_size - 1)
    if window_type == "hanning":
        return (0.5 - 0.5 * np.cos(a * n)).astype(np.float32)
    if window_type == "hamming":
        return (0.54 - 0.46 * np.cos(a * n)).astype(np.float32)
    if window_type == "povey":
        return ((0.5 - 0.5 * np.cos(a * n)) ** 0.85).astype(np.float32)
    if window_type == "rectangular":
        return np.ones(window_size, dtype=np.float32)
    if window_type == "blackman":
        return (0.42 - 0.5 * np.cos(a * n) + 0.08 * np.cos(2 * a * n)).astype(
            np.float32
        )
    raise ValueError(f"unknown window type {window_type}")


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_banks(
    num_bins: int = 80,
    window_length_padded: int = 512,
    sample_freq: float = 16000.0,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi triangular mel filterbank → [num_bins, window_length_padded//2]."""
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    n_fft_bins = window_length_padded // 2
    fft_bin_width = sample_freq / window_length_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_mels = mel_scale(fft_bin_width * np.arange(n_fft_bins))  # [F]
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta  # [M,1]
    center = left + mel_delta
    right = center + mel_delta
    up = (bin_mels[None, :] - left) / (center - left)
    down = (right - bin_mels[None, :]) / (right - center)
    banks = np.maximum(0.0, np.minimum(up, down))
    return banks.astype(np.float32)


def fbank_numpy(
    waveform: np.ndarray,
    sample_frequency: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    dither: float = 0.0,
    window_type: str = "hamming",
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    snip_edges: bool = True,
    seed: Optional[int] = None,
) -> np.ndarray:
    """waveform (float, int16 scale — caller multiplies by 32768) → [T, 80]."""
    waveform = np.asarray(waveform, dtype=np.float32)
    frame_length = int(sample_frequency * frame_length_ms / 1000)
    frame_shift = int(sample_frequency * frame_shift_ms / 1000)
    m = num_frames(len(waveform), frame_length, frame_shift, snip_edges)
    if m == 0:
        return np.zeros((0, num_mel_bins), dtype=np.float32)
    idx = np.arange(m)[:, None] * frame_shift + np.arange(frame_length)[None, :]
    frames = waveform[idx].astype(np.float32)

    if dither != 0.0:
        rng = np.random.default_rng(seed)
        frames = frames + dither * rng.standard_normal(frames.shape).astype(
            np.float32
        )
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        first = frames[:, :1] - preemphasis_coefficient * frames[:, :1]
        rest = frames[:, 1:] - preemphasis_coefficient * frames[:, :-1]
        frames = np.concatenate([first, rest], axis=1)
    frames = frames * feature_window(frame_length, window_type)[None, :]

    n_fft = 1
    while n_fft < frame_length:
        n_fft *= 2
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)  # [m, n_fft//2+1]

    banks = mel_banks(num_mel_bins, n_fft, sample_frequency, low_freq, high_freq)
    mel = power[:, : n_fft // 2] @ banks.T  # nyquist bin carries zero weight
    return np.log(np.maximum(mel, EPSILON)).astype(np.float32)


def apply_lfr(feats: np.ndarray, lfr_m: int, lfr_n: int) -> np.ndarray:
    """Low frame rate stacking (funasr WavFrontend semantics): stack lfr_m
    consecutive frames every lfr_n, left-pad by replicating the first frame
    (lfr_m-1)//2 times, right-pad by replicating the last frame."""
    if lfr_m == 1 and lfr_n == 1:
        return feats
    t, d = feats.shape
    t_lfr = int(np.ceil(t / lfr_n))
    left = np.repeat(feats[:1], (lfr_m - 1) // 2, axis=0)
    padded = np.concatenate([left, feats], axis=0)
    need = (t_lfr - 1) * lfr_n + lfr_m
    if padded.shape[0] < need:
        right = np.repeat(padded[-1:], need - padded.shape[0], axis=0)
        padded = np.concatenate([padded, right], axis=0)
    idx = np.arange(t_lfr)[:, None] * lfr_n + np.arange(lfr_m)[None, :]
    return padded[idx].reshape(t_lfr, lfr_m * d).astype(np.float32)


def load_cmvn(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a kaldi-nnet `am.mvn` file → (add_shift[D], rescale[D])."""
    add, scale = None, None
    with open(path, "r", encoding="utf-8") as f:
        lines = f.read().split("\n")
    for i, line in enumerate(lines):
        if "<AddShift>" in line or "<Rescale>" in line:
            target = "add" if "<AddShift>" in line else "scale"
            vec_line = line if "[" in line.split(">", 1)[1] else lines[i + 1]
            body = vec_line[vec_line.index("[") + 1:]
            if "]" in body:
                body = body[: body.index("]")]
            else:
                j = i + 1
                while "]" not in lines[j]:
                    body += " " + lines[j]
                    j += 1
                body += " " + lines[j][: lines[j].index("]")]
            vals = np.array(
                [float(v) for v in body.split() if not v.startswith("<")],
                dtype=np.float32,
            )
            if target == "add":
                add = vals
            else:
                scale = vals
    if add is None or scale is None:
        raise ValueError(f"no <AddShift>/<Rescale> pair in {path}")
    return add, scale


def apply_cmvn(feats: np.ndarray, add: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return ((feats + add[None, :]) * scale[None, :]).astype(np.float32)
