"""Batched JAX/TPU kaldi fbank frontend (+ LFR + CMVN).

TPU-native replacement for funasr's WavFrontend + torchaudio kaldi fbank
(the `extract_fbank` surface, reference model.py:372-377, infer.py:446-450).
Design notes:

- one jitted function computes framing → DC removal → preemphasis →
  window → rFFT(512) → power → mel matmul → log for a whole padded batch;
  the mel projection is a [256, 80] matmul that XLA fuses with the log,
  and the FFT runs on-device, so feature extraction rides the TPU instead
  of CPU dataloader workers (reference hot-loop item (3), SURVEY.md §3).
- audio lengths are bucketed (1 s steps) so jit caches a handful of shapes.
- numerics match `fbank_ref.fbank_numpy` (golden tests in
  tests/test_frontend.py); dither defaults to 0 for deterministic decoding.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .fbank_ref import (
    EPSILON,
    apply_cmvn,
    apply_lfr,
    feature_window,
    load_cmvn,
    mel_banks,
    num_frames,
)

_INT16_SCALE = 32768.0  # funasr WavFrontend scales [-1,1] floats to int16 range


@lru_cache(maxsize=8)
def _window_const(frame_length: int, window_type: str) -> np.ndarray:
    return feature_window(frame_length, window_type)


@lru_cache(maxsize=8)
def _mel_const(n_mels: int, n_fft: int, fs: int, low: float, high: float) -> np.ndarray:
    return mel_banks(n_mels, n_fft, fs, low, high).T  # [n_fft//2, n_mels]


@partial(
    jax.jit,
    static_argnames=(
        "frame_length", "frame_shift", "n_fft", "n_mels", "window_type",
        "fs", "preemph", "remove_dc",
    ),
)
def fbank_jax(
    waveform: jax.Array,  # [B, N] float32, int16 scale
    frame_length: int = 400,
    frame_shift: int = 160,
    n_fft: int = 512,
    n_mels: int = 80,
    window_type: str = "hamming",
    fs: int = 16000,
    preemph: float = 0.97,
    remove_dc: bool = True,
) -> jax.Array:
    """[B, N] → [B, T, n_mels] log-mel; T = 1 + (N - frame_length)//frame_shift."""
    b, n = waveform.shape
    t = 1 + (n - frame_length) // frame_shift
    g = math.gcd(frame_length, frame_shift)
    if n % g == 0:
        # gather-free framing: decompose by rows of g = gcd(L, S)
        # samples — frame i is `span` consecutive rows starting at row
        # i*step, so `span` strided slices + one concat build [B, T, L].
        # The equivalent index gather profiled ~6 ms per 16×1200-frame
        # wave on v5e (bad layout); the slices are plain strided copies.
        step, span = frame_shift // g, frame_length // g
        rows = waveform.reshape(b, n // g, g)
        parts = [
            jax.lax.slice_in_dim(
                rows, j, j + (t - 1) * step + 1, step, axis=1
            )
            for j in range(span)
        ]
        frames = jnp.concatenate(parts, axis=-1)  # [B, T, L]
    else:
        starts = jnp.arange(t, dtype=jnp.int32) * frame_shift
        idx = (starts[:, None]
               + jnp.arange(frame_length, dtype=jnp.int32)[None, :])
        frames = jnp.take(waveform, idx, axis=1)  # [B, T, L]

    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemph:
        first = frames[..., :1] * (1.0 - preemph)
        rest = frames[..., 1:] - preemph * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    window = jnp.asarray(_window_const(frame_length, window_type))
    frames = frames * window

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [B, T, n_fft//2+1]
    mel_t = jnp.asarray(_mel_const(n_mels, n_fft, fs, 20.0, 0.0))
    mel = jnp.einsum(
        "btf,fm->btm", power[..., : n_fft // 2], mel_t,
        preferred_element_type=jnp.float32,
    )
    return jnp.log(jnp.maximum(mel, EPSILON))


class WavFrontend:
    """Config-compatible analogue of funasr's WavFrontend.

    Exposes the attributes the reference reads off the frontend object —
    ``fs``, ``frame_shift``, ``lfr_n`` (reference model.py:363, 384-385) —
    and an `extract` method producing [B, T, D] features + lengths.
    """

    def __init__(
        self,
        fs: int = 16000,
        window: str = "hamming",
        n_mels: int = 80,
        frame_length: int = 25,
        frame_shift: int = 10,
        lfr_m: int = 1,
        lfr_n: int = 1,
        dither: float = 0.0,
        cmvn_file: Optional[str] = None,
        bucket_seconds: float = 1.0,
        **_unused,
    ) -> None:
        self.fs = fs
        self.window = window
        self.n_mels = n_mels
        self.frame_length = frame_length  # ms
        self.frame_shift = frame_shift  # ms
        self.lfr_m = lfr_m
        self.lfr_n = lfr_n
        self.dither = dither
        self.bucket_samples = max(int(bucket_seconds * fs), 1)
        self.cmvn = load_cmvn(cmvn_file) if cmvn_file else None
        self._cmvn_dev = None
        self._frame_len_samp = int(fs * frame_length / 1000)
        self._frame_shift_samp = int(fs * frame_shift / 1000)
        # padding is bucketed in FRAMES, snapped so the post-LFR encoder
        # time dim is a multiple of 16 (bf16 sublane) — this keeps the
        # flash-attention column-block fast path on (no pad/transpose ops
        # per encoder layer; see ops/flash_attention.py)
        unit = 16 * max(self.lfr_n, 1)
        fb = int(round(bucket_seconds * 1000.0 / frame_shift))
        self.frame_bucket = max(unit, (fb // unit) * unit)

    def cmvn_dev(self):
        """CMVN (add, scale) as device arrays, uploaded once, or None."""
        if self.cmvn is None:
            return None
        if self._cmvn_dev is None:
            add, scale = self.cmvn
            self._cmvn_dev = (jnp.asarray(add), jnp.asarray(scale))
        return self._cmvn_dev

    @property
    def output_size(self) -> int:
        return self.n_mels * self.lfr_m

    def frame_count(self, n_samples: int) -> int:
        return num_frames(n_samples, self._frame_len_samp, self._frame_shift_samp)

    def padded_samples(self, max_len: int) -> int:
        """Frame-bucketed padded sample count covering `max_len` samples
        (lands exactly on a `frame_bucket`-frames boundary)."""
        fl, fs_ = self._frame_len_samp, self._frame_shift_samp
        needed = max(1, -(-(max_len - fl) // fs_) + 1)
        frames_b = -(-needed // self.frame_bucket) * self.frame_bucket
        return (frames_b - 1) * fs_ + fl

    def lfr_frame_count(self, n_samples: int) -> int:
        t = self.frame_count(n_samples)
        return int(math.ceil(t / self.lfr_n)) if t else 0

    def batchify(
        self, wavs: Sequence[np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Pad to a frame-bucketed length and scale to int16 range →
        ([B, N_pad] float32, frame_counts [B]). The padded sample count
        lands exactly on a frame boundary of `frame_bucket` frames, so
        the in-graph fbank produces a lane-aligned time dimension."""
        wavs = [np.asarray(w, dtype=np.float32).reshape(-1) for w in wavs]
        lens = [len(w) for w in wavs]
        padded_len = self.padded_samples(max(lens))
        batch = np.zeros((len(wavs), padded_len), dtype=np.float32)
        for i, w in enumerate(wavs):
            n = min(len(w), padded_len)
            batch[i, :n] = w[:n]
        batch *= _INT16_SCALE
        frame_counts = np.array([self.frame_count(n) for n in lens],
                                dtype=np.int32)
        return batch, frame_counts

    def batchify_int16(
        self, wavs: Sequence[np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Like `batchify` but int16 samples — halves the host→device
        transfer; the fused program casts to f32 in-graph."""
        batch, frame_counts = self.batchify(wavs)
        return (
            np.clip(batch, -32768, 32767).astype(np.int16), frame_counts
        )

    def batchify_packed(
        self, wavs: Sequence[np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """int16 sample pairs bit-packed into uint32 — halves the
        host→device bytes LOSSLESSLY while keeping a TPU-native transfer
        dtype (int16 device_put takes a slow conversion path on this
        transport; uint32 rides the fast path). The fused program unpacks
        in-graph with two shifts."""
        batch, frame_counts = self.batchify(wavs)
        return pack_pairs(batch), frame_counts

    def batchify_sample_packed(
        self, wavs: Sequence[np.ndarray], frame_starts: Sequence[int],
        total_frames: int,
    ) -> np.ndarray:
        """Sample-level ragged packing: place wav i at sample offset
        ``frame_starts[i] * frame_shift`` in ONE row covering
        `total_frames` frames → uint32 int16-pairs [1, NS/2]. Paired
        with engine/packed.plan_frame_pack's layout (16-frame-aligned
        segments, ≥16-frame zero gaps ≥ the 240-sample window overlap),
        fbank over the packed row produces every utterance's frames at
        its planned positions — no padded fbank compute, and the wire
        carries only valid samples."""
        fs_, fl = self._frame_shift_samp, self._frame_len_samp
        ns = (int(total_frames) - 1) * fs_ + fl
        buf = np.zeros(ns + (ns % 2), np.float32)
        for w, st in zip(wavs, frame_starts):
            o = int(st) * fs_
            n = min(len(w), ns - o)
            buf[o : o + n] = np.asarray(w, np.float32).reshape(-1)[:n]
        buf *= _INT16_SCALE
        return pack_pairs(buf[None])

    def extract(
        self, wavs: Sequence[np.ndarray]
    ) -> Tuple[jax.Array, jax.Array]:
        """List of mono float32 [-1,1] arrays → ([B, T, D], lengths [B])."""
        batch, feat_lens = self.batchify(wavs)

        feats = fbank_jax(
            jnp.asarray(batch),
            frame_length=self._frame_len_samp,
            frame_shift=self._frame_shift_samp,
            n_mels=self.n_mels,
            window_type=self.window,
            fs=self.fs,
        )

        if self.lfr_m != 1 or self.lfr_n != 1:
            feats = _lfr_jax(feats, self.lfr_m, self.lfr_n,
                             jnp.asarray(feat_lens))
            feat_lens = np.ceil(feat_lens / self.lfr_n).astype(np.int32)
        if self.cmvn is not None:
            add, scale = self.cmvn
            feats = (feats + jnp.asarray(add)) * jnp.asarray(scale)
        return feats, jnp.asarray(feat_lens)

    # numpy single-utterance path (golden/CPU tooling)
    def extract_numpy(self, wav: np.ndarray) -> np.ndarray:
        feats = _fbank_np_int16(
            np.asarray(wav, dtype=np.float32) * _INT16_SCALE,
            self.fs, self.n_mels, self.frame_length, self.frame_shift,
            self.window, self.dither,
        )
        feats = apply_lfr(feats, self.lfr_m, self.lfr_n)
        if self.cmvn is not None:
            feats = apply_cmvn(feats, *self.cmvn)
        return feats


def _fbank_np_int16(wav_int16_scale, fs, n_mels, frame_length_ms, frame_shift_ms,
                    window, dither):
    from .fbank_ref import fbank_numpy

    return fbank_numpy(
        wav_int16_scale,
        sample_frequency=fs,
        num_mel_bins=n_mels,
        frame_length_ms=frame_length_ms,
        frame_shift_ms=frame_shift_ms,
        window_type=window,
        dither=dither,
    )


def pack_pairs(batch: np.ndarray) -> np.ndarray:
    """Host-side half of the packed wire format: int16-scale float32
    [B, N] → uint32 [B, ceil(N/2)] bit-packed int16 pairs. Odd N is
    zero-padded by one sample ON THE WIRE only — callers keep their
    frame-bucket-aligned N and slice after `unpack_pairs`. The single
    packing definition shared by `batchify_packed`,
    `batchify_sample_packed`, the pipeline multi-wave path and bench.py;
    it pairs with `unpack_pairs` below."""
    i16 = np.clip(batch, -32768, 32767).astype("<i2")
    if i16.shape[-1] % 2:
        i16 = np.pad(i16, ((0, 0), (0, 1)))
    packed = i16.reshape(i16.shape[0], -1, 2).view("<u4")[:, :, 0]
    return np.ascontiguousarray(packed)


def unpack_pairs(packed: jax.Array) -> jax.Array:
    """In-graph unpack of `batchify_packed` uploads: uint32 [B, N/2] →
    float32 [B, N] at int16 scale (two arithmetic shifts, all int32 —
    TPU-native). The single definition of the packing format; any
    change to `batchify_packed` pairs with this."""
    i = jax.lax.bitcast_convert_type(packed, jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(i, 16), 16)
    hi = jnp.right_shift(i, 16)
    flat = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)
    return flat.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_samples",))
def unpack_pairs_f32(packed: jax.Array, n_samples: int) -> jax.Array:
    """`unpack_pairs` sliced to the true padded length — run inside an
    upload/prefetch thread so the wire carries half the bytes and the
    (tiny) unpack op overlaps the current batch's compute."""
    return unpack_pairs(packed)[:, :n_samples]


@partial(jax.jit, static_argnames=("lfr_m", "lfr_n"))
def _lfr_jax(
    feats: jax.Array, lfr_m: int, lfr_n: int,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched LFR stacking matching fbank_ref.apply_lfr.

    LFR group i stacks source frames ``i*lfr_n - (lfr_m-1)//2 + j``
    clipped into the valid range — funasr replicates the FIRST frame on
    the left and the LAST VALID frame on the right. In a padded batch
    the last valid frame differs per row, so `lengths` (pre-LFR frame
    counts) must be given whenever rows are padded beyond their true
    frame count; without it the batch's padded tail frames are used."""
    b, t, d = feats.shape
    t_lfr = -(-t // lfr_n)
    left_pad = (lfr_m - 1) // 2
    idx = (
        jnp.arange(t_lfr, dtype=jnp.int32)[:, None] * lfr_n - left_pad
        + jnp.arange(lfr_m, dtype=jnp.int32)[None, :]
    )  # [T_lfr, M]
    if lengths is None:
        idx_b = jnp.clip(idx, 0, t - 1)[None]
        idx_b = jnp.broadcast_to(idx_b, (b, t_lfr, lfr_m))
    else:
        hi = (jnp.maximum(lengths, 1) - 1)[:, None, None]
        idx_b = jnp.clip(idx[None], 0, hi)
    flat = idx_b.reshape(b, t_lfr * lfr_m)
    out = jnp.take_along_axis(feats, flat[:, :, None], axis=1)
    return out.reshape(b, t_lfr, lfr_m * d)


def extract_fbank(
    wavs: Union[Sequence[np.ndarray], np.ndarray],
    frontend: WavFrontend,
    is_final: bool = True,
    data_type: str = "sound",
) -> Tuple[jax.Array, jax.Array]:
    """funasr `extract_fbank(wavs, frontend=..., is_final=True)` analogue
    (reference infer.py:446-450) → (features [B,T,D], lengths [B])."""
    if isinstance(wavs, np.ndarray) and wavs.ndim == 1:
        wavs = [wavs]
    return frontend.extract(list(wavs))
