"""Streaming (windowed-incremental) encoder for online serving.

The round-1 server re-ran fbank+encoder+prefill over ALL accumulated
audio per partial — O(T²) over a stream. This module bounds the encoder
work per partial to a fixed window:

- raw samples accumulate in a ring; each `push()` re-encodes only the
  last `window_s` seconds (bounded context, the chunked-attention
  pattern of funasr's online encoders);
- frames older than the window are FROZEN: once emitted they never
  change, so each partial appends `new frames` instead of recomputing
  the stream (`encoder_frames` grows monotonically);
- for streams shorter than the window the output is numerically
  identical to the offline encoder; beyond it, boundary frames see a
  bounded left context (documented small deviation, like any streaming
  encoder).

Per-partial cost: fbank+encoder over ≤ window_s seconds — O(1) in the
stream length, vs O(T) before (and O(T²) summed over a stream).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class StreamingEncoder:
    def __init__(
        self,
        encoder_params,
        encoder_cfg,
        frontend,
        window_s: float = 6.0,
    ) -> None:
        self.params = encoder_params
        self.cfg = encoder_cfg
        self.frontend = frontend
        self.window_samples = int(window_s * frontend.fs)
        self.reset()

    def reset(self) -> None:
        self._samples = np.zeros(0, np.float32)
        self._frozen: Optional[np.ndarray] = None  # [Tf, D] encoder out
        self._frozen_upto = 0      # frozen frame count (post-LFR)
        self._window_start = 0     # sample index where the window begins

    def _encode(self, wav: np.ndarray) -> np.ndarray:
        from ..models import encoder as encoder_mod

        feats, lens = self.frontend.extract([wav])
        out, _ = encoder_mod.encode(self.params, self.cfg, feats, lens)
        return np.asarray(out[0, : int(lens[0])], np.float32)

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Append raw mono samples → the full encoder-frame sequence so
        far [T_frames, D] (frozen prefix + live window)."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._samples = np.concatenate([self._samples, samples])
        total = len(self._samples)

        # slide the window start so the live region stays bounded —
        # but only to frame-aligned positions so frozen frames stay put
        hop = self.frontend._frame_shift_samp * self.frontend.lfr_n
        live = None
        if total - self._window_start > self.window_samples:
            new_start = (total - self.window_samples) // hop * hop
            if new_start > self._window_start:
                # freeze frames fully to the left of the new window start
                want = new_start // hop - self._window_start // hop
                live = self._encode(self._samples[self._window_start:])
                freeze_frames = min(want, len(live))
                take = live[:freeze_frames]
                self._frozen = (take if self._frozen is None
                                else np.concatenate([self._frozen, take]))
                self._frozen_upto += freeze_frames
                self._window_start += freeze_frames * hop
                # reuse this encode's tail as the live region: its frames
                # saw equal-or-longer left context than a re-encode from
                # the advanced window start would — re-encoding here
                # doubled steady-state per-partial encoder cost
                live = live[freeze_frames:]

        if live is None:
            live = self._encode(self._samples[self._window_start:])
        if self._frozen is None:
            return live
        return np.concatenate([self._frozen, live])

    @property
    def stream_seconds(self) -> float:
        return len(self._samples) / self.frontend.fs


class StreamingResampler:
    """Incremental polyphase resampler for non-16 kHz online streams.

    `push(new_samples)` emits the next chunk of output samples; the
    emitted stream is numerically identical to `audio.io.resample` over
    the whole signal in the already-emitted region (the final
    `~half_len` filter-edge outputs are withheld until `flush()`), and
    each push costs O(new + filter_len) — not O(stream) (the round-2
    server re-resampled the WHOLE buffer per partial, O(T²) summed,
    ROADMAP Capabilities 5).

    How: scipy's `resample_poly(x, up, down)` output m is a fixed dot
    product over inputs n with |n·up − m·down| ≤ half_len
    (half_len = 10·max(up, down), kaiser β=5.0 — the same default
    filter io.resample uses). Windowing the input at a multiple of
    `down` keeps the polyphase phase grid aligned with the full-signal
    computation, so interior outputs are bit-identical; only outputs
    whose taps would cross the window edges are deferred."""

    def __init__(self, sr_in: int, sr_out: int) -> None:
        from math import gcd

        g = gcd(sr_in, sr_out)
        self.up = sr_out // g
        self.down = sr_in // g
        self.half_len = 10 * max(self.up, self.down)
        self._buf = np.zeros((0,), np.float64)  # input tail from _win_start
        self._win_start = 0   # absolute input index of _buf[0] (mult of down)
        self._n_in = 0        # total input samples seen
        self._emitted = 0     # output samples emitted

    def _resample_window(self) -> np.ndarray:
        from scipy.signal import resample_poly

        return resample_poly(self._buf, self.up, self.down, axis=0)

    def push(self, new_samples: np.ndarray) -> np.ndarray:
        """Feed raw input samples → newly safe output samples (f32)."""
        if self.up == self.down:
            return np.asarray(new_samples, np.float32)
        new = np.asarray(new_samples, np.float64).reshape(-1)
        self._buf = np.concatenate([self._buf, new])
        self._n_in += len(new)
        # outputs m with (m·down + half_len)/up ≤ n_in − 1 are final
        m_safe = ((self._n_in - 1) * self.up - self.half_len) // self.down + 1
        m_safe = max(self._emitted, m_safe)
        if m_safe == self._emitted:
            return np.zeros((0,), np.float32)
        local = self._resample_window()
        lo = self._emitted - (self._win_start * self.up) // self.down
        out = local[lo : lo + (m_safe - self._emitted)].astype(np.float32)
        self._emitted = m_safe
        # drop input no future output needs, keeping the window start on
        # a multiple of `down` (phase alignment with the full signal)
        need_from = (self._emitted * self.down - self.half_len) // self.up
        a = max(self._win_start, (max(need_from, 0) // self.down) * self.down)
        self._buf = self._buf[a - self._win_start :]
        self._win_start = a
        return out

    def flush(self) -> np.ndarray:
        """Emit the withheld tail; total output equals
        `resample(full_signal)` exactly."""
        if self.up == self.down:
            return np.zeros((0,), np.float32)
        total = -(-self._n_in * self.up // self.down)
        if total <= self._emitted:
            return np.zeros((0,), np.float32)
        local = self._resample_window()
        lo = self._emitted - (self._win_start * self.up) // self.down
        out = local[lo:].astype(np.float32)[: total - self._emitted]
        self._emitted = total
        return out

    def reset(self) -> None:
        self._buf = np.zeros((0,), np.float64)
        self._win_start = 0
        self._n_in = 0
        self._emitted = 0


class StreamingEndpointer:
    """Energy endpointer for server-side VAD utterance segmentation.

    The FunASR-protocol handshake carries `vad_tail_sil` (cut when
    trailing silence exceeds this many ms) and `vad_max_len` (force-cut a
    segment at this many ms) — reference ASR_client_api.py:74-81 — and
    the reference stack's server segments the stream with them so online
    clients get finals without sending `is_speaking: false`. This is the
    streaming detector: `push(new_samples)` returns True when the current
    segment should be finalized.

    Frames are 10 ms; a frame is speech when its RMS clears an absolute
    noise floor AND sits within `threshold_db` of the running stream
    peak (the same relative rule as `data.vad.EnergyVAD`, made causal).
    The peak decays with a ~5 s time constant so one loud transient
    cannot permanently raise the speech threshold. Silence-only audio
    never fires, and pre-speech silence does not count toward
    `max_len_ms` (the segment clock starts at the first speech frame).
    A `tail_sil_ms` or `max_len_ms` of 0 disables that trigger.
    `reset()` starts the next segment (the decayed peak is kept — it is
    a property of the channel)."""

    def __init__(self, tail_sil_ms: int = 800, max_len_ms: int = 60000,
                 fs: int = 16000, threshold_db: float = -40.0,
                 abs_floor: float = 1e-3) -> None:
        self.tail_sil_ms = int(tail_sil_ms)
        self.max_len_ms = int(max_len_ms)
        self.fs = fs
        self.hop = fs // 100  # 10 ms
        self.threshold = 10.0 ** (threshold_db / 20.0)
        self.abs_floor = abs_floor
        self._peak = abs_floor
        self._carry = np.zeros(0, np.float32)
        self._seen_speech = False
        self._sil_ms = 0
        self._seg_ms = 0

    def reset(self) -> None:
        self._carry = np.zeros(0, np.float32)
        self._seen_speech = False
        self._sil_ms = 0
        self._seg_ms = 0

    def push(self, new_samples: np.ndarray) -> bool:
        x = np.concatenate(
            [self._carry, np.asarray(new_samples, np.float32).reshape(-1)]
        )
        n = len(x) // self.hop
        self._carry = x[n * self.hop:]
        if n == 0:
            return False
        rms = np.sqrt(
            np.mean(x[: n * self.hop].reshape(n, self.hop) ** 2, axis=1)
        )
        # exponential peak decay (~0.998/frame ≈ 5 s time constant) so a
        # single transient cannot pin the threshold high forever
        self._peak = max(float(rms.max()), self._peak * (0.998 ** n),
                         self.abs_floor)
        active = (rms > self.abs_floor) & (rms > self._peak * self.threshold)
        fire = False
        for a in active:
            if a:
                self._seen_speech = True
                self._sil_ms = 0
            elif self._seen_speech:
                self._sil_ms += 10
                if 0 < self.tail_sil_ms <= self._sil_ms:
                    fire = True
            if self._seen_speech:
                # the segment clock starts at the first speech frame —
                # pre-speech silence must not eat the max_len budget
                self._seg_ms += 10
                if 0 < self.max_len_ms <= self._seg_ms:
                    fire = True
        return fire
