"""Voice activity detection for the data factory.

The reference wraps funasr's fsmn-vad / FireRedVAD models behind a
segmenting interface with `max_end_silence_time=800` ms and
`max_single_segment_time=30000` ms (reference
simple_audio_processor.py:158-257). Here: an energy-based VAD with the
same segmenting contract (hangover smoothing, max-silence cut, max-length
cut) — model-free so it runs anywhere; an FSMN-VAD can be slotted in via
the same `segments()` interface when weights exist.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class VADConfig:
    fs: int = 16000
    frame_ms: int = 10
    energy_threshold_db: float = -40.0  # relative to peak
    min_speech_ms: int = 100
    max_end_silence_ms: int = 800
    max_single_segment_ms: int = 30000
    pad_ms: int = 100


class EnergyVAD:
    """Frame-energy VAD → [(start_ms, end_ms)] speech segments."""

    def __init__(self, config: VADConfig = None, **kw) -> None:
        self.cfg = config or VADConfig(**kw)

    def frame_energies_db(self, wav: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        hop = cfg.fs * cfg.frame_ms // 1000
        n = len(wav) // hop
        frames = wav[: n * hop].reshape(n, hop)
        rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1) + 1e-12)
        peak = max(float(rms.max()), 1e-9)
        return 20.0 * np.log10(rms / peak + 1e-12)

    def segments(self, wav: np.ndarray) -> List[Tuple[int, int]]:
        cfg = self.cfg
        if len(wav) < cfg.fs * cfg.frame_ms // 1000:
            return []
        db = self.frame_energies_db(wav)
        active = db > cfg.energy_threshold_db
        out: List[Tuple[int, int]] = []
        start = None
        silence = 0
        max_sil = cfg.max_end_silence_ms // cfg.frame_ms
        max_len = cfg.max_single_segment_ms // cfg.frame_ms
        for i, a in enumerate(active):
            if a:
                if start is None:
                    start = i
                silence = 0
            elif start is not None:
                silence += 1
                if silence >= max_sil:
                    out.append((start, i - silence + 1))
                    start, silence = None, 0
                    continue
            if start is not None and i - start >= max_len:
                out.append((start, i + 1))
                start, silence = None, 0
        if start is not None:
            out.append((start, len(active)))
        # drop too-short, pad, convert to ms
        res = []
        pad = cfg.pad_ms // cfg.frame_ms
        min_frames = cfg.min_speech_ms // cfg.frame_ms
        total = len(active)
        for s, e in out:
            if e - s < min_frames:
                continue
            s = max(0, s - pad)
            e = min(total, e + pad)
            res.append((s * cfg.frame_ms, e * cfg.frame_ms))
        # merge overlapping after padding — but never past the max-length
        # cap (forced cuts must survive the pad-merge)
        merged: List[Tuple[int, int]] = []
        for s, e in res:
            if (
                merged
                and s <= merged[-1][1]
                and max(e, merged[-1][1]) - merged[-1][0]
                <= cfg.max_single_segment_ms
            ):
                merged[-1] = (merged[-1][0], max(e, merged[-1][1]))
            else:
                merged.append((s, e))
        return merged

    def cut(self, wav: np.ndarray) -> List[np.ndarray]:
        cfg = self.cfg
        return [
            wav[s * cfg.fs // 1000 : e * cfg.fs // 1000]
            for s, e in self.segments(wav)
        ]

    def detect_segments(self, wav: np.ndarray) -> List[dict]:
        """Reference VADModelWrapper.detect_segments dict shape
        (simple_audio_processor.py:240-257)."""
        return [
            {"segment_id": i, "start_time": s, "end_time": e,
             "duration": e - s}
            for i, (s, e) in enumerate(self.segments(wav))
        ]
