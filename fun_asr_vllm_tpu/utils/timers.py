"""Structured per-stage timing + RTFx accounting.

The reference's tracing is ad-hoc `time.perf_counter` spans stuffed into
`meta_data` and a printed wall clock (reference model.py:361-386,
infer.py:441-507). Here: a StageTimer that any pipeline component can
share, RTF/RTFx computation built in, and an optional `jax.profiler`
trace context (SURVEY.md §5 tracing plan).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.audio_seconds = 0.0
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t
            self.counts[name] += 1

    def add_audio(self, seconds: float) -> None:
        self.audio_seconds += seconds

    @property
    def wall(self) -> float:
        return time.perf_counter() - self._t0

    def rtf(self, elapsed: Optional[float] = None) -> float:
        e = self.wall if elapsed is None else elapsed
        return e / self.audio_seconds if self.audio_seconds else 0.0

    def rtfx(self, elapsed: Optional[float] = None) -> float:
        r = self.rtf(elapsed)
        return 1.0 / r if r else 0.0

    def report(self) -> Dict:
        return {
            "stages": {
                k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 2)}
                for k, v in sorted(self.totals.items())
            },
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.wall, 3),
            "rtfx": round(self.rtfx(), 2),
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a dir is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
