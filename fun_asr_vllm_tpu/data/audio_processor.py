"""Device-recording zip → ASR corpus processor (the reference
simple_audio_processor.py:1-1486 surface).

Pipeline per package: stereo PCM load (channel 0 = mic, channel 1 =
far-end reference) → NLMS echo cancellation (reference :603-718; native
C++ kernel in csrc/native.cpp) → VAD segmentation (energy VAD with the
fsmn-vad segmenting contract, data/vad.py) → ASR transcription (pluggable;
the TPU BatchPipeline slots in where the reference calls Qwen3-ASR-1.7B,
:791-822) → noise/duplicate/containment filtering (Jaccard char
similarity ≥ 0.6, :260-537) → per-package JSONL + consolidated audio dir +
processing_summary.json with duration/effective-ratio stats (:1082-1181).

Package filters: ``dev:YYYYMMDD:YYYYMMDD`` device/date specs (:48-124).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import zipfile
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..audio.io import write_wav
from ..utils.native import nlms_echo_cancel
from .vad import EnergyVAD, VADConfig


@dataclasses.dataclass
class PackageFilter:
    """'dev123:20250101:20250301' → device id + inclusive date range."""

    device: str = ""
    date_from: str = ""
    date_to: str = ""

    @classmethod
    def parse(cls, spec: str) -> "PackageFilter":
        parts = spec.split(":")
        return cls(*(parts + ["", "", ""])[:3])

    def matches(self, filename: str) -> bool:
        if self.device and self.device not in filename:
            return False
        m = re.search(r"(20\d{6})", filename)
        if m and (self.date_from or self.date_to):
            d = m.group(1)
            if self.date_from and d < self.date_from:
                return False
            if self.date_to and d > self.date_to:
                return False
        return True


def jaccard_char_similarity(a: str, b: str) -> float:
    """Char-set Jaccard (the reference's dup/containment filter metric,
    simple_audio_processor.py:260-537)."""
    sa, sb = set(a), set(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


class TextFilter:
    """Noise/duplicate/containment filtering over transcripts."""

    def __init__(self, sim_threshold: float = 0.6, min_chars: int = 2) -> None:
        self.sim_threshold = sim_threshold
        self.min_chars = min_chars
        self.seen: List[str] = []
        self.stats = {"noise": 0, "dup": 0, "contained": 0, "kept": 0}

    def accept(self, text: str) -> bool:
        t = text.strip()
        if len(t) < self.min_chars:
            self.stats["noise"] += 1
            return False
        for prev in self.seen:
            sim = jaccard_char_similarity(t, prev)
            if sim >= self.sim_threshold:
                if t in prev or prev in t:
                    self.stats["contained"] += 1
                else:
                    self.stats["dup"] += 1
                return False
        self.seen.append(t)
        self.stats["kept"] += 1
        return True


class SimpleAudioProcessor:
    def __init__(
        self,
        output_dir: str,
        *,
        transcribe_fn: Optional[Callable[[List[np.ndarray]], List[str]]] = None,
        fs: int = 16000,
        echo_cancel: bool = True,
        vad: Optional[EnergyVAD] = None,
        vad_model_dir: Optional[str] = None,
        sim_threshold: float = 0.6,
    ) -> None:
        self.output_dir = output_dir
        self.audio_dir = os.path.join(output_dir, "audio")
        os.makedirs(self.audio_dir, exist_ok=True)
        self.fs = fs
        self.echo_cancel = echo_cancel
        self.transcribe_fn = transcribe_fn
        if vad is None and vad_model_dir:
            # FSMN-VAD weights when available (reference fsmn-vad,
            # simple_audio_processor.py:158-257)
            from .fsmn_vad import make_vad

            vad = make_vad(vad_model_dir, fs=fs)
        self.vad = vad or EnergyVAD(
            VADConfig(max_end_silence_ms=800, max_single_segment_ms=30000)
        )
        self.sim_threshold = sim_threshold
        self.summary = {
            "packages": 0, "segments": 0, "kept": 0,
            "total_duration_s": 0.0, "effective_duration_s": 0.0,
        }

    def _load_pcm_stereo(self, data: bytes) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        if pcm.size % 2 == 0:
            st = pcm.reshape(-1, 2)
            return st[:, 0].copy(), st[:, 1].copy()
        return pcm, None

    def process_package(self, zip_path: str) -> List[Dict]:
        """One device zip → list of kept segment records (+ files)."""
        name = os.path.splitext(os.path.basename(zip_path))[0]
        records: List[Dict] = []
        tfilter = TextFilter(self.sim_threshold)
        with zipfile.ZipFile(zip_path) as zf:
            members = [m for m in zf.namelist()
                       if m.lower().endswith((".pcm", ".raw", ".wav"))]
            for member in sorted(members):
                data = zf.read(member)
                if member.lower().endswith(".wav"):
                    from ..audio.io import read_wav

                    x, sr = read_wav(data)
                    if x.ndim > 1:
                        mic, ref = x[:, 0], x[:, 1] if x.shape[1] > 1 else None
                    else:
                        mic, ref = x, None
                else:
                    mic, ref = self._load_pcm_stereo(data)
                if self.echo_cancel and ref is not None:
                    mic = nlms_echo_cancel(mic, ref)
                self.summary["total_duration_s"] += len(mic) / self.fs

                segs = self.vad.cut(mic)
                self.summary["segments"] += len(segs)
                texts = (
                    self.transcribe_fn(segs)
                    if (self.transcribe_fn and segs) else [""] * len(segs)
                )
                base = re.sub(r"[^\w\-]", "_", f"{name}_{member}")
                for i, (seg, text) in enumerate(zip(segs, texts)):
                    if self.transcribe_fn and not tfilter.accept(text):
                        continue
                    key = f"{base}_{i:04d}"
                    wav_path = os.path.join(self.audio_dir, f"{key}.wav")
                    write_wav(wav_path, seg, self.fs)
                    dur = len(seg) / self.fs
                    self.summary["kept"] += 1
                    self.summary["effective_duration_s"] += dur
                    records.append(
                        {"key": key, "wav": wav_path, "text": text,
                         "duration": dur, "package": name}
                    )
        self.summary["packages"] += 1
        jsonl = os.path.join(self.output_dir, f"{name}.jsonl")
        with open(jsonl, "w", encoding="utf-8") as f:
            for r in records:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        return records

    def batch_process(
        self,
        zip_dir: str,
        package_filter: Optional[PackageFilter] = None,
    ) -> Dict:
        """All matching zips in a dir → records + processing_summary.json
        (reference :1183-1344)."""
        zips = sorted(
            os.path.join(zip_dir, f) for f in os.listdir(zip_dir)
            if f.endswith(".zip")
        )
        if package_filter:
            zips = [z for z in zips
                    if package_filter.matches(os.path.basename(z))]
        for z in zips:
            try:
                self.process_package(z)
            except Exception as e:
                print(f"[audio_processor] {z} failed: {e}")
        s = dict(self.summary)
        s["effective_ratio"] = (
            s["effective_duration_s"] / s["total_duration_s"]
            if s["total_duration_s"] else 0.0
        )
        with open(os.path.join(self.output_dir, "processing_summary.json"),
                  "w") as f:
            json.dump(s, f, indent=2)
        return s
