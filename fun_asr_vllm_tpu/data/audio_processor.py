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


class AudioFilter:
    """Transcript-quality filter with the reference's full machinery
    (simple_audio_processor.py:260-537): punctuation stripping, 3-rule
    noise detection (too short / noise-word ratio / low char diversity),
    longest-first dedup with Jaccard similarity AND containment
    detection, and deletion of the rejected segments' audio files."""

    CHINESE_PUNCT = set(",.?!:，。！？；：“”‘’（）【】《》、")
    DEFAULT_NOISE_WORDS = ("嗯", "啊", "呃", "哦", "哈", "嘿", "哼", "咳", "喂")

    def __init__(
        self,
        min_chars_no_punct: int = 3,
        similarity_threshold: float = 0.6,
        noise_indicators: Optional[Sequence[str]] = None,
        text_key: str = "text",
        path_key: str = "wav",
        name_key: str = "key",
        remove_files: bool = True,
    ) -> None:
        self.min_chars_no_punct = min_chars_no_punct
        self.similarity_threshold = similarity_threshold
        self.noise_indicators = list(noise_indicators
                                     or self.DEFAULT_NOISE_WORDS)
        self.text_key = text_key
        self.path_key = path_key
        self.name_key = name_key
        self.remove_files = remove_files
        self.stats = {"noise": 0, "dup": 0, "contained": 0, "kept": 0}

    def remove_punctuation(self, text: str) -> str:
        if not text:
            return ""
        for p in self.CHINESE_PUNCT:
            text = text.replace(p, "")
        return re.sub(r"[^\w\s]", "", text).strip()

    def calculate_similarity(self, a: str, b: str) -> float:
        return jaccard_char_similarity(a, b)

    def is_noise_text(self, text: str) -> bool:
        """The reference's 3 noise rules (:323-353)."""
        if not text:
            return True
        clean = self.remove_punctuation(text)
        # rule 1: too short without punctuation
        if len(clean) <= self.min_chars_no_punct:
            return True
        # rule 2: noise filler words dominate a short utterance
        noise_words = [w for w in self.noise_indicators if w in text]
        if noise_words and len(clean) <= 5:
            if len("".join(noise_words)) / len(clean) > 0.5:
                return True
        # rule 3: character diversity below 30% (stutter/noise)
        if len(set(clean)) < len(clean) * 0.3:
            return True
        return False

    def _is_text_contained(self, longer: str, shorter: str) -> bool:
        """Containment check ignoring punctuation and case (:451-476)."""
        if not longer or not shorter:
            return False
        cl, cs = self.remove_punctuation(longer), self.remove_punctuation(shorter)
        if len(cs) > len(cl):
            return False
        return cs.lower() in cl.lower()

    def _remove_audio_file(self, rec: Dict) -> None:
        if not self.remove_files:
            return
        path = rec.get(self.path_key)
        try:
            if path and os.path.exists(path):
                os.remove(path)
        except OSError:
            pass

    def filter_results(self, results: List[Dict]) -> List[Dict]:
        """Noise pass, then longest-first dedup + containment
        (:359-449). Rejected records' audio files are deleted. Output is
        sorted by name."""
        kept_after_noise = []
        for rec in results:
            if self.is_noise_text(rec.get(self.text_key, "")):
                self.stats["noise"] += 1
                self._remove_audio_file(rec)
            else:
                kept_after_noise.append(rec)
        if len(kept_after_noise) <= 1:
            self.stats["kept"] += len(kept_after_noise)
            return kept_after_noise

        # longest clean text first, so duplicates fold into the richest row
        ordered = sorted(
            kept_after_noise,
            key=lambda r: len(self.remove_punctuation(r.get(self.text_key, ""))),
            reverse=True,
        )
        removed = set()
        kept: List[Dict] = []
        for i, rec in enumerate(ordered):
            if i in removed:
                continue
            cur_clean = self.remove_punctuation(rec.get(self.text_key, ""))
            cur_full = rec.get(self.text_key, "")
            kept.append(rec)
            for j in range(i + 1, len(ordered)):
                if j in removed:
                    continue
                other = ordered[j]
                other_clean = self.remove_punctuation(
                    other.get(self.text_key, "")
                )
                sim = self.calculate_similarity(cur_clean, other_clean)
                contained = self._is_text_contained(
                    cur_full, other.get(self.text_key, "")
                )
                if sim >= self.similarity_threshold or contained:
                    self.stats["contained" if contained else "dup"] += 1
                    removed.add(j)
                    self._remove_audio_file(other)
        self.stats["kept"] += len(kept)
        return sorted(kept, key=lambda r: str(r.get(self.name_key, "")))


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
            "processed_audios": 0, "successful_transcriptions": 0,
            "failed_transcriptions": 0, "packages_skipped_filter": 0,
            "zip_files_total": 0, "filtered_results": 0,
        }
        # date-grouped duration accounting (reference per-date stats)
        self.duration_by_date: Dict[str, Dict[str, float]] = {}

    def _load_pcm_stereo(self, data: bytes) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        if pcm.size % 2 == 0:
            st = pcm.reshape(-1, 2)
            return st[:, 0].copy(), st[:, 1].copy()
        return pcm, None

    @staticmethod
    def _package_date(name: str) -> str:
        m = re.search(r"(20\d{6})", name)
        return m.group(1) if m else "unknown"

    def process_package(self, zip_path: str) -> List[Dict]:
        """One device zip → kept segment records (+ files). Segments are
        all transcribed first, then filtered with the reference's
        AudioFilter (noise → dedup/containment, rejected files deleted)."""
        name = os.path.splitext(os.path.basename(zip_path))[0]
        date = self._package_date(name)
        dstat = self.duration_by_date.setdefault(
            date, {"original_s": 0.0, "final_s": 0.0}
        )
        records: List[Dict] = []
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
                self.summary["processed_audios"] += 1
                dstat["original_s"] += len(mic) / self.fs

                segs = self.vad.cut(mic)
                self.summary["segments"] += len(segs)
                try:
                    texts = (
                        self.transcribe_fn(segs)
                        if (self.transcribe_fn and segs) else [""] * len(segs)
                    )
                    self.summary["successful_transcriptions"] += len(segs)
                except Exception as e:
                    print(f"[audio_processor] transcribe failed: {e}")
                    texts = [""] * len(segs)
                    self.summary["failed_transcriptions"] += len(segs)
                base = re.sub(r"[^\w\-]", "_", f"{name}_{member}")
                for i, (seg, text) in enumerate(zip(segs, texts)):
                    key = f"{base}_{i:04d}"
                    wav_path = os.path.join(self.audio_dir, f"{key}.wav")
                    write_wav(wav_path, seg, self.fs)
                    records.append(
                        {"key": key, "wav": wav_path, "text": text,
                         "duration": len(seg) / self.fs, "package": name,
                         "audio_type": "vad_segment"}
                    )

        if self.transcribe_fn:
            filt = AudioFilter(similarity_threshold=self.sim_threshold)
            kept = filt.filter_results(records)
            self.summary["filtered_results"] += len(records) - len(kept)
        else:
            kept = records
        for r in kept:
            self.summary["kept"] += 1
            self.summary["effective_duration_s"] += r["duration"]
            dstat["final_s"] += r["duration"]
        self.summary["packages"] += 1
        jsonl = os.path.join(self.output_dir, f"{name}.jsonl")
        with open(jsonl, "w", encoding="utf-8") as f:
            for r in kept:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        # per-package report (Excel when openpyxl exists, else CSV —
        # reference per-package Excel, :1082-1181)
        from .cat_cut import _write_report

        _write_report(
            os.path.join(self.output_dir, f"{name}.xlsx"),
            ("key", "wav", "text", "duration", "package"), kept,
        )
        return kept

    def batch_process(
        self,
        zip_dir: str,
        package_filter: Optional[PackageFilter] = None,
    ) -> Dict:
        """All matching zips in a dir → records + consolidated report +
        processing_summary.json with the reference's stats shape
        (reference :1126-1344)."""
        all_zips = sorted(
            os.path.join(zip_dir, f) for f in os.listdir(zip_dir)
            if f.endswith(".zip")
        )
        self.summary["zip_files_total"] = len(all_zips)
        zips = all_zips
        if package_filter:
            zips = [z for z in all_zips
                    if package_filter.matches(os.path.basename(z))]
            self.summary["packages_skipped_filter"] = (
                len(all_zips) - len(zips)
            )
        all_records: List[Dict] = []
        for z in zips:
            try:
                all_records.extend(self.process_package(z))
            except Exception as e:
                print(f"[audio_processor] {z} failed: {e}")

        from .cat_cut import _write_report

        _write_report(
            os.path.join(self.output_dir, "consolidated.xlsx"),
            ("key", "wav", "text", "duration", "package"), all_records,
        )
        s = dict(self.summary)
        ok, fail = (s["successful_transcriptions"],
                    s["failed_transcriptions"])
        report = {
            "summary": {
                "total_packages": s["packages"],
                "zip_files_total": s["zip_files_total"],
                "packages_skipped_filter": s["packages_skipped_filter"],
                "total_processed_audios": s["processed_audios"],
                "successful_transcriptions": ok,
                "failed_transcriptions": fail,
                "vad_segments": s["segments"],
                "filtered_results": s["filtered_results"],
                "final_results": s["kept"],
                "original_total_duration": round(s["total_duration_s"], 2),
                "final_total_duration": round(s["effective_duration_s"], 2),
                "effective_ratio": round(
                    s["effective_duration_s"] / s["total_duration_s"], 4
                ) if s["total_duration_s"] else 0.0,
                "success_rate": ok / (ok + fail) if (ok + fail) else 0,
            },
            "type_statistics": {
                t: sum(1 for r in all_records if r.get("audio_type") == t)
                for t in {r.get("audio_type") for r in all_records}
            },
            "duration_statistics": {
                "原始长音频总时长(秒)": round(s["total_duration_s"], 2),
                "最终保留音频总时长(秒)": round(s["effective_duration_s"], 2),
                "有效数据比例": (
                    f"{s['effective_duration_s'] / s['total_duration_s'] * 100:.2f}%"
                    if s["total_duration_s"] else "0.00%"
                ),
            },
            "duration_by_date": {
                d: {k: round(v, 2) for k, v in stats.items()}
                for d, stats in sorted(self.duration_by_date.items())
            },
            "sample_results": all_records[:5],
        }
        with open(os.path.join(self.output_dir, "processing_summary.json"),
                  "w", encoding="utf-8") as f:
            json.dump(report, f, ensure_ascii=False, indent=2)
        # flat keys kept for backwards compatibility with round-1 callers
        s["effective_ratio"] = report["summary"]["effective_ratio"]
        return s


def main(argv=None):
    """CLI matching the reference's simple_audio_processor surface
    (reference simple_audio_processor.py:1347-1400): batch-process
    device-recorded *.zip packages into a training corpus."""
    import argparse

    p = argparse.ArgumentParser(
        description="Zip-package audio processor (NLMS echo cancel + VAD "
                    "segmentation + ASR + filtering + reports)"
    )
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--output_dir", default="./simple_results")
    p.add_argument("--asr_model", default=None,
                   help="model dir for transcription (engine-backed): "
                        "a Fun-ASR config.yaml dir OR a Qwen3-ASR-style "
                        "HF checkpoint dir (the reference's Qwen3-ASR-"
                        "1.7B seam, simple_audio_processor.py:791-822); "
                        "omit to skip transcription")
    p.add_argument("--vad_model", default="fsmn-vad",
                   help="fsmn-vad (weights via --vad_model_dir), "
                        "fireredvad, or energy")
    p.add_argument("--vad_model_dir", default=None)
    p.add_argument("--device", default=None,
                   help="kept for reference-CLI parity (TPU selection is "
                        "via FUN_ASR_PLATFORM)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float16", "bfloat16", "float32"))
    p.add_argument("--no_progress", action="store_true")
    p.add_argument("--keep_empty", action="store_true")
    p.add_argument("--no_consolidate", action="store_true")
    p.add_argument("--disable_filter", action="store_true")
    p.add_argument("--min_chars", type=int, default=2)
    p.add_argument("--similarity", type=float, default=0.6)
    p.add_argument("--no_echo_cancel", action="store_true")
    p.add_argument(
        "--package_filter", action="append", default=None,
        metavar="DEVICE:START:END",
        help="process only matching packages; repeatable. Format: "
             "deviceID:YYYYMMDD:YYYYMMDD (inclusive)",
    )
    args = p.parse_args(argv)

    transcribe_fn = None
    if args.asr_model:
        from ..pipeline import BatchPipeline

        pipe = BatchPipeline(args.asr_model, dtype=args.dtype)
        transcribe_fn = pipe.transcribe_batch

    pkg_filter = None
    if args.package_filter:
        filters = [PackageFilter.parse(s) for s in args.package_filter]

        class _Any:
            def matches(self, filename):
                return any(f.matches(filename) for f in filters)

        pkg_filter = _Any()

    proc = SimpleAudioProcessor(
        args.output_dir,
        transcribe_fn=transcribe_fn,
        echo_cancel=not args.no_echo_cancel,
        vad_model_dir=args.vad_model_dir,
        sim_threshold=0.0 if args.disable_filter else args.similarity,
    )
    summary = proc.batch_process(args.data_dir, package_filter=pkg_filter)
    print(json.dumps(summary, ensure_ascii=False, default=str))


if __name__ == "__main__":
    main()
