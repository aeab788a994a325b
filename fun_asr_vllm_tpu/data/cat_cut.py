"""Concat / align / split re-recording pipeline (the reference
run_audio_cat_cut.py:1-1248 surface, 5 stages).

S1 `stage1_concat`: group utterances into duration classes {5,10,20,30} s,
    pad each to its class length, concatenate into long WAVs with −5 dBFS
    peak normalization, and write a JSONL manifest of (key, class, offset)
    (reference :210-274).
S2 `stage2_align`: align a re-recorded capture against the reference
    signal via speech-onset-anchored FFT normalized cross-correlation
    (reference `_find_offset_xcorr` :300, :277-431), multi-channel aware.
S3 `stage3_split`: re-split the aligned recording at manifest boundaries
    and restore per-key text (reference :446-519).
S4 `stage4_asr_eval`: transcribe every segment with the TPU pipeline and
    score per-segment WER (reference :549-663); CSV report (openpyxl not
    present in this image; Excel written when available).
S5 `stage5_filter_wer`: keep rows whose WER passes per-range thresholds
    ``start:end:thr`` (reference :789-871).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..audio.io import read_wav, write_wav
from ..text.wer import compute_wer_line

FS = 16000
DURATION_CLASSES = (5, 10, 20, 30)  # seconds


def peak_normalize(x: np.ndarray, dbfs: float = -5.0) -> np.ndarray:
    peak = float(np.abs(x).max())
    if peak < 1e-9:
        return x
    target = 10 ** (dbfs / 20.0)
    return (x * (target / peak)).astype(np.float32)


def stage1_concat(
    wav_scp: Sequence[Tuple[str, str]],
    out_dir: str,
    max_seconds_per_file: float = 12 * 3600,
) -> List[str]:
    """→ list of manifest paths; each manifest row:
    {key, class_s, offset_s, dur_s, wav}."""
    os.makedirs(out_dir, exist_ok=True)
    groups: Dict[int, List[Tuple[str, np.ndarray]]] = {c: [] for c in
                                                       DURATION_CLASSES}
    for key, path in wav_scp:
        x, sr = read_wav(path)
        if x.ndim > 1:
            x = x.mean(axis=1)
        if sr != FS:
            from ..audio.io import resample

            x = resample(x, sr, FS)
        dur = len(x) / FS
        cls = next((c for c in DURATION_CLASSES if dur <= c), None)
        if cls is None:
            print(f"[cat_cut] skip {key}: {dur:.1f}s exceeds max class")
            continue
        groups[cls].append((key, x))

    manifests = []
    for cls, items in groups.items():
        if not items:
            continue
        per_file = int(max_seconds_per_file // cls)
        for fidx in range(0, len(items), per_file):
            chunk = items[fidx : fidx + per_file]
            buf = np.zeros(len(chunk) * cls * FS, dtype=np.float32)
            rows = []
            for i, (key, x) in enumerate(chunk):
                off = i * cls * FS
                buf[off : off + len(x)] = x
                rows.append(
                    {"key": key, "class_s": cls, "offset_s": i * cls,
                     "dur_s": len(x) / FS}
                )
            buf = peak_normalize(buf)
            wav_path = os.path.join(
                out_dir, f"concat_{cls}s_{fidx // per_file:03d}.wav"
            )
            write_wav(wav_path, buf, FS)
            man_path = wav_path.replace(".wav", ".jsonl")
            with open(man_path, "w", encoding="utf-8") as f:
                for r in rows:
                    r["wav"] = wav_path
                    f.write(json.dumps(r, ensure_ascii=False) + "\n")
            manifests.append(man_path)
    return manifests


def find_offset_xcorr(
    recorded: np.ndarray,
    reference: np.ndarray,
    search_seconds: float = 30.0,
    anchor_seconds: float = 5.0,
) -> int:
    """Offset (samples) of `reference`'s start inside `recorded` via FFT
    normalized cross-correlation on a speech-onset anchor window
    (reference run_audio_cat_cut.py:300-358)."""
    # anchor: first region of the reference with real energy
    hop = FS // 100
    n_anchor = int(anchor_seconds * FS)
    energies = np.abs(reference[: len(reference) // hop * hop].reshape(-1, hop)
                      ).mean(axis=1)
    thresh = energies.max() * 0.1 if energies.size else 0.0
    onset = int(np.argmax(energies > thresh)) * hop if energies.size else 0
    anchor = reference[onset : onset + n_anchor]
    window = recorded[: int(search_seconds * FS) + n_anchor]

    n = len(window) + len(anchor)
    nfft = 1
    while nfft < n:
        nfft *= 2
    W = np.fft.rfft(window, nfft)
    A = np.fft.rfft(anchor[::-1], nfft)
    corr = np.fft.irfft(W * A, nfft)[len(anchor) - 1 : len(window)]
    # normalize by local energy to avoid loud-region bias
    csum = np.cumsum(np.concatenate([[0.0], window.astype(np.float64) ** 2]))
    local = np.sqrt(
        csum[len(anchor):] - csum[: len(window) - len(anchor) + 1]
    ) + 1e-9
    score = corr[: len(local)] / local
    best = int(np.argmax(score))
    return best - onset


def stage2_align(
    recorded_path: str,
    reference_path: str,
    out_path: str,
    search_seconds: float = 30.0,
) -> int:
    """Write the recorded signal time-aligned to the reference. → offset."""
    rec, sr_r = read_wav(recorded_path, always_2d=True)
    ref, sr_f = read_wav(reference_path)
    if ref.ndim > 1:
        ref = ref.mean(axis=1)
    mono = rec.mean(axis=1)
    offset = find_offset_xcorr(mono, ref, search_seconds)
    offset = max(offset, 0)
    aligned = rec[offset : offset + len(ref)]
    if len(aligned) < len(ref):
        aligned = np.pad(aligned, ((0, len(ref) - len(aligned)), (0, 0)))
    write_wav(out_path, aligned if rec.shape[1] > 1 else aligned[:, 0], sr_r)
    return offset


def stage3_split(
    aligned_path: str,
    manifest_path: str,
    out_dir: str,
    text_map: Optional[Dict[str, str]] = None,
) -> List[Tuple[str, str]]:
    """Cut the aligned recording at manifest boundaries → wav.scp rows
    (+text written when text_map given)."""
    os.makedirs(out_dir, exist_ok=True)
    x, sr = read_wav(aligned_path)
    if x.ndim > 1:
        x = x.mean(axis=1)
    rows = []
    texts = []
    with open(manifest_path, "r", encoding="utf-8") as f:
        for line in f:
            r = json.loads(line)
            s = int(r["offset_s"] * sr)
            e = s + int(r["dur_s"] * sr)
            seg = x[s:e]
            p = os.path.join(out_dir, f"{r['key']}.wav")
            write_wav(p, seg, sr)
            rows.append((r["key"], p))
            if text_map and r["key"] in text_map:
                texts.append((r["key"], text_map[r["key"]]))
    from .kaldi import write_scp

    write_scp(os.path.join(out_dir, "wav.scp"), rows)
    if texts:
        write_scp(os.path.join(out_dir, "text"), texts)
    return rows


def stage4_asr_eval(
    pipe,
    wav_scp: Sequence[Tuple[str, str]],
    text_map: Dict[str, str],
    out_csv: str,
    batch_size: int = 16,
) -> List[Dict]:
    """Transcribe + per-segment WER → CSV rows (reference :549-663)."""
    from ..audio.io import load_audio

    rows: List[Dict] = []
    for i in range(0, len(wav_scp), batch_size):
        batch = wav_scp[i : i + batch_size]
        try:
            wavs = [load_audio(p, fs=FS) for _, p in batch]
            hyps = pipe.transcribe_batch(wavs)
        except Exception as e:  # per-batch failure → empty rows (ref :638-641)
            print(f"[cat_cut] batch failed: {e}")
            hyps = [""] * len(batch)
        for (key, path), hyp in zip(batch, hyps):
            ref = text_map.get(key, "")
            wer = compute_wer_line(ref, hyp)["stats"]["wer"] if ref else -1.0
            rows.append({"key": key, "wav": path, "ref": ref, "hyp": hyp,
                         "wer": wer})
    with open(out_csv, "w", encoding="utf-8") as f:
        f.write("key,wav,ref,hyp,wer\n")
        for r in rows:
            f.write(
                ",".join(
                    str(r[c]).replace(",", "，") for c in
                    ("key", "wav", "ref", "hyp", "wer")
                ) + "\n"
            )
    return rows


def parse_wer_ranges(spec: str) -> List[Tuple[float, float, float]]:
    """'0:10:20,10:30:15' → [(0,10,20.0), (10,30,15.0)] (reference :789)."""
    out = []
    for part in spec.split(","):
        s, e, thr = part.split(":")
        out.append((float(s), float(e), float(thr)))
    return out


def stage5_filter_wer(
    rows: Sequence[Dict],
    ranges: Sequence[Tuple[float, float, float]],
    duration_of=None,
) -> List[Dict]:
    """Keep rows whose WER ≤ the threshold of their duration range."""
    kept = []
    for r in rows:
        dur = duration_of(r) if duration_of else r.get("dur_s", 0.0)
        thr = next(
            (t for s, e, t in ranges if s <= dur < e), ranges[-1][2]
        )
        if 0 <= r["wer"] <= thr:
            kept.append(r)
    return kept
