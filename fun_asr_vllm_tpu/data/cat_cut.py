"""Concat / align / split re-recording pipeline (the reference
run_audio_cat_cut.py:1-1248 surface, 5 stages + merged driver + CLI).

S1 `stage1_concat`: group utterances into duration classes {5,10,20,30} s,
    pad each to its class length, concatenate into long WAVs with −5 dBFS
    peak normalization, and write a JSONL manifest of (key, class, offset)
    (reference :210-274).
S2 `stage2_align`: align re-recorded 1ch and 4ch PCM captures against the
    reference signal via speech-onset-anchored FFT normalized
    cross-correlation (reference `_find_offset_xcorr` :300-358); the
    4-channel output streams through a chunked WAV/RF64 writer
    (reference :400-420).
S3 `stage3_split`: fixed-length re-split of the aligned 1ch (and paired
    4ch) recording with per-segment text_tn/text_itn restore
    (reference :446-519).
S4 `stage4_asr_eval`: transcribe every segment and score per-segment WER
    → report with columns (wav_name, text, asr, wer); Excel when openpyxl
    is available, CSV otherwise (reference :549-663).
S5 `stage5_filter_wer`: keep ch1 rows passing per-ROW-INDEX-range WER
    thresholds ``START:END:THR`` + a global cap; the 4ch report is synced
    by row index, and aligned/ intermediates are deleted
    (reference :789-871).
`run_align_split_asr`: merged align → split → dual ASR driver
    (reference :874-975); argparse subcommands mirror :978-1090.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..audio.io import StreamingWavWriter, load_pcm, read_wav, write_wav
from ..text.wer import compute_wer_line

logger = logging.getLogger(__name__)

FS = 16000
SAMPLE_RATE = 16000
DURATION_CLASSES = (5, 10, 20, 30)  # seconds
WRITE_4CH_PCM_CHUNK_FRAMES = 16000 * 600  # 10 min of frames per chunk


def peak_normalize(x: np.ndarray, dbfs: float = -5.0) -> np.ndarray:
    peak = float(np.abs(x).max())
    if peak < 1e-9:
        return x
    target = 10 ** (dbfs / 20.0)
    return (x * (target / peak)).astype(np.float32)


def pad_silence(x: np.ndarray, n: int) -> np.ndarray:
    return np.pad(x, (0, max(0, n - len(x)))) if len(x) < n else x


def pad_silence_mc(x: np.ndarray, n: int) -> np.ndarray:
    return (np.pad(x, ((0, max(0, n - len(x))), (0, 0)))
            if len(x) < n else x)


def load_audio_mono(path: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    x, r = read_wav(path)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if r != sr:
        from ..audio.io import resample

        x = resample(x, r, sr)
    return x.astype(np.float32)


# ------------------------------ stage 1 -------------------------------------


def stage1_concat(
    wav_scp: Sequence[Tuple[str, str]],
    out_dir: str,
    max_seconds_per_file: float = 12 * 3600,
    text_tn: Optional[Dict[str, str]] = None,
    text_itn: Optional[Dict[str, str]] = None,
    wav2dur: Optional[Dict[str, str]] = None,
    sample_rate: int = FS,
) -> List[str]:
    """Group utterances by duration class, pad each to the class length,
    concat into ~12 h WAVs at −5 dBFS peak (reference
    run_audio_cat_cut.py:210-274). Emits per concat file:
    `{cls}s_{idx:02d}.wav` + `…_tn.txt` / `…_itn.txt` text lists
    (utt_id<TAB>text — the inputs stage 3's text restore consumes) +
    a `….jsonl` manifest ({key, class_s, offset_s, dur_s, wav}).
    → list of manifest paths.

    With `wav2dur` (utt → seconds), grouping avoids decoding every file
    up front; otherwise durations come from the audio itself."""
    os.makedirs(out_dir, exist_ok=True)
    text_tn = text_tn or {}
    text_itn = text_itn or {}
    sr_out = int(sample_rate)

    def _load(path: str) -> np.ndarray:
        x, sr = read_wav(path)
        if x.ndim > 1:
            x = x.mean(axis=1)
        if sr != sr_out:
            from ..audio.io import resample

            x = resample(x, sr, sr_out)
        return x

    groups: Dict[int, List[Tuple[str, str]]] = {c: [] for c in
                                                DURATION_CLASSES}
    for key, path in wav_scp:
        if wav2dur is not None and key in wav2dur:
            dur = float(wav2dur[key])
        else:
            x0, sr0 = read_wav(path)
            dur = (x0.shape[0] if x0.ndim else len(x0)) / sr0
        cls = next((c for c in DURATION_CLASSES if dur <= c), None)
        if cls is None:
            logger.warning("skip %s: %.1fs exceeds max class", key, dur)
            continue
        groups[cls].append((key, path))

    manifests = []
    for cls, items in groups.items():
        if not items:
            continue
        per_file = max(1, int(max_seconds_per_file // cls))
        for fidx in range(0, len(items), per_file):
            chunk = items[fidx : fidx + per_file]
            buf = np.zeros(len(chunk) * cls * sr_out, dtype=np.float32)
            rows = []
            tn_rows, itn_rows = [], []
            for i, (key, path) in enumerate(chunk):
                x = _load(path)
                off = i * cls * sr_out
                n = min(len(x), cls * sr_out)
                buf[off : off + n] = x[:n]
                rows.append(
                    {"key": key, "class_s": cls, "offset_s": i * cls,
                     "dur_s": len(x) / sr_out}
                )
                tn_rows.append((key, text_tn.get(key, "")))
                itn_rows.append((key, text_itn.get(key, "")))
            buf = peak_normalize(buf)
            base = f"{cls}s_{fidx // per_file + 1:02d}"
            wav_path = os.path.join(out_dir, f"{base}.wav")
            write_wav(wav_path, buf, sr_out)
            _write_text_list(os.path.join(out_dir, f"{base}_tn.txt"),
                             tn_rows)
            _write_text_list(os.path.join(out_dir, f"{base}_itn.txt"),
                             itn_rows)
            man_path = wav_path.replace(".wav", ".jsonl")
            with open(man_path, "w", encoding="utf-8") as f:
                for r in rows:
                    r["wav"] = wav_path
                    f.write(json.dumps(r, ensure_ascii=False) + "\n")
            manifests.append(man_path)
    return manifests


# ------------------------------ stage 2 -------------------------------------


def _find_speech_onset(audio: np.ndarray, sr: int, frame_ms: int = 10,
                       threshold_ratio: float = 0.05,
                       min_consecutive: int = 3) -> int:
    """Sample index where speech begins (reference :277-297)."""
    frame_len = int(sr * frame_ms / 1000)
    n = len(audio) // frame_len
    if n == 0:
        return 0
    frames = audio[: n * frame_len].reshape(n, frame_len)
    rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1))
    thresh = rms.max() * threshold_ratio
    streak = 0
    for i, r in enumerate(rms):
        if r > thresh:
            streak += 1
            if streak >= min_consecutive:
                return max(0, (i - min_consecutive + 1) * frame_len)
        else:
            streak = 0
    return 0


def find_offset_xcorr(
    recorded: np.ndarray,
    reference: np.ndarray,
    search_seconds: float = 30.0,
    anchor_seconds: float = 5.0,
    fs: int = FS,
) -> int:
    """Offset such that recorded[offset:] aligns with reference[0:], via
    FFT normalized cross-correlation on a speech-onset-anchored template
    (reference run_audio_cat_cut.py:300-358)."""
    onset = _find_speech_onset(reference, fs)
    tpl_len = min(int(anchor_seconds * fs), len(reference) - onset)
    if tpl_len <= 0:
        return 0
    tpl = reference[onset : onset + tpl_len].astype(np.float64)
    region = recorded[: int(search_seconds * fs) + tpl_len].astype(np.float64)
    if len(region) < tpl_len:
        return 0

    n = len(region)
    nfft = 1
    while nfft < n + tpl_len:
        nfft *= 2
    R = np.fft.rfft(region, nfft)
    T = np.fft.rfft(tpl[::-1], nfft)
    corr = np.fft.irfft(R * T, nfft)[tpl_len - 1 : n]
    # normalized cross-correlation: divide by local window energy
    tpl_energy = float(np.sum(tpl ** 2))
    cum = np.cumsum(np.concatenate([[0.0], region ** 2]))
    valid = n - tpl_len + 1
    win_energy = cum[tpl_len:] - cum[:valid]
    denom = np.sqrt(tpl_energy * win_energy + 1e-12)
    ncc = corr[:valid] / denom
    best = int(np.argmax(ncc))
    offset = best - onset
    logger.info(
        "xcorr: onset=%d match=%d ncc=%.4f offset=%d (%.3fs)",
        onset, best, float(ncc[best]), offset, offset / fs,
    )
    return max(0, offset)


def stage2_align(
    concat_wav: str,
    recorded_1ch_pcm: str,
    recorded_4ch_pcm: Optional[str],
    output_1ch_wav: str,
    output_4ch_wav: Optional[str] = None,
    search_range_sec: float = 60.0,
    sample_rate: int = SAMPLE_RATE,
) -> Tuple[int, Optional[int]]:
    """Align recorded 1ch (+optional 4ch) PCM against the reference WAV;
    the 4ch output streams in chunks (WAV/RF64 by size,
    reference :361-431). → (offset_1ch, offset_4ch)."""
    ref = load_audio_mono(concat_wav, sample_rate)
    ref_len = len(ref)

    def _load(path, channels):
        if path.endswith((".pcm", ".raw")):
            return load_pcm(path, channels=channels)
        x, _ = read_wav(path, always_2d=channels > 1)
        return x

    rec_1ch = _load(recorded_1ch_pcm, 1)
    if rec_1ch.ndim > 1:
        rec_1ch = rec_1ch[:, 0]
    offset_1ch = find_offset_xcorr(rec_1ch, ref, search_range_sec,
                                   fs=sample_rate)
    aligned_1ch = pad_silence(rec_1ch[offset_1ch : offset_1ch + ref_len],
                              ref_len)
    os.makedirs(os.path.dirname(output_1ch_wav) or ".", exist_ok=True)
    write_wav(output_1ch_wav, aligned_1ch, sample_rate)

    offset_4ch = None
    if recorded_4ch_pcm and output_4ch_wav:
        rec_4ch = _load(recorded_4ch_pcm, 4)
        if rec_4ch.ndim == 1:
            rec_4ch = rec_4ch[:, None]
        offset_4ch = find_offset_xcorr(
            rec_4ch.mean(axis=1), ref, search_range_sec, fs=sample_rate
        )
        if offset_4ch != offset_1ch:
            logger.warning("1ch/4ch offsets differ: %d vs %d",
                           offset_1ch, offset_4ch)
        aligned_4ch = pad_silence_mc(
            rec_4ch[offset_4ch : offset_4ch + ref_len], ref_len
        )
        os.makedirs(os.path.dirname(output_4ch_wav) or ".", exist_ok=True)
        n_frames, n_ch = aligned_4ch.shape
        data_bytes = n_frames * n_ch * 2
        rf64 = data_bytes >= 4 * 1024 ** 3
        logger.info("4ch data %.2f GB → %s, chunk=%d frames",
                    data_bytes / 1024 ** 3, "RF64" if rf64 else "WAV",
                    WRITE_4CH_PCM_CHUNK_FRAMES)
        with StreamingWavWriter(output_4ch_wav, sample_rate, n_ch,
                                force_rf64=rf64) as w:
            for s in range(0, n_frames, WRITE_4CH_PCM_CHUNK_FRAMES):
                w.write(aligned_4ch[s : s + WRITE_4CH_PCM_CHUNK_FRAMES])
    return offset_1ch, offset_4ch


# ------------------------------ stage 3 -------------------------------------


def _read_text_items(path: str) -> List[Tuple[str, str]]:
    items = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t", 1)
            items.append((parts[0], parts[1] if len(parts) > 1 else ""))
    return items


def _write_text_list(path: str, items: Sequence[Tuple[str, str]]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for k, t in items:
            f.write(f"{k}\t{t}\n")


def stage3_split(
    aligned_wav: str,
    concat_tn_txt: str,
    concat_itn_txt: str,
    output_dir: str,
    segment_sec: float = 10.0,
    sample_rate: int = SAMPLE_RATE,
    aligned_wav_4ch: Optional[str] = None,
    output_dir_4ch: Optional[str] = None,
) -> int:
    """Fixed-length re-split with text_tn/text_itn restore; the optional
    4ch recording is split at the same boundaries (reference :446-519).
    → number of segments."""
    audio = load_audio_mono(aligned_wav, sample_rate)
    seg = int(segment_sec * sample_rate)
    tn_items = _read_text_items(concat_tn_txt)
    itn_items = _read_text_items(concat_itn_txt)
    if len(tn_items) != len(itn_items):
        logger.warning("text_tn (%d) vs text_itn (%d) line counts differ",
                       len(tn_items), len(itn_items))
    n_segs = min(len(tn_items), len(itn_items))
    base = Path(aligned_wav).stem
    os.makedirs(output_dir, exist_ok=True)
    new_tn, new_itn = [], []
    for idx in range(n_segs):
        piece = pad_silence(audio[idx * seg : (idx + 1) * seg], seg)
        name = f"{base}_{idx + 1:04d}"
        write_wav(os.path.join(output_dir, f"{name}.wav"), piece, sample_rate)
        new_tn.append((name, tn_items[idx][1]))
        new_itn.append((name, itn_items[idx][1]))
    _write_text_list(os.path.join(output_dir, f"{base}_text_tn.txt"), new_tn)
    _write_text_list(os.path.join(output_dir, f"{base}_text_itn.txt"), new_itn)

    if aligned_wav_4ch and output_dir_4ch:
        audio4, sr = read_wav(aligned_wav_4ch, always_2d=True)
        if sr != sample_rate:
            raise ValueError(f"4ch rate {sr} != {sample_rate}")
        base4 = Path(aligned_wav_4ch).stem
        os.makedirs(output_dir_4ch, exist_ok=True)
        tn4, itn4 = [], []
        for idx in range(n_segs):
            piece = pad_silence_mc(audio4[idx * seg : (idx + 1) * seg], seg)
            name = f"{base4}_{idx + 1:04d}"
            write_wav(os.path.join(output_dir_4ch, f"{name}.wav"), piece,
                      sample_rate)
            tn4.append((name, tn_items[idx][1]))
            itn4.append((name, itn_items[idx][1]))
        _write_text_list(
            os.path.join(output_dir_4ch, f"{base4}_text_tn.txt"), tn4
        )
        _write_text_list(
            os.path.join(output_dir_4ch, f"{base4}_text_itn.txt"), itn4
        )
    return n_segs


def split_by_manifest(
    aligned_path: str,
    manifest_path: str,
    out_dir: str,
    text_map: Optional[Dict[str, str]] = None,
) -> List[Tuple[str, str]]:
    """Manifest-boundary split (stage1's jsonl) → wav.scp rows."""
    os.makedirs(out_dir, exist_ok=True)
    x, sr = read_wav(aligned_path)
    if x.ndim > 1:
        x = x.mean(axis=1)
    rows, texts = [], []
    with open(manifest_path, "r", encoding="utf-8") as f:
        for line in f:
            r = json.loads(line)
            s = int(r["offset_s"] * sr)
            e = s + int(r["dur_s"] * sr)
            p = os.path.join(out_dir, f"{r['key']}.wav")
            write_wav(p, x[s:e], sr)
            rows.append((r["key"], p))
            if text_map and r["key"] in text_map:
                texts.append((r["key"], text_map[r["key"]]))
    from .kaldi import write_scp

    write_scp(os.path.join(out_dir, "wav.scp"), rows)
    if texts:
        write_scp(os.path.join(out_dir, "text"), texts)
    return rows


# ------------------------------ stage 4 -------------------------------------


def _write_report(path: str, headers: Sequence[str],
                  rows: Sequence[Dict]) -> str:
    """Excel via openpyxl when available (reference format), CSV fallback.
    Returns the actual path written."""
    try:
        from openpyxl import Workbook

        wb = Workbook()
        ws = wb.active
        ws.append(list(headers))
        for r in rows:
            ws.append([r.get(h, "") for h in headers])
        wb.save(path)
        return path
    except ImportError:
        csv_path = os.path.splitext(path)[0] + ".csv"
        with open(csv_path, "w", encoding="utf-8") as f:
            f.write(",".join(headers) + "\n")
            for r in rows:
                f.write(",".join(
                    str(r.get(h, "")).replace(",", "，") for h in headers
                ) + "\n")
        return csv_path


def _read_report(path: str) -> Tuple[List[str], List[Dict]]:
    """Read an Excel or CSV report back → (headers, rows)."""
    if path.endswith(".xlsx") and os.path.exists(path):
        from openpyxl import load_workbook

        ws = load_workbook(path).active
        it = ws.iter_rows(values_only=True)
        headers = [str(h) for h in next(it)]
        return headers, [dict(zip(headers, row)) for row in it]
    csv_path = (path if path.endswith(".csv")
                else os.path.splitext(path)[0] + ".csv")
    with open(csv_path, "r", encoding="utf-8") as f:
        headers = f.readline().strip().split(",")
        rows = [dict(zip(headers, line.rstrip("\n").split(",")))
                for line in f if line.strip()]
    return headers, rows


def stage4_asr_eval(
    segments_dir: str,
    text_file: str,
    output_report: str,
    transcribe_fn=None,
    pipe=None,
    batch_size: int = 16,
    multichannel_downmix: bool = False,
) -> List[Dict]:
    """Transcribe every split segment + per-segment WER → report rows
    (wav_name, text, asr, wer — the reference Excel columns :549-663).
    `transcribe_fn([wav arrays]) → [texts]` or a BatchPipeline via
    `pipe`."""
    if transcribe_fn is None and pipe is not None:
        transcribe_fn = pipe.transcribe_batch
    if transcribe_fn is None:
        raise ValueError("need transcribe_fn or pipe")
    items = _read_text_items(text_file)
    rows: List[Dict] = []
    for i in range(0, len(items), batch_size):
        batch = items[i : i + batch_size]
        wavs = []
        for name, _ in batch:
            x, sr = read_wav(os.path.join(segments_dir, f"{name}.wav"))
            if x.ndim > 1:
                # multichannel downmix before ASR (reference :524-547)
                x = x.mean(axis=1) if multichannel_downmix else x[:, 0]
            wavs.append(x.astype(np.float32))
        try:
            hyps = transcribe_fn(wavs)
        except Exception as e:  # per-batch failure → empty rows (ref :638)
            logger.error("ASR batch failed: %s", e)
            hyps = [""] * len(batch)
        for (name, ref_text), hyp in zip(batch, hyps):
            wer = (compute_wer_line(ref_text, hyp)["stats"]["wer"]
                   if ref_text else -1.0)
            rows.append({"wav_name": name, "text": ref_text, "asr": hyp,
                         "wer": wer})
    _write_report(output_report, ("wav_name", "text", "asr", "wer"), rows)
    return rows


# ------------------------------ stage 5 -------------------------------------


def _parse_wer_range_spec(spec: str) -> Tuple[int, int, float]:
    """'START:END:THR' → (start_row, end_row, threshold) — 0-based data
    ROW indices, closed interval (reference :700-720)."""
    s, e, thr = spec.split(":")
    return int(s), int(e), float(thr)


def parse_wer_ranges(spec: str) -> List[Tuple[int, int, float]]:
    """Comma- or space-separated range specs."""
    parts = spec.replace(",", " ").split()
    return [_parse_wer_range_spec(p) for p in parts]


def _kept_row_indices(rows: Sequence[Dict],
                      ranges: Sequence[Tuple[int, int, float]],
                      global_max_wer: float) -> List[int]:
    kept = []
    for i, r in enumerate(rows):
        try:
            wer = float(r.get("wer", -1))
        except (TypeError, ValueError):
            continue
        thr = global_max_wer
        for s, e, t in ranges:
            if s <= i <= e:
                thr = min(thr, t)
        if 0 <= wer <= thr:
            kept.append(i)
    return kept


def stage5_filter_wer(
    output_dir: str,
    range_specs: Sequence[str],
    global_max_wer: float = 1.0,
    excel_ch1: Optional[str] = None,
    excel_ch4: Optional[str] = None,
) -> Tuple[int, int]:
    """Filter the ch1 report by row-index WER ranges; sync the ch4 report
    by the SAME kept row indices (never by its own WER); delete aligned/
    afterwards (reference :789-871). → (kept_ch1, kept_ch4)."""
    d = output_dir
    ranges = [_parse_wer_range_spec(s) for s in range_specs]
    excel_ch1 = excel_ch1 or os.path.join(d, "asr_wer_ch1.xlsx")
    excel_ch4 = excel_ch4 or os.path.join(d, "asr_wer_ch4.xlsx")
    headers1, data1 = _read_report(excel_ch1)
    kept_idx = _kept_row_indices(data1, ranges, global_max_wer)
    kept_ch1 = [data1[i] for i in kept_idx]
    seg_dir = os.path.join(d, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    p1 = Path(excel_ch1)
    _write_report(os.path.join(seg_dir, f"{p1.stem}_filter{p1.suffix}"),
                  headers1, kept_ch1)
    logger.info("ch1: kept %d/%d rows", len(kept_ch1), len(data1))

    kept4 = 0
    ch4_src = excel_ch4
    if not os.path.exists(ch4_src):
        ch4_src = os.path.splitext(excel_ch4)[0] + ".csv"
    if os.path.exists(ch4_src):
        headers4, data4 = _read_report(excel_ch4)
        kept_ch4 = [data4[i] for i in kept_idx if i < len(data4)]
        kept4 = len(kept_ch4)
        seg4 = os.path.join(d, "segments_4ch")
        os.makedirs(seg4, exist_ok=True)
        p4 = Path(excel_ch4)
        _write_report(os.path.join(seg4, f"{p4.stem}_filter{p4.suffix}"),
                      headers4, kept_ch4)
        logger.info("ch4: synced %d rows by ch1 indices", kept4)
    aligned_dir = os.path.join(d, "aligned")
    if os.path.isdir(aligned_dir):
        shutil.rmtree(aligned_dir, ignore_errors=True)
        logger.info("removed %s", aligned_dir)
    return len(kept_ch1), kept4


def filter_rows_by_duration(
    rows: Sequence[Dict],
    ranges: Sequence[Tuple[float, float, float]],
    duration_of=None,
) -> List[Dict]:
    """Duration-range WER filter over in-memory rows (auxiliary helper)."""
    kept = []
    for r in rows:
        dur = duration_of(r) if duration_of else r.get("dur_s", 0.0)
        thr = next((t for s, e, t in ranges if s <= dur < e), ranges[-1][2])
        if 0 <= float(r["wer"]) <= thr:
            kept.append(r)
    return kept


# --------------------------- merged driver ----------------------------------


def _discover_inputs(input_dir: str) -> Dict[str, str]:
    """input_dir layout: one .wav + files ending ch1.pcm / ch4.pcm /
    _tn.txt / _itn.txt (reference align_split_asr --input_dir)."""
    found: Dict[str, str] = {}
    for fn in sorted(os.listdir(input_dir)):
        p = os.path.join(input_dir, fn)
        if fn.endswith(".wav") and "concat_wav" not in found:
            found["concat_wav"] = p
        elif fn.endswith("ch1.pcm"):
            found["recorded_1ch"] = p
        elif fn.endswith("ch4.pcm"):
            found["recorded_4ch"] = p
        elif fn.endswith("_tn.txt") and not fn.endswith("_itn.txt"):
            found["concat_tn_txt"] = p
        elif fn.endswith("_itn.txt"):
            found["concat_itn_txt"] = p
    missing = {"concat_wav", "recorded_1ch", "recorded_4ch",
               "concat_tn_txt", "concat_itn_txt"} - set(found)
    if missing:
        raise ValueError(f"input_dir missing: {sorted(missing)}")
    return found


def run_align_split_asr(
    concat_wav: str,
    recorded_1ch: str,
    recorded_4ch: str,
    concat_tn_txt: str,
    concat_itn_txt: str,
    segment_sec: float,
    work_dir: str,
    transcribe_fn=None,
    pipe=None,
    output_excel: Optional[str] = None,
    output_excel_4ch: Optional[str] = None,
    search_range_sec: float = 30.0,
    sample_rate: int = SAMPLE_RATE,
    text_type: str = "tn",
    batch_size: int = 16,
) -> Tuple[List[Dict], List[Dict]]:
    """Merged align → split → dual (1ch + downmixed 4ch) ASR eval
    (reference :874-975). Intermediates land in work_dir/{aligned,
    segments,segments_4ch}; reports default to work_dir/asr_wer_ch{1,4}
    .xlsx."""
    output_excel = output_excel or os.path.join(work_dir, "asr_wer_ch1.xlsx")
    output_excel_4ch = (output_excel_4ch
                        or os.path.join(work_dir, "asr_wer_ch4.xlsx"))
    stem = Path(concat_wav).stem
    aligned_dir = os.path.join(work_dir, "aligned")
    segments_dir = os.path.join(work_dir, "segments")
    segments_dir_4ch = os.path.join(work_dir, "segments_4ch")
    out_1ch = os.path.join(aligned_dir, f"{stem}_1ch.wav")
    out_4ch = os.path.join(aligned_dir, f"{stem}_4ch.wav")

    logger.info("== align ==")
    stage2_align(concat_wav, recorded_1ch, recorded_4ch, out_1ch, out_4ch,
                 search_range_sec=search_range_sec, sample_rate=sample_rate)
    logger.info("== split ==")
    stage3_split(out_1ch, concat_tn_txt, concat_itn_txt, segments_dir,
                 segment_sec=segment_sec, sample_rate=sample_rate,
                 aligned_wav_4ch=out_4ch, output_dir_4ch=segments_dir_4ch)

    suffix = "itn" if text_type == "itn" else "tn"
    text_1ch = os.path.join(
        segments_dir, f"{Path(out_1ch).stem}_text_{suffix}.txt"
    )
    text_4ch = os.path.join(
        segments_dir_4ch, f"{Path(out_4ch).stem}_text_{suffix}.txt"
    )
    logger.info("== asr eval 1ch ==")
    rows1 = stage4_asr_eval(segments_dir, text_1ch, output_excel,
                            transcribe_fn=transcribe_fn, pipe=pipe,
                            batch_size=batch_size)
    logger.info("== asr eval 4ch (downmix) ==")
    rows4 = stage4_asr_eval(segments_dir_4ch, text_4ch, output_excel_4ch,
                            transcribe_fn=transcribe_fn, pipe=pipe,
                            batch_size=batch_size,
                            multichannel_downmix=True)
    return rows1, rows4


# --------------------------------- CLI --------------------------------------


def _make_pipe(args):
    from ..pipeline import BatchPipeline

    return BatchPipeline(args.asr_model, max_num_seqs=args.batch_size)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Audio concat and split tool")
    sub = p.add_subparsers(dest="stage", required=True)

    p1 = sub.add_parser("concat", help="Stage 1: group by duration, concat")
    p1.add_argument("--wav_scp", required=True)
    p1.add_argument("--text_tn", default=None,
                    help="utt→text_tn map; emitted as per-file *_tn.txt")
    p1.add_argument("--text_itn", default=None)
    p1.add_argument("--wav2dur", default=None,
                    help="utt→seconds map (skips decoding for grouping)")
    p1.add_argument("--output_dir", required=True)
    p1.add_argument("--sr", type=int, default=24000)

    p2 = sub.add_parser("align", help="Stage 2: align recorded PCM (1+4ch)")
    p2.add_argument("--concat_wav", required=True)
    p2.add_argument("--recorded_1ch", required=True)
    p2.add_argument("--recorded_4ch", default=None)
    p2.add_argument("--output_1ch", required=True)
    p2.add_argument("--output_4ch", default=None)
    p2.add_argument("--search_range", type=float, default=300.0)
    p2.add_argument("--sr", type=int, default=SAMPLE_RATE)

    p3 = sub.add_parser("split", help="Stage 3: fixed-length re-split")
    p3.add_argument("--aligned_wav", required=True)
    p3.add_argument("--concat_tn_txt", required=True)
    p3.add_argument("--concat_itn_txt", required=True)
    p3.add_argument("--output_dir", required=True)
    p3.add_argument("--segment_sec", type=float, required=True)
    p3.add_argument("--sr", type=int, default=SAMPLE_RATE)
    p3.add_argument("--aligned_wav_4ch", default=None)
    p3.add_argument("--output_dir_4ch", default=None)

    p4 = sub.add_parser("asr_eval", help="Stage 4: ASR + WER report")
    p4.add_argument("--segments_dir", required=True)
    p4.add_argument("--text_file", required=True)
    p4.add_argument("--output_excel", required=True)
    p4.add_argument("--asr_model", required=True,
                    help="model dir for the TPU pipeline: a Fun-ASR "
                         "config.yaml dir OR a Qwen3-ASR-style HF "
                         "checkpoint dir (the reference's dedicated "
                         "stage4 transcriber, run_audio_cat_cut.py:566, "
                         "603-609 — converted via models/convert.py "
                         "qwen3_asr_from_pretrained)")
    p4.add_argument("--batch_size", type=int, default=16)
    p4.add_argument("--device", default=None,
                    help="accepted for reference parity (run_audio_cat_cut"
                         ".py:1015); 'cpu' forces the CPU backend")
    p4.add_argument("--multichannel_downmix", action="store_true")

    pm = sub.add_parser("align_split_asr",
                        help="merged align → split → ASR")
    pm.add_argument("--input_dir", default=None)
    pm.add_argument("--concat_wav", default=None)
    pm.add_argument("--recorded_1ch", default=None)
    pm.add_argument("--recorded_4ch", default=None)
    pm.add_argument("--concat_tn_txt", default=None)
    pm.add_argument("--concat_itn_txt", default=None)
    pm.add_argument("--segment_sec", type=float, required=True)
    pm.add_argument("--work_dir", required=True)
    pm.add_argument("--output_excel", default=None)
    pm.add_argument("--output_excel_4ch", default=None)
    pm.add_argument("--search_range", type=float, default=300.0)
    pm.add_argument("--sr", type=int, default=SAMPLE_RATE)
    pm.add_argument("--text_type", choices=("tn", "itn"), default="tn")
    pm.add_argument("--asr_model", required=True)
    pm.add_argument("--batch_size", type=int, default=16)
    pm.add_argument("--device", default=None,
                    help="accepted for reference parity; 'cpu' forces "
                         "the CPU backend")

    p5 = sub.add_parser("filter_wer", help="Stage 5: row-range WER filter")
    p5.add_argument("--output_dir", required=True)
    p5.add_argument("--global_max_wer", type=float, default=1.0)
    p5.add_argument("--ranges", nargs="+", required=True,
                    metavar="START:END:THR")
    p5.add_argument("--excel_ch1", default=None)
    p5.add_argument("--excel_ch4", default=None)
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    if getattr(args, "device", None) and args.device.startswith("cpu"):
        from ..utils.platform import force_cpu_backend

        force_cpu_backend()
    if args.stage == "concat":
        from .kaldi import read_scp, read_scp_dict

        stage1_concat(
            read_scp(args.wav_scp), args.output_dir,
            text_tn=read_scp_dict(args.text_tn) if args.text_tn else None,
            text_itn=read_scp_dict(args.text_itn) if args.text_itn else None,
            wav2dur=read_scp_dict(args.wav2dur) if args.wav2dur else None,
            sample_rate=args.sr,
        )
    elif args.stage == "align":
        stage2_align(args.concat_wav, args.recorded_1ch, args.recorded_4ch,
                     args.output_1ch, args.output_4ch,
                     search_range_sec=args.search_range, sample_rate=args.sr)
    elif args.stage == "split":
        stage3_split(args.aligned_wav, args.concat_tn_txt,
                     args.concat_itn_txt, args.output_dir,
                     segment_sec=args.segment_sec, sample_rate=args.sr,
                     aligned_wav_4ch=args.aligned_wav_4ch,
                     output_dir_4ch=args.output_dir_4ch)
    elif args.stage == "asr_eval":
        stage4_asr_eval(args.segments_dir, args.text_file, args.output_excel,
                        pipe=_make_pipe(args), batch_size=args.batch_size,
                        multichannel_downmix=args.multichannel_downmix)
    elif args.stage == "align_split_asr":
        kw = {}
        if args.input_dir:
            kw = _discover_inputs(args.input_dir)
        else:
            kw = dict(concat_wav=args.concat_wav,
                      recorded_1ch=args.recorded_1ch,
                      recorded_4ch=args.recorded_4ch,
                      concat_tn_txt=args.concat_tn_txt,
                      concat_itn_txt=args.concat_itn_txt)
        run_align_split_asr(
            segment_sec=args.segment_sec, work_dir=args.work_dir,
            pipe=_make_pipe(args),
            output_excel=args.output_excel,
            output_excel_4ch=args.output_excel_4ch,
            search_range_sec=args.search_range, sample_rate=args.sr,
            text_type=args.text_type, batch_size=args.batch_size, **kw,
        )
    elif args.stage == "filter_wer":
        stage5_filter_wer(args.output_dir, args.ranges,
                          global_max_wer=args.global_max_wer,
                          excel_ch1=args.excel_ch1, excel_ch4=args.excel_ch4)


if __name__ == "__main__":
    main()
