"""Domain ASR dataset builder (the reference
prepare_domain_asr_dataset.py:1-641 surface).

End-to-end: audio dir (+ labels from an Excel/CSV table「音频名称/标注后文本」
or per-file .txt sidecars) → Kaldi dir (wav.scp/text/wav2dur/utt2spk/
spk2utt) → duration filter [0.1, 40] s → text_tn/text_itn (pre-computed
``*_tn.txt``/``*_itn.txt`` pass-through honored) → train/test split →
training JSONL → prepare_meta.json.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import re
from typing import Dict, List, Optional, Tuple

from ..audio.io import read_wav
from ..text.tn_api import normalize_text
from ..text.zh_itn import inverse_normalize_text
from .jsonl import scp_to_nano_jsonl, scp_to_svs_jsonl
from .kaldi import fix_data_dir, utt2spk_to_spk2utt, write_scp

AUDIO_EXTS = (".wav", ".flac", ".mp3", ".m4a", ".ogg", ".pcm")


def collect_audio(audio_dir: str) -> List[Tuple[str, str]]:
    items = []
    for root, _dirs, files in os.walk(audio_dir):
        for fn in sorted(files):
            if fn.lower().endswith(AUDIO_EXTS):
                key = re.sub(r"[^\w\-]", "_", os.path.splitext(fn)[0])
                items.append((key, os.path.join(root, fn)))
    return items


def load_labels(
    audio_dir: str, label_table: Optional[str] = None
) -> Dict[str, str]:
    """Labels from a CSV/Excel table (columns 音频名称/标注后文本) or
    per-file .txt sidecars (reference :266-425)."""
    labels: Dict[str, str] = {}
    if label_table:
        import pandas as pd

        df = (pd.read_excel(label_table) if label_table.endswith(
            (".xlsx", ".xls")) else pd.read_csv(label_table))
        name_col = next(
            (c for c in df.columns if "音频" in str(c) or "name" in str(c).lower()),
            df.columns[0],
        )
        text_col = next(
            (c for c in df.columns if "文本" in str(c) or "text" in str(c).lower()),
            df.columns[-1],
        )
        for _, row in df.iterrows():
            key = re.sub(r"[^\w\-]", "_",
                         os.path.splitext(str(row[name_col]))[0])
            labels[key] = str(row[text_col]).strip()
        return labels
    for root, _dirs, files in os.walk(audio_dir):
        for fn in files:
            if fn.endswith(".txt"):
                key = re.sub(r"[^\w\-]", "_", os.path.splitext(fn)[0])
                with open(os.path.join(root, fn), encoding="utf-8") as f:
                    labels[key] = f.read().strip()
    return labels


def probe_duration(path: str) -> float:
    try:
        x, sr = read_wav(path)
        return len(x) / sr
    except Exception:
        return -1.0


def build_kaldi_and_texts(
    audio_dir: str,
    out_dir: str,
    label_table: Optional[str] = None,
    min_duration: float = 0.1,
    max_duration: float = 40.0,
    spk_prefix: str = "spk",
) -> Dict:
    """→ meta dict; writes wav.scp/text/wav2dur/utt2spk/spk2utt +
    text_tn/text_itn (pass-through of precomputed *_tn/_itn.txt honored)."""
    os.makedirs(out_dir, exist_ok=True)
    audio = collect_audio(audio_dir)
    labels = load_labels(audio_dir, label_table)

    wav_rows, text_rows, dur_rows, u2s_rows = [], [], [], []
    skipped_dur = skipped_label = 0
    for key, path in audio:
        if key not in labels:
            skipped_label += 1
            continue
        dur = probe_duration(path)
        if not (min_duration <= dur <= max_duration):
            skipped_dur += 1
            continue
        wav_rows.append((key, path))
        text_rows.append((key, labels[key]))
        dur_rows.append((key, f"{dur:.3f}"))
        u2s_rows.append((key, f"{spk_prefix}_{key.split('_')[0]}"))

    write_scp(os.path.join(out_dir, "wav.scp"), wav_rows)
    write_scp(os.path.join(out_dir, "text"), text_rows)
    write_scp(os.path.join(out_dir, "wav2dur"), dur_rows)
    write_scp(os.path.join(out_dir, "utt2spk"), u2s_rows)
    write_scp(os.path.join(out_dir, "spk2utt"), utt2spk_to_spk2utt(u2s_rows))
    fix_data_dir(out_dir)

    # TN/ITN (precomputed sidecars pass through — reference :233-259)
    pre_tn = os.path.join(audio_dir, "text_tn.txt")
    pre_itn = os.path.join(audio_dir, "text_itn.txt")
    text_map = dict(text_rows)
    if os.path.exists(pre_tn):
        import shutil

        shutil.copy(pre_tn, os.path.join(out_dir, "text_tn"))
    else:
        write_scp(
            os.path.join(out_dir, "text_tn"),
            [(k, normalize_text(v)) for k, v in text_map.items()],
        )
    if os.path.exists(pre_itn):
        import shutil

        shutil.copy(pre_itn, os.path.join(out_dir, "text_itn"))
    else:
        write_scp(
            os.path.join(out_dir, "text_itn"),
            [(k, inverse_normalize_text(v)) for k, v in text_map.items()],
        )

    meta = {
        "audio_dir": audio_dir,
        "num_audio_files": len(audio),
        "num_labeled": len(labels),
        "num_kept": len(wav_rows),
        "skipped_duration": skipped_dur,
        "skipped_no_label": skipped_label,
        "total_duration_s": sum(float(d) for _, d in dur_rows),
        "duration_filter": [min_duration, max_duration],
    }
    with open(os.path.join(out_dir, "prepare_meta.json"), "w") as f:
        json.dump(meta, f, ensure_ascii=False, indent=2)
    return meta


def split_train_test(
    data_dir: str, test_ratio: float = 0.05, seed: int = 17,
    min_test: int = 1,
) -> Tuple[str, str]:
    """Random utterance split into {data_dir}/train and {data_dir}/test
    (reference :451-518)."""
    from .kaldi import read_scp

    wav = read_scp(os.path.join(data_dir, "wav.scp"))
    keys = [k for k, _ in wav]
    rng = random.Random(seed)
    rng.shuffle(keys)
    n_test = max(min_test, int(len(keys) * test_ratio)) if keys else 0
    test_keys = set(keys[:n_test])

    for split in ("train", "test"):
        os.makedirs(os.path.join(data_dir, split), exist_ok=True)
    for name in ("wav.scp", "text", "wav2dur", "utt2spk", "text_tn",
                 "text_itn"):
        p = os.path.join(data_dir, name)
        if not os.path.exists(p):
            continue
        rows = read_scp(p)
        write_scp(os.path.join(data_dir, "test", name),
                  [r for r in rows if r[0] in test_keys])
        write_scp(os.path.join(data_dir, "train", name),
                  [r for r in rows if r[0] not in test_keys])
    for split in ("train", "test"):
        fix_data_dir(os.path.join(data_dir, split))
    return os.path.join(data_dir, "train"), os.path.join(data_dir, "test")


def main():
    ap = argparse.ArgumentParser(description="audio dir → Kaldi dir + JSONL")
    ap.add_argument("--audio_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--label_table", default=None,
                    help="Excel/CSV with 音频名称/标注后文本 columns")
    ap.add_argument("--min_duration", type=float, default=0.1)
    ap.add_argument("--max_duration", type=float, default=40.0)
    ap.add_argument("--test_ratio", type=float, default=0.05)
    ap.add_argument("--jsonl_format", choices=["nano", "svs", "none"],
                    default="svs")
    args = ap.parse_args()

    meta = build_kaldi_and_texts(
        args.audio_dir, args.output_dir, args.label_table,
        args.min_duration, args.max_duration,
    )
    print(json.dumps(meta, ensure_ascii=False, indent=2))
    train_dir, test_dir = split_train_test(args.output_dir, args.test_ratio)
    if args.jsonl_format != "none":
        fn = scp_to_nano_jsonl if args.jsonl_format == "nano" else scp_to_svs_jsonl
        for d in (train_dir, test_dir):
            n = fn(d, os.path.join(d, f"{args.jsonl_format}.jsonl"))
            print(f"{d}: {n} jsonl lines")


if __name__ == "__main__":
    main()
