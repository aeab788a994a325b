"""Domain ASR dataset builder (the reference
prepare_domain_asr_dataset.py:1-641 surface).

End-to-end: audio dir (+ labels from an Excel/CSV table「音频名称/标注后文本」
— auto-discovered .xlsx unless --ignore_excel — or per-file .txt sidecars)
→ Kaldi dir (wav.scp/text/wav2dur/utt2spk/spk2utt) → duration filter
[0.1, 40] s with threaded probing → text_tn/text_itn (recursively merged
precomputed ``*_tn.txt``/``*_itn.txt`` pass-through honored; text_tn is
punct-stripped by default, full TN behind --apply_text_tn, reference
:200-209) → SenseVoice tagging sidecars (--skip_sense_voice to skip)
→ optional --split_train_test → training JSONL (all + train/test)
→ prepare_meta.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random
import re
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

from ..audio.io import read_wav
from ..text.normalize import remove_angle_bracket_content
from ..text.tn_api import normalize_text
from ..text.zh_itn import inverse_normalize_text
from .kaldi import fix_data_dir, read_scp, utt2spk_to_spk2utt, write_scp

DEFAULT_FORMATS = "wav,flac,mp3"

#: punctuation stripped from text_tn when full TN is off (reference
#: _PUNCT_STRIP, :196-198)
_PUNCT_STRIP = re.compile(
    "[，。！？、；：“”‘’（）《》【】…—"
    r",.!?;:\"'()<>\[\]{}~`@#$%^&*+=|\\/-]")


def _norm_key(name: str) -> str:
    return re.sub(r"[^\w\-]", "_", name)


def collect_audio(
    audio_dir: str,
    formats: str = DEFAULT_FORMATS,
    utt_key_mode: str = "basename",
) -> List[Tuple[str, str]]:
    """Recursive audio scan; keys from the basename or the relative path
    (reference --utt_key_mode, :553-558)."""
    exts = tuple("." + f.strip().lstrip(".").lower()
                 for f in formats.split(",") if f.strip())
    items = []
    for root, _dirs, files in os.walk(audio_dir):
        for fn in sorted(files):
            if not fn.lower().endswith(exts):
                continue
            path = os.path.join(root, fn)
            if utt_key_mode == "relpath":
                rel = os.path.relpath(path, audio_dir)
                key = _norm_key(os.path.splitext(rel)[0])
            else:
                key = _norm_key(os.path.splitext(fn)[0])
            items.append((key, path))
    return items


def load_labels(
    audio_dir: str,
    label_table: Optional[str] = None,
    ignore_excel: bool = False,
) -> Dict[str, str]:
    """Labels from a CSV/Excel table (columns 音频名称/标注后文本; .xlsx
    auto-discovered in the audio dir unless ignore_excel) or per-file
    .txt sidecars (reference :266-425, 551-552)."""
    # ignore_excel disables .xlsx auto-discovery only; an explicitly
    # passed table is always honored
    if label_table is None and not ignore_excel:
        found = sorted(glob.glob(os.path.join(audio_dir, "**", "*.xlsx"),
                                 recursive=True))
        if found:
            label_table = found[0]
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
            key = _norm_key(os.path.splitext(str(row[name_col]))[0])
            labels[key] = str(row[text_col]).strip()
        return labels
    for root, _dirs, files in os.walk(audio_dir):
        for fn in files:
            if fn.endswith(".txt") and not fn.endswith(("_tn.txt",
                                                        "_itn.txt")):
                key = _norm_key(os.path.splitext(fn)[0])
                with open(os.path.join(root, fn), encoding="utf-8") as f:
                    labels[key] = f.read().strip()
    return labels


def probe_duration(path: str) -> float:
    try:
        x, sr = read_wav(path)
        return len(x) / sr
    except Exception:
        return -1.0


def to_text_tn(raw: str, apply_tn: bool = False) -> str:
    """Default: tag strip + punctuation strip; full TN grammar behind
    apply_tn (reference _to_text_tn, :200-209)."""
    t = remove_angle_bracket_content(raw).strip()
    if not t:
        return t
    if apply_tn:
        return normalize_text(t)
    t = _PUNCT_STRIP.sub("", t)
    return re.sub(r"\s+", " ", t).strip()


def to_text_itn(raw: str) -> str:
    t = remove_angle_bracket_content(raw).strip()
    return inverse_normalize_text(t) if t else t


def load_precomputed_tn_itn(
    audio_dir: str,
) -> Tuple[Optional[Dict[str, str]], Optional[Dict[str, str]], Dict]:
    """Recursively merge ``*_tn.txt``/``*_itn.txt`` pairs; later files
    win on conflicting keys with a warning (reference :219-258)."""
    meta: Dict = {}
    tn_paths = sorted(glob.glob(os.path.join(audio_dir, "**", "*_tn.txt"),
                                recursive=True))
    itn_paths = sorted(glob.glob(os.path.join(audio_dir, "**", "*_itn.txt"),
                                 recursive=True))
    if not tn_paths or not itn_paths:
        meta["precomputed_tn_itn"] = False
        meta["reason"] = (
            "missing *_tn.txt or *_itn.txt"
            if not tn_paths and not itn_paths
            else ("no *_tn.txt" if not tn_paths else "no *_itn.txt")
        )
        return None, None, meta

    def merge(paths, label):
        merged: Dict[str, str] = {}
        for p in paths:
            for line in open(p, encoding="utf-8"):
                parts = line.strip().split(maxsplit=1)
                if len(parts) != 2:
                    continue
                k, v = parts
                if k in merged and merged[k] != v:
                    print(f"warning: {label} key {k!r} differs in {p}; "
                          f"keeping the later file")
                merged[k] = v
        return merged

    tn_map, itn_map = merge(tn_paths, "TN"), merge(itn_paths, "ITN")
    meta.update(precomputed_tn_itn=True,
                tn_files=tn_paths, itn_files=itn_paths,
                n_tn_keys=len(tn_map), n_itn_keys=len(itn_map))
    return tn_map, itn_map, meta


def build_kaldi_and_texts(
    audio_dir: str,
    out_dir: str,
    label_table: Optional[str] = None,
    min_duration: float = 0.1,
    max_duration: float = 40.0,
    formats: str = DEFAULT_FORMATS,
    utt_key_mode: str = "basename",
    ignore_excel: bool = False,
    apply_text_tn: bool = False,
    ignore_precomputed_tn_itn: bool = False,
    dur_workers: int = 8,
) -> Dict:
    """→ meta dict; writes wav.scp/text/wav2dur/utt2spk/spk2utt +
    text_tn/text_itn (pass-through of precomputed *_tn/_itn.txt honored)."""
    os.makedirs(out_dir, exist_ok=True)
    audio = collect_audio(audio_dir, formats, utt_key_mode)
    labels = load_labels(audio_dir, label_table, ignore_excel)

    labeled = [(k, p) for k, p in audio if k in labels]
    only_wav = len(audio) - len(labeled)
    only_txt = len(set(labels) - {k for k, _ in audio})
    with ThreadPoolExecutor(max_workers=max(1, dur_workers)) as ex:
        durations = list(ex.map(lambda kp: probe_duration(kp[1]), labeled))

    kept = []
    for (key, path), dur in zip(labeled, durations):
        if min_duration <= dur <= max_duration:
            kept.append((key, path, dur))
    n_after_duration = len(kept)

    # TN/ITN (recursively merged precomputed sidecars pass through —
    # reference :219-258 — unless --ignore_precomputed_tn_itn). When
    # precomputed files are used, utterances missing from them are
    # dropped from EVERY output file (reference :360-376).
    tn_map = itn_map = None
    pre_meta: Dict = {}
    if not ignore_precomputed_tn_itn:
        tn_map, itn_map, pre_meta = load_precomputed_tn_itn(audio_dir)
    use_precomputed = tn_map is not None and itn_map is not None
    if use_precomputed:
        had_kept = bool(kept)
        kept = [(k, p, d) for k, p, d in kept
                if k in tn_map and k in itn_map]
        if had_kept and not kept:
            # only blame utt ids when the sidecar filter is what emptied
            # the set (reference :369-374); an already-empty kept means
            # no labeled/duration-valid audio, which writes empty outputs
            raise RuntimeError(
                "precomputed *_tn.txt/*_itn.txt found but share no keys "
                "with the labeled audio — check the utt ids"
            )
    else:
        tn_map = {k: to_text_tn(labels[k], apply_text_tn)
                  for k, _, _ in kept}
        itn_map = {k: to_text_itn(labels[k]) for k, _, _ in kept}

    wav_rows = [(k, p) for k, p, _ in kept]
    text_rows = [(k, labels[k]) for k, _, _ in kept]
    dur_rows = [(k, f"{d:.3f}") for k, _, d in kept]
    # speaker = the audio's parent directory when it sits in a
    # subdirectory of audio_dir, else "unknown" (reference :299)
    root = os.path.abspath(audio_dir)
    u2s_rows = []
    for k, p, _ in kept:
        parent = os.path.dirname(os.path.abspath(p))
        u2s_rows.append((k, os.path.basename(parent)
                         if parent != root else "unknown"))

    write_scp(os.path.join(out_dir, "wav.scp"), wav_rows)
    write_scp(os.path.join(out_dir, "text"), text_rows)
    write_scp(os.path.join(out_dir, "wav2dur"), dur_rows)
    write_scp(os.path.join(out_dir, "utt2spk"), u2s_rows)
    write_scp(os.path.join(out_dir, "spk2utt"), utt2spk_to_spk2utt(u2s_rows))
    fix_data_dir(out_dir)

    write_scp(os.path.join(out_dir, "text_tn"),
              [(k, tn_map[k]) for k, _ in wav_rows if k in tn_map])
    write_scp(os.path.join(out_dir, "text_itn"),
              [(k, itn_map[k]) for k, _ in wav_rows if k in itn_map])

    # reference meta schema (prepare_domain_asr_dataset.py:412-421)
    meta = {
        "n_audio_found": len(audio),
        "n_after_align": len(labeled),
        "n_after_duration": n_after_duration,
        "n_final_utterances": len(wav_rows),
        "only_wav_no_text": only_wav,
        "only_text_no_wav": only_txt,
        "text_tn_itn_mode": ("precomputed_files" if use_precomputed
                             else "from_text_normalize"),
        **pre_meta,
    }
    with open(os.path.join(out_dir, "prepare_meta.json"), "w") as f:
        json.dump(meta, f, ensure_ascii=False, indent=2)
    return meta


def split_train_test(
    data_dir: str, test_ratio: float = 0.1, seed: int = 42,
    min_test: int = 1, sensevoice_prefix_name: str = "sense_voice",
) -> Tuple[str, str]:
    """Random utterance split into {data_dir}/train and {data_dir}/test
    (reference :451-518), carrying the SenseVoice sidecars along."""
    wav = read_scp(os.path.join(data_dir, "wav.scp"))
    keys = [k for k, _ in wav]
    rng = random.Random(seed)
    rng.shuffle(keys)
    n_test = max(min_test, int(len(keys) * test_ratio)) if keys else 0
    test_keys = set(keys[:n_test])

    names = ["wav.scp", "text", "wav2dur", "utt2spk", "text_tn",
             "text_itn"] + [f"{sensevoice_prefix_name}_{s}"
                            for s in ("language", "emotion", "event")]
    for split in ("train", "test"):
        os.makedirs(os.path.join(data_dir, split), exist_ok=True)
    for name in names:
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


def main(argv=None):
    ap = argparse.ArgumentParser(description="audio dir → Kaldi dir + JSONL")
    ap.add_argument("--audio_dir", required=True)
    ap.add_argument("--output_dir", "--out_dir", dest="output_dir",
                    required=True)
    ap.add_argument("--formats", default=DEFAULT_FORMATS,
                    help="comma-separated audio extensions")
    ap.add_argument("--label_table", "--excel", dest="label_table",
                    default=None,
                    help="Excel/CSV with 音频名称/标注后文本 columns "
                         "(auto-discovers a .xlsx when omitted)")
    ap.add_argument("--ignore_excel", action="store_true",
                    help="pair per-file .txt labels even when a .xlsx exists")
    ap.add_argument("--utt_key_mode", choices=("basename", "relpath"),
                    default="basename")
    ap.add_argument("--apply_text_tn", action="store_true",
                    help="full TN grammar for text_tn (default: tag + "
                         "punctuation strip only, reference :200-209)")
    ap.add_argument("--ignore_precomputed_tn_itn", action="store_true")
    ap.add_argument("--min_duration", type=float, default=0.1)
    ap.add_argument("--max_duration", type=float, default=40.0)
    ap.add_argument("--dur_workers", type=int, default=8)
    ap.add_argument("--skip_sense_voice", action="store_true")
    ap.add_argument("--sensevoice_prefix_name", default="sense_voice")
    ap.add_argument("--sensevoice_model_dir", default=None,
                    help="SenseVoiceSmall dir (heuristic tagger when absent)")
    ap.add_argument("--gpu_ids", default="0",
                    help="accepted for reference parity")
    ap.add_argument("--sensevoice_threads", type=int, default=1)
    ap.add_argument("--sensevoice_batch_size", type=int, default=32)
    ap.add_argument("--sensevoice_num_workers", type=int, default=2)
    ap.add_argument("--split_train_test", action="store_true")
    ap.add_argument("--test_ratio", type=float, default=0.1)
    ap.add_argument("--split_seed", type=int, default=42)
    ap.add_argument("--no_jsonl", action="store_true")
    ap.add_argument("--jsonl_all", default=None,
                    help="default: <out_dir>/all.jsonl")
    ap.add_argument("--jsonl_train", default=None)
    ap.add_argument("--jsonl_test", default=None)
    ap.add_argument("--jsonl_format", choices=["nano", "svs"],
                    default="svs")
    args = ap.parse_args(argv)

    meta = build_kaldi_and_texts(
        args.audio_dir, args.output_dir, args.label_table,
        args.min_duration, args.max_duration,
        formats=args.formats, utt_key_mode=args.utt_key_mode,
        ignore_excel=args.ignore_excel, apply_text_tn=args.apply_text_tn,
        ignore_precomputed_tn_itn=args.ignore_precomputed_tn_itn,
        dur_workers=args.dur_workers,
    )
    print(json.dumps(meta, ensure_ascii=False, indent=2))

    if not args.skip_sense_voice:
        # in-process tagger (the reference shells out to
        # run_sense_voice.py, :426-448)
        from .sensevoice_tags import make_tagger, tag_scp

        tag_scp(os.path.join(args.output_dir, "wav.scp"), args.output_dir,
                tagger=make_tagger(args.sensevoice_model_dir),
                prefix=args.sensevoice_prefix_name)
    else:
        print("skipped SenseVoice (--skip_sense_voice)")

    dirs = [args.output_dir]
    if args.split_train_test:
        train_dir, test_dir = split_train_test(
            args.output_dir, args.test_ratio, args.split_seed,
            sensevoice_prefix_name=args.sensevoice_prefix_name,
        )
        dirs += [train_dir, test_dir]

    if args.no_jsonl:
        print("skipped JSONL (--no_jsonl)")
        return
    outs = {
        args.output_dir: args.jsonl_all
        or os.path.join(args.output_dir, "all.jsonl"),
    }
    if args.split_train_test:
        outs[dirs[1]] = (args.jsonl_train
                         or os.path.join(args.output_dir, "train.jsonl"))
        outs[dirs[2]] = (args.jsonl_test
                         or os.path.join(args.output_dir, "test.jsonl"))
    for d, out in outs.items():
        n = _emit_jsonl(d, out, args.jsonl_format,
                        args.sensevoice_prefix_name)
        print(f"{d}: {n} jsonl lines → {out}")


def _emit_jsonl(data_dir: str, out_path: str, fmt: str,
                prefix: str = "sense_voice") -> int:
    """JSONL over a prepared dir, honoring the configured SenseVoice
    sidecar prefix (the scp_to_* wrappers assume the default names)."""
    from .jsonl import nano_jsonl, svs_jsonl
    from .kaldi import read_scp_dict

    def side(name):
        p = os.path.join(data_dir, name)
        return read_scp_dict(p) if os.path.exists(p) else None

    wav = dict(read_scp(os.path.join(data_dir, "wav.scp")))
    lang = side(f"{prefix}_language") or {}
    lang = {k: (v if v.startswith("<|") else f"<|{v}|>")
            for k, v in lang.items()}
    common = dict(
        text_tn=side("text_tn"),
        text_itn=side("text_itn") or side("text"),
        wav2dur=side("wav2dur"), lang_map=lang,
    )
    if fmt == "nano":
        return nano_jsonl(wav, out_path, **common)
    return svs_jsonl(wav, out_path, emo_map=side(f"{prefix}_emotion"),
                     evt_map=side(f"{prefix}_event"), **common)


if __name__ == "__main__":
    main()
