"""Per-utterance language/emotion/event tagging (the reference
run_sense_voice.py:1-269 surface).

The reference runs SenseVoiceSmall and parses its three leading
``<|tag|>`` markers into sidecar files `sense_voice_language`,
`sense_voice_emotion`, `sense_voice_event` (run_sense_voice.py:54-64).
Tagger backends are pluggable; the default heuristic tagger gives
language via text/audio heuristics and neutral emotion/event so the
downstream JSONL generators (data/jsonl.py) always have sidecars.
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Callable, Dict, Tuple

from .kaldi import read_scp, read_scp_dict, write_scp

TAG_RE = re.compile(r"<\|([^|]+)\|>")


def parse_leading_tags(text: str) -> Tuple[str, str, str, str]:
    """'<|zh|><|NEUTRAL|><|Speech|>你好' → (zh, NEUTRAL, Speech, 你好)
    (reference run_sense_voice.py:54-64)."""
    tags = []
    rest = text
    for _ in range(3):
        m = TAG_RE.match(rest)
        if not m:
            break
        tags.append(m.group(1))
        rest = rest[m.end():]
    tags += ["zh", "NEUTRAL", "Speech"][len(tags):]
    return tags[0], tags[1], tags[2], rest


class HeuristicTagger:
    """language from transcript script ratio; neutral emotion/event."""

    def __call__(self, key: str, wav_path: str, text: str = "") -> str:
        from ..text.normalize import detect_language

        lang = detect_language(text, en_ratio_threshold=0.5) if text else "zh"
        return f"<|{lang}|><|NEUTRAL|><|Speech|>{text}"


class ModelTagger:
    """Runs the JAX SenseVoiceSmall (models/sensevoice.py) per utterance —
    the reference's AutoModel(model='iic/SenseVoiceSmall') path
    (run_sense_voice.py:19-28)."""

    def __init__(self, model_dir: str) -> None:
        from ..models.sensevoice import SenseVoiceSmall

        self.model = SenseVoiceSmall(model_dir=model_dir)

    def __call__(self, key: str, wav_path: str, text: str = "") -> str:
        return self.model.generate(input=wav_path)[0]["text"]


def make_tagger(model_dir: str = None):
    if model_dir and os.path.isdir(model_dir):
        return ModelTagger(model_dir)
    return HeuristicTagger()


def tag_scp(
    wav_scp_path: str,
    out_dir: str,
    tagger: Callable[[str, str, str], str] = None,
    text_path: str = None,
    prefix: str = "sense_voice",
) -> int:
    tagger = tagger or HeuristicTagger()
    items = read_scp(wav_scp_path)
    texts: Dict[str, str] = read_scp_dict(text_path) if text_path else {}
    langs, emos, events = [], [], []
    for key, path in items:
        raw = tagger(key, path, texts.get(key, ""))
        lang, emo, event, _rest = parse_leading_tags(raw)
        langs.append((key, lang))
        emos.append((key, emo))
        events.append((key, event))
    os.makedirs(out_dir, exist_ok=True)
    write_scp(os.path.join(out_dir, f"{prefix}_language"), langs)
    write_scp(os.path.join(out_dir, f"{prefix}_emotion"), emos)
    write_scp(os.path.join(out_dir, f"{prefix}_event"), events)
    return len(items)


def main():
    ap = argparse.ArgumentParser(description="tag wav.scp with lang/emo/event")
    # -i/-o/-g/-n/-b/-w per the reference (run_sense_voice.py:179-186);
    # -o/--mos_res takes the reference's output file path and the
    # sidecars land next to it
    ap.add_argument("-i", "--wav_scp", dest="wav_scp", required=True)
    ap.add_argument("--text", default=None)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("-o", "--mos_res", dest="mos_res", default=None,
                    help="reference-style output path; its directory "
                         "becomes --out_dir")
    ap.add_argument("-g", "--gpu_ids", default="0",
                    help="accepted for reference parity")
    ap.add_argument("-n", "--num_thread", type=int, default=1,
                    help="accepted for reference parity")
    ap.add_argument("-b", "--batch_size", type=int, default=4,
                    help="accepted for reference parity")
    ap.add_argument("-w", "--num_workers", type=int, default=2,
                    help="accepted for reference parity")
    ap.add_argument("--model_dir", default=None,
                    help="SenseVoiceSmall checkpoint dir (heuristic "
                         "fallback when absent)")
    args = ap.parse_args()
    if not args.out_dir:
        if not args.mos_res:
            ap.error("--out_dir (or -o/--mos_res) is required")
        args.out_dir = os.path.dirname(os.path.abspath(args.mos_res))
    n = tag_scp(args.wav_scp, args.out_dir,
                tagger=make_tagger(args.model_dir), text_path=args.text)
    print(f"tagged {n} utts → {args.out_dir}")


if __name__ == "__main__":
    main()
