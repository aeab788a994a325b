"""Kaldi-text TN CLI (the reference kaldi_text_normalizer.py:120-206
surface): `text` → normalized `text_tn`, multi-worker over line ranges.

    python -m fun_asr_vllm_tpu.cli.text_normalize --text t --out t_tn \
        [--language auto|zh|en] [--num_workers 4]
"""

from __future__ import annotations

import argparse

from ..data.mp_scp import process_scp
from ..text.tn_api import normalize_text


def main():
    ap = argparse.ArgumentParser(description="Kaldi text → text_tn")
    ap.add_argument("--text", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--language", default="auto")
    ap.add_argument("--num_workers", type=int, default=1)
    ap.add_argument("--use_processes", action="store_true")
    args = ap.parse_args()
    process_scp(
        args.text, args.out,
        lambda k, v: normalize_text(v, language=args.language),
        num_workers=args.num_workers, use_processes=args.use_processes,
    )
    print(f"→ {args.out}")


if __name__ == "__main__":
    main()
