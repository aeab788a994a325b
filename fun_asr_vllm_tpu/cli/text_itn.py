"""Kaldi-text ITN CLI (the reference kaldi_text_itn.py:94-148 surface):
`text_punc` → `text_itn`.

    python -m fun_asr_vllm_tpu.cli.text_itn --text t --out t_itn
"""

from __future__ import annotations

import argparse

from ..data.mp_scp import process_scp
from ..text.zh_itn import inverse_normalize_text


def main():
    ap = argparse.ArgumentParser(description="Kaldi text → text_itn")
    ap.add_argument("--text", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--language", default="auto")
    ap.add_argument("--num_workers", type=int, default=1)
    ap.add_argument("--use_processes", action="store_true")
    args = ap.parse_args()
    process_scp(
        args.text, args.out,
        lambda k, v: inverse_normalize_text(v, language=args.language),
        num_workers=args.num_workers, use_processes=args.use_processes,
    )
    print(f"→ {args.out}")


if __name__ == "__main__":
    main()
