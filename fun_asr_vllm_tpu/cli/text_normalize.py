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
    # -i/-o/-n/-g are the reference's short aliases
    # (kaldi_text_normalizer.py:154-159); --wav_scp/--mos_res are its
    # long names for the input/output text files
    ap.add_argument("-i", "--text", "--wav_scp", dest="text",
                    required=True)
    ap.add_argument("-o", "--out", "--mos_res", dest="out",
                    required=True)
    ap.add_argument("--language", default="auto")
    ap.add_argument("-n", "--num_workers", "--num_thread",
                    dest="num_workers", type=int, default=1)
    ap.add_argument("-g", "--gpu_ids", default="0",
                    help="accepted for reference parity (CPU tool)")
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
