"""Kaldi data-dir builder CLI (the reference make_kaldi_data.sh:1-58 +
utils/wav_to_duration.sh + utils/wav2dur.py surfaces).

find audio under a root → wav.scp/text/utt2spk → durations (threaded
probe) → duration filter [0.5, 40] s → fix + spk2utt.

    python -m fun_asr_vllm_tpu.cli.make_kaldi_data --audio_dir d --out_dir k \
        [--text_scp labels] [--min_dur 0.5] [--max_dur 40]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os

from ..data.kaldi import (
    fix_data_dir,
    read_scp_dict,
    utt2spk_to_spk2utt,
    write_scp,
)
from ..data.prepare_domain import collect_audio, probe_duration


def wav2dur(items, num_workers: int = 8):
    """Parallel duration probe (the utils/wav_to_duration.sh split-N
    pattern, threaded instead of process-split)."""
    with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        durs = list(ex.map(lambda kv: probe_duration(kv[1]), items))
    return [(k, f"{d:.3f}") for (k, _), d in zip(items, durs)]


def main():
    ap = argparse.ArgumentParser(description="audio dir → Kaldi data dir")
    ap.add_argument("--audio_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--text_scp", default=None,
                    help="optional key→transcript scp")
    ap.add_argument("--min_dur", type=float, default=0.5)
    ap.add_argument("--max_dur", type=float, default=40.0)
    ap.add_argument("--num_workers", type=int, default=8)
    args = ap.parse_args()

    items = collect_audio(args.audio_dir)
    durs = wav2dur(items, args.num_workers)
    keep = {
        k for (k, _), (_, d) in zip(items, durs)
        if args.min_dur <= float(d) <= args.max_dur
    }
    items = [(k, v) for k, v in items if k in keep]
    os.makedirs(args.out_dir, exist_ok=True)
    write_scp(os.path.join(args.out_dir, "wav.scp"), items)
    write_scp(os.path.join(args.out_dir, "wav2dur"),
              [(k, d) for k, d in durs if k in keep])
    u2s = [(k, k.rsplit("_", 1)[0] if "_" in k else k) for k, _ in items]
    write_scp(os.path.join(args.out_dir, "utt2spk"), u2s)
    write_scp(os.path.join(args.out_dir, "spk2utt"), utt2spk_to_spk2utt(u2s))
    if args.text_scp:
        texts = read_scp_dict(args.text_scp)
        write_scp(
            os.path.join(args.out_dir, "text"),
            [(k, texts[k]) for k, _ in items if k in texts],
        )
    n = fix_data_dir(args.out_dir)
    print(f"{n} utts → {args.out_dir}")


if __name__ == "__main__":
    main()
