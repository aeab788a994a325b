"""Dataset-list orchestration CLI (the reference run_asr_data.sh:1-260
surface): for each Kaldi data dir — optional pseudo-labeling via the
batch engine, TN/ITN passes, tagging sidecars, JSONL generation — then
concat of the per-dataset JSONL lists.

    python -m fun_asr_vllm_tpu.cli.run_asr_data \
        --data_dirs d1 d2 --out_list train.jsonl \
        [--model_dir m --pseudo_label] [--format nano|svs]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="dataset-list ASR data driver")
    ap.add_argument("--data_dirs", nargs="+", required=True)
    ap.add_argument("--out_list", required=True)
    ap.add_argument("--format", choices=["nano", "svs"], default="nano")
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--pseudo_label", action="store_true",
                    help="transcribe wav.scp with the engine when no text")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    from ..data.jsonl import scp_to_nano_jsonl, scp_to_svs_jsonl
    from ..data.kaldi import read_scp
    from ..data.mp_scp import process_scp
    from ..data.sensevoice_tags import tag_scp
    from ..text.tn_api import normalize_text
    from ..text.zh_itn import inverse_normalize_text

    pipe = None
    jsonls = []
    for d in args.data_dirs:
        wav_scp = os.path.join(d, "wav.scp")
        text = os.path.join(d, "text")
        if not os.path.exists(text) and args.pseudo_label:
            if pipe is None:
                from ..pipeline import BatchPipeline

                pipe = BatchPipeline(args.model_dir, dtype=args.dtype,
                                     max_num_seqs=args.batch_size)
            from .infer_kaldidata import run_shard

            run_shard(pipe, read_scp(wav_scp), None, d,
                      batch_size=args.batch_size, itn=True)
        if os.path.exists(text):
            if not os.path.exists(os.path.join(d, "text_tn")):
                process_scp(text, os.path.join(d, "text_tn"),
                            lambda k, v: normalize_text(v))
            if not os.path.exists(os.path.join(d, "text_itn")):
                process_scp(text, os.path.join(d, "text_itn"),
                            lambda k, v: inverse_normalize_text(v))
        if not os.path.exists(os.path.join(d, "sense_voice_language")):
            tag_scp(wav_scp, d, text_path=text if os.path.exists(text) else None)
        out = os.path.join(d, f"{args.format}.jsonl")
        fn = scp_to_nano_jsonl if args.format == "nano" else scp_to_svs_jsonl
        n = fn(d, out)
        print(f"{d}: {n} lines")
        jsonls.append(out)

    with open(args.out_list, "w", encoding="utf-8") as out_f:
        for p in jsonls:
            with open(p, encoding="utf-8") as f:
                out_f.write(f.read())
    print(f"concatenated {len(jsonls)} jsonl → {args.out_list}")


if __name__ == "__main__":
    main()
