"""Weights-landing acceptance runner — ONE command for the day the real
Fun-ASR-Nano-2512 checkpoint arrives.

The reference's acceptance bar is measured CER 7.03% on
SPEECHIO_ASR_ZH00007 at batch 16 (reference README.md:96,
infer.py:503-517). No checkpoint exists in this build environment, so
that number stays open by construction; this runner packages the whole
landing path so it closes in minutes on a host WITH weights:

    python tools/acceptance.py --model_dir /path/to/Fun-ASR-Nano-2512 \
        [--wav_scp data/wav.scp --text data/text] [--cer_budget 7.03]

Stages (each independently skippable, all reported in one JSON):
  1. converter coverage  — tools/check_checkpoint.check_model_dir: every
     source key consumed, every target leaf filled, two-direction.
  2. smoke decode        — the reference's own smoke test (test.py:4-29):
     decode {model_dir}/example/zh.mp3 (or --smoke_wav) through the
     engine and print the transcript.
  3. scored eval         — when --wav_scp/--text are given: the
     infer_kaldidata shard pipeline end-to-end (fbank → encoder →
     engine decode → TN → CER via the in-repo scorer), gated against
     --cer_budget.

Exit 0 iff every stage that ran passed. The report JSON is written to
--report (default acceptance_report.json) for the record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_converter(model_dir: str, dtype: str) -> dict:
    from tools.check_checkpoint import check_model_dir

    t0 = time.perf_counter()
    try:
        report = check_model_dir(model_dir, dtype=dtype)
        return {"ok": bool(report.ok), "detail": report.render(),
                "seconds": round(time.perf_counter() - t0, 1)}
    except FileNotFoundError as e:
        # no weights file in the dir — config-only dirs can't run this
        return {"ok": None, "skipped": f"no weights: {e}",
                "seconds": round(time.perf_counter() - t0, 1)}
    except Exception as e:  # key-space mismatch IS the failure signal
        return {"ok": False, "error": f"{type(e).__name__}: {e}",
                "seconds": round(time.perf_counter() - t0, 1)}


def stage_smoke(model_dir: str, wav: str, dtype: str,
                disable_engine: bool) -> dict:
    from fun_asr_vllm_tpu.models.nano import FunASRNano

    t0 = time.perf_counter()
    if not os.path.exists(wav):
        return {"ok": None, "skipped": f"smoke wav not found: {wav}"}
    m, kwargs = FunASRNano.from_pretrained(model=model_dir, dtype=dtype)
    if not disable_engine:
        from fun_asr_vllm_tpu.engine import LLM, SamplingParams

        # the reference's vllm-attr contract (test.py:12-20)
        m.vllm = LLM(params=m.llm_params, config=m.llm_cfg,
                     tokenizer=m.tokenizer, dtype=dtype)
        m.vllm_sampling_params = SamplingParams(top_p=0.001, max_tokens=500)
    res, meta = m.inference(data_in=[wav])
    text = res[0]["text"]
    return {"ok": True, "transcript": text, "meta": meta,
            "seconds": round(time.perf_counter() - t0, 1)}


def stage_eval(model_dir: str, wav_scp: str, text_path: str, out_dir: str,
               batch_size: int, dtype: str, cer_budget: float,
               disable_engine: bool) -> dict:
    from fun_asr_vllm_tpu.cli.infer_kaldidata import run_shard
    from fun_asr_vllm_tpu.data.kaldi import read_scp
    from fun_asr_vllm_tpu.pipeline import BatchPipeline

    t0 = time.perf_counter()
    pipe = BatchPipeline(model_dir, dtype=dtype,
                         enable_engine=not disable_engine,
                         max_num_seqs=batch_size)
    scp = read_scp(wav_scp)
    texts = dict(read_scp(text_path))
    run_shard(pipe, scp, texts, out_dir, batch_size=batch_size,
              itn=False, language="zh")
    wer_txt = os.path.join(out_dir, "wer.txt")
    cer = None
    with open(wer_txt) as f:
        for line in f:
            if "%WER" in line:
                # icefall format: "%WER = 7.03% [..." — first occurrence
                # is the overall number
                cer = float(line.split("%WER")[1].split("%")[0]
                            .replace("=", "").strip())
                break
    ok = cer is not None and cer <= cer_budget
    return {"ok": ok, "cer_pct": cer, "budget_pct": cer_budget,
            "outputs": out_dir,
            "seconds": round(time.perf_counter() - t0, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--smoke_wav", default=None,
                    help="default {model_dir}/example/zh.mp3 "
                         "(reference README.md:52)")
    ap.add_argument("--wav_scp", default=None)
    ap.add_argument("--text", default=None)
    ap.add_argument("--output_dir", default="acceptance_out")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--cer_budget", type=float, default=7.03,
                    help="reference README.md:96 vLLM batch-16 CER")
    ap.add_argument("--report", default="acceptance_report.json")
    ap.add_argument("--disable_engine", action="store_true")
    ap.add_argument("--skip_converter", action="store_true")
    ap.add_argument("--skip_smoke", action="store_true")
    args = ap.parse_args(argv)

    report = {"model_dir": args.model_dir, "stages": {}}
    if not args.skip_converter:
        report["stages"]["converter_coverage"] = stage_converter(
            args.model_dir, "float32")
    if not args.skip_smoke:
        wav = args.smoke_wav or os.path.join(
            args.model_dir, "example", "zh.mp3")
        report["stages"]["smoke_decode"] = stage_smoke(
            args.model_dir, wav, args.dtype, args.disable_engine)
    if args.wav_scp and args.text:
        report["stages"]["scored_eval"] = stage_eval(
            args.model_dir, args.wav_scp, args.text, args.output_dir,
            args.batch_size, args.dtype, args.cer_budget,
            args.disable_engine)

    ran = [s for s in report["stages"].values() if s.get("ok") is not None]
    report["pass"] = bool(ran) and all(s["ok"] for s in ran)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1, ensure_ascii=False, default=str)
    for name, s in report["stages"].items():
        status = ("PASS" if s.get("ok") else
                  "SKIP" if s.get("ok") is None else "FAIL")
        print(f"[{status}] {name}: "
              f"{s.get('skipped') or s.get('cer_pct') or s.get('transcript') or 'ok'}")
    print(f"acceptance: {'PASS' if report['pass'] else 'FAIL'} "
          f"→ {args.report}")
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
