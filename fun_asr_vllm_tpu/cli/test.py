"""Single-utterance smoke CLI (the reference test.py:1-46 surface).

Usage:
    python -m fun_asr_vllm_tpu.cli.test --model_dir <dir> [--wav <path>]
        [--enable_vllm] [--top_p 0.001] [--max_tokens 500]
        [--gpu_memory_utilization 0.4] [--itn]
"""

from __future__ import annotations

import argparse
import os


def get_args():
    p = argparse.ArgumentParser(description="FunASRNano single-utterance decode")
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--wav", "--audio_in", dest="wav", type=str, default=None,
                   help="default: {model_dir}/example/zh.mp3 (reference "
                        "README.md:52; --audio_in is the reference's name)")
    p.add_argument("--device", type=str, default=None,
                   help="'cpu' forces the CPU backend; CUDA names are "
                        "accepted for reference parity and ignored on TPU")
    p.add_argument("--enable_vllm", action="store_true", default=True)
    p.add_argument("--no_vllm", dest="enable_vllm", action="store_false")
    p.add_argument("--top_p", type=float, default=0.001)
    p.add_argument("--max_tokens", type=int, default=500)
    p.add_argument("--gpu_memory_utilization", type=float, default=0.4)
    p.add_argument("--max_num_seqs", type=int, default=16)
    p.add_argument("--itn", nargs="?", const=1, type=int, default=1,
                   help="1/0 (reference style); bare --itn enables")
    p.add_argument("--no_itn", dest="itn", action="store_const", const=0)
    p.add_argument("--language", type=str, default=None)
    p.add_argument("--hotwords", type=str, default="",
                   help="comma-separated hotword list")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--quantize", type=str, default=None,
                   choices=(None, "int8"))
    p.add_argument("--output_dir", type=str, default=None)
    return p.parse_args()


def main():
    args = get_args()
    args.itn = bool(args.itn)
    if args.device and args.device.startswith("cpu"):
        from ..utils.platform import force_cpu_backend

        force_cpu_backend()
    from ..models.nano import FunASRNano

    m, kwargs = FunASRNano.from_pretrained(
        model=args.model_dir, dtype=args.dtype
    )
    if args.enable_vllm:
        from ..engine import LLM, SamplingParams

        m.vllm = LLM(
            params=m.llm_params, config=m.llm_cfg, tokenizer=m.tokenizer,
            dtype=args.dtype, max_num_seqs=args.max_num_seqs,
            gpu_memory_utilization=args.gpu_memory_utilization,
            quantize=args.quantize,
        )
        m.vllm_sampling_params = SamplingParams(
            top_p=args.top_p, max_tokens=args.max_tokens
        )

    wav = args.wav or os.path.join(args.model_dir, "example", "zh.mp3")
    hotwords = [h for h in args.hotwords.split(",") if h.strip()]
    results, meta = m.inference(
        data_in=[wav], itn=args.itn, language=args.language,
        hotwords=hotwords, max_tokens=args.max_tokens,
        output_dir=args.output_dir,
    )
    print(results[0]["text"])
    print(f"# meta: {meta}")


if __name__ == "__main__":
    main()
