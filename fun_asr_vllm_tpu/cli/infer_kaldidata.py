"""Kaldi wav.scp batch evaluation + data-parallel CLI
(the reference infer_kaldidata.py:1-1144 surface).

Pipeline per shard: wav.scp (+optional text) → batched fbank → encoder →
adaptor → engine generate → per-language TN → ITN/TN dual outputs →
per-shard dirs merged sorted (reference merge_results,
infer_kaldidata.py:1013-1062).

Data parallelism, two modes:
- `--multiprocess`: shard the scp and run shards through one engine
  sequentially on this host (a single continuous-batching engine
  saturates one chip), writing the identical `process_{i}/` file tree.
- `--distributed`: true multi-host DP — one process per host/slice via
  `jax.distributed.initialize`; each process decodes
  shard[jax.process_index()], then process 0 merges after a cross-host
  barrier. The TPU analogue of the reference's process-per-GPU spawn
  (infer_kaldidata.py:1064-1143) with the same shard/merge file protocol.
`--tp N` additionally shards the decoder + KV cache over an N-way
tensor-parallel mesh axis within each process (vLLM
tensor_parallel_size, reference infer_kaldidata.py:657).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def get_args():
    p = argparse.ArgumentParser(description="Kaldi wav.scp batch ASR eval")
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--wav_scp", type=str, required=True)
    p.add_argument("--text", type=str, default=None,
                   help="optional reference text for WER")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--itn", action="store_true", default=True)
    p.add_argument("--no_itn", dest="itn", action="store_false")
    p.add_argument("--language", type=str, default=None)
    p.add_argument("--multiprocess", action="store_true")
    p.add_argument("--gpu_list", type=str, default="0",
                   help="kept for CLI parity; shard count on TPU")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host DP via jax.distributed (one process "
                        "per host; pass --coordinator/--num_processes/"
                        "--process_id or set the JAX cluster env)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port for --distributed")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways over the local device mesh")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--quantize", type=str, default=None,
                   choices=(None, "int8"),
                   help="opt-in weight-only int8 decoder")
    p.add_argument("--sort_by_duration", action="store_true",
                   help="length-sort utterances before batching (tighter "
                        "padding buckets, ~+20%% RTFx; outputs stay "
                        "key-sorted)")
    p.add_argument("--packed", action="store_true",
                   help="ragged mode: pack valid frames/tokens along one "
                        "axis instead of padding each wave (engine/packed.py)")
    p.add_argument("--max_tokens", type=int, default=500)
    p.add_argument("--disable_engine", action="store_true")
    return p.parse_args()


def run_shard(pipe, shard, texts, out_dir, batch_size, itn,
              sort_by_duration=False):
    """Decode one scp shard → per-shard output files
    (reference run_inference_on_process, infer_kaldidata.py:618-824)."""
    import numpy as np

    from ..audio.io import load_audio
    from ..data.kaldi import write_scp
    from ..text.error_stats import store_transcripts, write_error_stats
    from ..text.normalize import detect_language, nfkc, normalize_text_alimeeting
    from ..text.tn_api import normalize_text
    from ..text.zh_itn import inverse_normalize_text

    os.makedirs(out_dir, exist_ok=True)
    if sort_by_duration:
        # tight per-wave padding buckets (BENCH_NOTES: +~20% RTFx);
        # output rows are keyed and written sorted, so batch order is
        # semantically free. File size is a cheap duration proxy.
        def _sz(item):
            try:
                return os.path.getsize(item[1])
            except OSError:
                return 0

        shard = sorted(shard, key=_sz)
    hyp_rows, itn_rows, tn_rows, results = [], [], [], []
    t_start = time.time()
    audio_seconds = 0.0
    key_batches: list = []
    dur_box = [0.0]

    def batches():
        # audio loading runs inside transcribe_many's prefetch thread,
        # overlapped with the previous batch's compute (the reference's
        # DataLoader-worker analogue, infer_kaldidata.py:31-123)
        for i in range(0, len(shard), batch_size):
            batch = shard[i : i + batch_size]
            wavs = []
            keys = []
            for key, path in batch:
                try:
                    wav = load_audio(path, fs=16000)
                except Exception as e:  # placeholder on load failure
                    print(f"load failed for {key}: {e}")
                    wav = np.zeros(1600, np.float32)
                wavs.append(wav)
                keys.append(key)
                dur_box[0] += len(wav) / 16000.0
            key_batches.append(keys)
            yield wavs

    for hyps in pipe.transcribe_many(batches()):
        keys = key_batches.pop(0)
        for key, hyp in zip(keys, hyps):
            hyp_rows.append((key, hyp))
            # dual outputs (reference infer_kaldidata.py:800-812)
            itn_rows.append((key, inverse_normalize_text(hyp)
                             if itn else hyp))
            tn_rows.append((key, normalize_text(hyp)))
            if texts is not None and key in texts:
                ref = normalize_text(nfkc(normalize_text_alimeeting(texts[key])))
                hyp_n = normalize_text(nfkc(normalize_text_alimeeting(hyp)))
                results.append((key, ref.upper(), hyp_n.upper()))
    elapsed = time.time() - t_start
    audio_seconds = dur_box[0]

    hyp_rows.sort(); itn_rows.sort(); tn_rows.sort(); results.sort()
    write_scp(os.path.join(out_dir, "text"), hyp_rows)
    write_scp(os.path.join(out_dir, "text_itn"), itn_rows)
    write_scp(os.path.join(out_dir, "text_tn"), tn_rows)
    store_transcripts(os.path.join(out_dir, "hypos.txt"),
                      [(k, "", h) for k, h in hyp_rows] if not results else results)
    if results:
        with open(os.path.join(out_dir, "wer.txt"), "w") as f:
            write_error_stats(f, "kaldi", results)
    with open(os.path.join(out_dir, "inference_time.txt"), "w") as f:
        f.write(f"Inference time: {elapsed} seconds\n")
    with open(os.path.join(out_dir, "process_info.json"), "w") as f:
        json.dump(
            {
                "num_utts": len(shard),
                "audio_seconds": audio_seconds,
                "elapsed": elapsed,
                "rtfx": audio_seconds / elapsed if elapsed > 0 else 0.0,
            },
            f, indent=2,
        )
    return elapsed


def main():
    args = get_args()
    from ..data.kaldi import merge_results, read_scp, read_scp_dict, split_scp
    from ..pipeline import BatchPipeline

    scp = read_scp(args.wav_scp)
    texts = read_scp_dict(args.text) if args.text else None

    if args.distributed:
        import jax

        # CPU processes federate via the gloo collectives backend (the
        # 2-process CI test path); TPU hosts use the native ICI/DCN path
        # and ignore this. Must be set before the backend initializes.
        plat = str(jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", ""))
        if "cpu" in plat:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    mesh = None
    if args.tp > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(tp=args.tp)

    pipe = BatchPipeline(
        args.model_dir, dtype=args.dtype,
        enable_engine=not args.disable_engine,
        max_num_seqs=args.batch_size, itn=args.itn, language=args.language,
        max_tokens=args.max_tokens, mesh=mesh, quantize=args.quantize,
        packed=args.packed,
    )

    if args.distributed:
        import jax
        from jax.experimental import multihost_utils

        n, pid = jax.process_count(), jax.process_index()
        shards = split_scp(scp, n)
        d = os.path.join(args.output_dir, f"process_{pid}")
        run_shard(pipe, shards[pid], texts, d, args.batch_size, args.itn,
                  args.sort_by_duration)
        # every host must finish its shard before process 0 merges
        multihost_utils.sync_global_devices("infer_kaldidata_shards_done")
        if pid == 0:
            merge_results(
                [os.path.join(args.output_dir, f"process_{i}")
                 for i in range(n)],
                args.output_dir,
                filenames=("text", "text_itn", "text_tn", "hypos.txt"),
            )
    elif args.multiprocess:
        n_shards = max(1, len(args.gpu_list.split(",")))
        shards = split_scp(scp, n_shards)
        part_dirs = []
        for i, shard in enumerate(shards):
            d = os.path.join(args.output_dir, f"process_{i}")
            run_shard(pipe, shard, texts, d, args.batch_size, args.itn,
                  args.sort_by_duration)
            part_dirs.append(d)
        merge_results(
            part_dirs, args.output_dir,
            filenames=("text", "text_itn", "text_tn", "hypos.txt"),
        )
    else:
        run_shard(pipe, scp, texts, args.output_dir, args.batch_size, args.itn,
                  args.sort_by_duration)
    print(f"done → {args.output_dir}")


if __name__ == "__main__":
    main()
