"""Benchmark: end-to-end ASR pipeline RTFx at batch 16 (reference protocol).

Replicates the reference's measurement (BASELINE.md, infer.py:441-501):
wall clock spans fbank extraction → encoder+adaptor forward → engine
generate → per-hyp text normalization, batch size 16. RTF = time /
audio-seconds; RTFx = 1/RTF. Baseline: vLLM on 1×H20 = RTFx 136.9.

Weights are random at the flagship shape (no checkpoint in this
environment); random weights never emit EOS, so decode length is pinned to
~2 tokens per audio second (a zh transcript-length stand-in) — the compute
per token is identical to real weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np


def synth_utterances(total_seconds: float, seed: int = 0, fs: int = 16000):
    """Speech-length-distributed synthetic utterances (SPEECHIO-ish: 2-15 s)."""
    rng = np.random.default_rng(seed)
    utts = []
    acc = 0.0
    while acc < total_seconds:
        dur = float(np.clip(rng.gamma(4.0, 1.8), 2.0, 15.0))
        dur = min(dur, total_seconds - acc) if total_seconds - acc > 2.0 else dur
        n = int(dur * fs)
        # modulated noise ~ speech-like envelope
        t = np.arange(n) / fs
        env = 0.3 + 0.7 * np.abs(np.sin(2 * np.pi * 1.3 * t))
        wav = (rng.normal(size=n) * 0.1 * env).astype(np.float32)
        utts.append(wav)
        acc += dur
    return utts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=480.0,
                    help="total synthetic audio seconds")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_num_seqs", type=int, default=16)
    ap.add_argument("--tokens_per_audio_sec", type=float, default=3.0,
                    help="decode length per audio second for the headline "
                         "number. Mandarin speech runs ~3-5 chars/s and "
                         "Qwen3 tokenizes zh at ~1 token/char, so 3.0 is "
                         "the conservative-realistic transcript rate; the "
                         "JSON also reports a {2,3,4} sensitivity sweep "
                         "(decode-time share scales with this knob)")
    ap.add_argument("--sweep", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="after the headline epochs, re-measure at "
                         "tokens_per_audio_sec 2/4 and in manifest "
                         "(unsorted) order, and emit every row in the "
                         "output JSON (--no-sweep skips; --quick implies "
                         "--no-sweep)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny model + 30 s audio (smoke)")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--profile_dir", type=str, default=None,
                    help="write a jax.profiler trace of the timed epoch")
    ap.add_argument("--no_prefetch", action="store_true")
    ap.add_argument("--pipeline_depth", type=int, default=1,
                    help="waves in flight inside one generate_fused call "
                         "(each owns slots+blocks). Inert at the default "
                         "batch==max_num_seqs call shape (one wave per "
                         "call) — an interleaved A/B measured no wall "
                         "difference; relevant only when a single call "
                         "carries multiple waves")
    ap.add_argument("--kv_cache_dtype", type=str, default=None,
                    choices=(None, "int8"),
                    help="int8-paged KV cache (halved paged-attention "
                         "reads; approximate — logits perturbed)")
    ap.add_argument("--packed", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="ragged mode: pack valid frames/tokens along one "
                         "axis (engine/packed.py) instead of padding each "
                         "wave to its max bucket. Default ON: token-exact "
                         "vs the padded path (fuzz-tested) and the winner "
                         "on both device time (-16%%) and wall clock on "
                         "the current relay; --no-packed measures padded")
    ap.add_argument("--epochs", type=int, default=3,
                    help="timed epochs; the best (steady-state throughput) "
                         "is reported — the shared TPU relay adds multi-"
                         "hundred-ms noise per epoch, and best-of-N is the "
                         "stable estimator of the machine's capability")
    ap.add_argument("--single_dispatch", action="store_true",
                    help="scan ALL waves inside {8,4,2,1}-wave fused "
                         "dispatches (engine.generate_fused_multi): the "
                         "epoch pays ~log2(waves) dispatch->fetch round "
                         "trips instead of one per wave. Token-exact vs "
                         "the per-wave path, but measured ~2x SLOWER on "
                         "this relay (fetch waits are device time here, "
                         "not idle RTT, and common-geometry padding + "
                         "serialized uploads cost real time — see "
                         "BENCH_NOTES); for true high-RTT attaches only")
    ap.add_argument("--sort_by_duration", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="length-sort utterances before batching (tighter "
                         "padding buckets + duration-matched decode "
                         "bursts per wave). Default OFF since round 4: "
                         "with the RAGGED pipeline + one-shot segment "
                         "kernel the two orderings measure within "
                         "session noise of each other (interleaved "
                         "sweeps: 381.8 vs 360.6 favoring manifest, "
                         "then 377.4 vs 371.0 favoring sorted — packing "
                         "removed the padding waste sorting existed to "
                         "curb), so the default is the reference "
                         "protocol verbatim. The sweep still reports "
                         "the sorted row.")
    ap.add_argument("--quantize", type=str, default=None,
                    choices=(None, "int8", "int4"),
                    help="weight-only decoder quantization (opt-in; "
                         "perturbs logits — CER must be validated); int4 "
                         "is group-wise (128) nibble-packed")
    ap.add_argument("--upload", type=str, default="packed_prefetch",
                    choices=("packed", "f32", "int16", "packed_prefetch",
                             "sample_packed"),
                    help="f32 measures fastest end-to-end; packed (int16 "
                         "pairs in uint32, lossless half bytes) loses more "
                         "to the in-graph interleave than the bytes save; "
                         "int16 hits a slow dtype conversion path; "
                         "packed_prefetch uploads uint32 pairs and unpacks "
                         "to f32 with a device op inside the prefetch "
                         "thread (half bytes, unpack off the critical path)")
    args = ap.parse_args()

    import jax

    # persistent compilation cache: repeat bench runs (and the driver's)
    # skip the multi-minute flagship compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from fun_asr_vllm_tpu.audio.frontend import WavFrontend
    from fun_asr_vllm_tpu.engine import LLM, SamplingParams
    from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
    from fun_asr_vllm_tpu.models import encoder as encoder_mod
    from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod
    from fun_asr_vllm_tpu.text.tn_api import normalize_text

    jdtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.quick:
        args.seconds = min(args.seconds, 30.0)
        enc_cfg = encoder_mod.SANMEncoderConfig(
            output_size=128, attention_heads=4, linear_units=256,
            num_blocks=4, dtype=jdtype,
        )
        llm_cfg = qwen3_mod.Qwen3Config(
            vocab_size=1024, hidden_size=256, num_hidden_layers=4,
            num_attention_heads=8, num_key_value_heads=4, head_dim=32,
            intermediate_size=512, dtype=jdtype,
        )
    else:
        # flagship: SenseVoice-small-family encoder + Qwen3-0.6B
        on_tpu = jax.devices()[0].platform != "cpu"
        enc_cfg = encoder_mod.SANMEncoderConfig(
            output_size=512, attention_heads=4, linear_units=2048,
            num_blocks=50, use_flash=on_tpu,
            # fused attention sublayer for the PADDED encoder path
            # (--no-packed); the packed path routes the one-shot
            # segmented kernel via k_window_rows
            fused_attention=on_tpu, dtype=jdtype,
        )
        llm_cfg = qwen3_mod.Qwen3Config(use_flash=on_tpu, dtype=jdtype)
    ad_cfg = adaptor_mod.NanoAdaptorConfig(
        encoder_dim=enc_cfg.output_size, llm_dim=llm_cfg.hidden_size,
        ffn_dim=2048 if not args.quick else 256, dtype=jdtype,
    )

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    enc_params = encoder_mod.init_params(enc_cfg, key)
    ad_params = adaptor_mod.init_params(ad_cfg, key)
    llm_params = qwen3_mod.init_params(llm_cfg, key)

    llm = LLM(
        params=llm_params, config=llm_cfg, tokenizer=None,
        dtype=args.dtype, max_num_seqs=args.max_num_seqs,
        # the two-segment burst removed the per-step cache-copy penalty;
        # 640 still measures slightly better on this transport (smaller
        # page gathers) and covers the benchmark workload
        max_model_len=640,
        # one burst covers a typical zh transcript → one decode dispatch
        # per batch on this high-RTT transport
        decode_burst_size=16,
        # wave pipelining only engages when one generate_fused call spans
        # multiple waves; at batch==max_num_seqs it is inert (A/B'd)
        pipeline_depth=args.pipeline_depth,
        quantize=args.quantize,
        packed_prefill=args.packed,
        kv_cache_dtype=args.kv_cache_dtype,
    )

    # 4 s length buckets bound the number of compiled encoder shapes
    frontend = WavFrontend(dither=0.0, bucket_seconds=4.0)
    utts_manifest = synth_utterances(args.seconds)
    utts_sorted = sorted(utts_manifest, key=len)
    utts = utts_sorted if args.sort_by_duration else utts_manifest
    audio_seconds = sum(len(u) for u in utts) / 16000.0
    print(f"# {len(utts)} utts, {audio_seconds:.1f} s audio", file=sys.stderr)

    # fixed ChatML-ish prefix/suffix embeddings (reference infer.py:394-404)
    rng = np.random.default_rng(1)
    prefix = rng.normal(scale=0.02, size=(12, llm_cfg.hidden_size)).astype(
        np.float32
    )
    suffix = rng.normal(scale=0.02, size=(5, llm_cfg.hidden_size)).astype(
        np.float32
    )
    prefix_dev = jnp.asarray(prefix)
    suffix_dev = jnp.asarray(suffix)

    from concurrent.futures import ThreadPoolExecutor

    uploader = ThreadPoolExecutor(max_workers=2)

    from fun_asr_vllm_tpu.audio.frontend import unpack_pairs_f32 as _unpack_pairs

    def _force_upload(pcm, n_samples=None):
        # on this transport device_put is LAZY: the RPC transfer defers
        # until first consumption, serializing ~100 ms into the compute
        # stream. Forcing it with block_until_ready from a thread makes
        # it run concurrently with the current wave's compute (~3 ms
        # real cost) — the CUDA async-H2D analogue, still on the clock.
        dev = jax.device_put(pcm)
        if n_samples is not None:
            # packed_prefetch: unpack to f32 on device inside this
            # thread — the fetcher sees plain f32, the wire sees half
            # the bytes, and the tiny unpack op overlaps compute
            dev = _unpack_pairs(dev, n_samples)
        dev.block_until_ready()
        return dev

    def ids_to_pseudo_zh(token_ids):
        """Random weights emit arbitrary token ids; the reference
        normalizes REAL zh hypotheses inside the timed loop
        (infer.py:493-496). Mapping each id onto a han codepoint makes
        the timed `normalize_text` pay the real ZhNormalizer rule cost
        on a transcript-length zh string — digit-string stand-ins
        short-circuit the zh rule chain."""
        return "".join(chr(0x4E00 + (int(t) % 6000)) for t in token_ids)

    def run_epoch(utt_list, tok_rate):
        """The reference hot loop (infer.py:441-501): per batch — feature
        prep, encode+prefill (one fused dispatch), decode, normalize. The
        NEXT batch's waveform upload is forced in a background thread
        while the current batch computes (the torch-DataLoader-prefetch
        analogue)."""
        hyp_count = 0
        tm = run_epoch.timings = {"batchify": 0.0, "upload_wait": 0.0,
                                  "generate": 0.0, "normalize": 0.0}
        # prep() runs in the 2-worker uploader pool: the += on the shared
        # float must be serialized or increments are lost
        tm_lock = threading.Lock()

        def _tm_add(key, dt):
            with tm_lock:
                tm[key] += dt

        def prep(batch):
            """Host collation for one batch (runs in the uploader pool,
            overlapped with compute — the DataLoader-worker analogue)."""
            t_b = time.time()
            mean_dur = np.mean([len(b) for b in batch]) / 16000.0
            if args.upload == "sample_packed":
                # ragged sample-level upload: only valid samples ride
                # the wire, fbank runs without padding (requires --packed)
                from fun_asr_vllm_tpu.engine.packed import plan_frame_pack

                frames = np.asarray(
                    [frontend.frame_count(len(b)) for b in batch], np.int32
                )
                plan = plan_frame_pack(frames, 0)
                pcm = frontend.batchify_sample_packed(
                    batch, plan.starts, plan.tt
                )
                n_f32 = None
            else:
                batchify = {
                    "packed": frontend.batchify_packed,
                    "packed_prefetch": frontend.batchify_packed,
                    "int16": frontend.batchify_int16,
                    "f32": frontend.batchify,
                }[args.upload]
                pcm, frames = batchify(batch)
                n_f32 = (frontend.padded_samples(max(len(b) for b in batch))
                         if args.upload == "packed_prefetch" else None)
                plan = None
            _tm_add("batchify", time.time() - t_b)
            return _force_upload(pcm, n_f32), frames, mean_dur, plan

        raw_batches = [utt_list[i: i + args.batch_size]
                       for i in range(0, len(utt_list), args.batch_size)]

        if args.single_dispatch:
            # common geometry across ALL waves, then one multi-call:
            # {8,4,2,1}-wave scanned dispatches inside the engine
            from fun_asr_vllm_tpu.engine.packed import plan_frame_pack

            frames_w = [np.asarray([frontend.frame_count(len(b))
                                    for b in batch], np.int32)
                        for batch in raw_batches]
            # pad the tail wave to a uniform batch (outputs dropped)
            pad_counts = [args.batch_size - len(b) for b in raw_batches]
            uni_batches = [
                b + [np.zeros(1600, np.float32)] * pc
                for b, pc in zip(raw_batches, pad_counts)
            ]
            frames_w = [
                np.concatenate([fr, np.full(pc, frontend.frame_count(1600),
                                            np.int32)]) if pc else fr
                for fr, pc in zip(frames_w, pad_counts)
            ]
            if args.upload == "sample_packed":
                tt = max(plan_frame_pack(fr, 0).tt for fr in frames_w)

                def prep_m(batch, fr):
                    t_b = time.time()
                    plan = plan_frame_pack(fr, 0, bucket=tt)
                    pcm = frontend.batchify_sample_packed(
                        batch, plan.starts, plan.tt)
                    _tm_add("batchify", time.time() - t_b)
                    return _force_upload(pcm), fr, plan
            else:
                n_common = max(
                    frontend.padded_samples(max(len(b) for b in batch))
                    for batch in uni_batches)
                # honor --upload for the wire bytes (finding: this path
                # used to force full-width f32 — 4x the default's bytes —
                # which polluted the single-dispatch-vs-per-wave A/B).
                # packed_prefetch (the default) ships uint32 int16-pairs
                # and unpacks on device inside the prefetch thread; other
                # modes fall back to f32 (in-graph unpack is a per-wave-
                # path feature).
                pack_wire = args.upload == "packed_prefetch"

                def prep_m(batch, fr):
                    from fun_asr_vllm_tpu.audio.frontend import pack_pairs

                    t_b = time.time()
                    pcm, _ = frontend.batchify(batch)
                    pcm = np.pad(pcm,
                                 ((0, 0), (0, n_common - pcm.shape[1])))
                    n_unpack = None
                    if pack_wire:
                        # pack_pairs zero-pads an odd width on the wire;
                        # the device unpack slices back to n_common
                        pcm = pack_pairs(pcm)
                        n_unpack = n_common
                    _tm_add("batchify", time.time() - t_b)
                    return _force_upload(pcm, n_unpack), fr, None

            futs = [uploader.submit(prep_m, b, fr)
                    for b, fr in zip(uni_batches, frames_w)]
            # per-wave decode budgets (dispatch groups are duration-
            # adjacent under --sort_by_duration, so short waves keep
            # short bursts)
            sps = [
                SamplingParams(
                    top_p=0.001,
                    max_tokens=max(4, int(
                        np.mean([len(b) for b in batch]) / 16000.0
                        * tok_rate)))
                for batch in raw_batches
            ]
            t_s = time.time()
            waves = [f.result() for f in futs]
            tm["upload_wait"] += time.time() - t_s
            t_s = time.time()
            results = llm.generate_fused_multi(
                waves, enc_params, enc_cfg, ad_params, ad_cfg,
                frontend, prefix_dev, suffix_dev, sps)
            tm["generate"] += time.time() - t_s
            t_c = time.time()
            for outs, batch in zip(results, raw_batches):
                for o in outs[: len(batch)]:
                    _ = normalize_text(
                        ids_to_pseudo_zh(o.outputs[0].token_ids),
                        language="zh",
                    )
                    hyp_count += 1
            tm["normalize"] += time.time() - t_c
            return hyp_count
        # submit EVERY wave's collation+upload immediately (workload HBM
        # cost is tiny — ~15 MB/wave): batchify runs in the pool so the
        # first dispatch isn't gated on collating the whole epoch, and
        # transfers stream while the early waves compute (reference
        # analogue: DataLoader prefetch_factor×workers + async H2D)
        if args.no_prefetch:
            # lazy baseline: collate+upload each wave IN the loop, right
            # before its dispatch — the serialized-upload cost the
            # prefetch path exists to hide (all of it lands in
            # upload_wait)
            futs = None
        else:
            futs = [uploader.submit(prep, b) for b in raw_batches]

        def consume(handle):
            nonlocal hyp_count
            t_c = time.time()
            outs = handle.result()
            tm["generate"] += time.time() - t_c
            t_c = time.time()
            for o in outs:
                # reference normalizes every hyp inside the timed loop
                # (infer.py:493-496); han-mapped ids pay the real zh cost
                _ = normalize_text(
                    ids_to_pseudo_zh(o.outputs[0].token_ids),
                    language="zh",
                )
                hyp_count += 1
            tm["normalize"] += time.time() - t_c

        # async wave handles: dispatch batch i+1 BEFORE fetching batch
        # i's tokens — up to pipeline_depth waves in flight (the engine
        # sizes slot/block pools for that many)
        from collections import deque as _deque

        inflight = _deque()
        for i in range(len(raw_batches)):
            t_s = time.time()
            cur, frames, mean_dur, plan = (prep(raw_batches[i])
                                           if args.no_prefetch
                                           else futs[i].result())
            tm["upload_wait"] += time.time() - t_s
            max_toks = max(4, int(mean_dur * tok_rate))
            sp = SamplingParams(top_p=0.001, max_tokens=max_toks)
            t_s = time.time()
            handle = llm.generate_fused(
                cur, frames, enc_params, enc_cfg, ad_params, ad_cfg,
                frontend, prefix_dev, suffix_dev, sp, frame_plan=plan,
                async_result=True,
            )
            tm["generate"] += time.time() - t_s
            inflight.append(handle)
            while len(inflight) >= max(1, args.pipeline_depth):
                consume(inflight.popleft())
        while inflight:
            consume(inflight.popleft())
        return hyp_count

    def timed_epoch(utt_list, tok_rate, tag, ep, profile=False):
        llm.reset_stats()
        if profile:
            jax.profiler.start_trace(args.profile_dir)
        t0 = time.time()
        n = run_epoch(utt_list, tok_rate)
        dt_ep = time.time() - t0
        if profile:
            jax.profiler.stop_trace()
        print(
            f"# [{tag}] epoch {ep}: decode {n} utts in {dt_ep:.2f}s, "
            f"engine stats {llm.stats}",
            file=sys.stderr,
        )
        print(f"# [{tag}] epoch {ep} timings "
              f"{ {k: round(v, 3) for k, v in run_epoch.timings.items()} }",
              file=sys.stderr)
        return dt_ep

    def to_rtfx(dt_secs):
        return round(audio_seconds / dt_secs, 2) if dt_secs > 0 else 0.0

    tok = args.tokens_per_audio_sec
    # configs measured this run: headline first, then the sensitivity
    # sweep — decode length {2,3,4} tok/s (sorted) + manifest order at
    # the headline rate. Every row rides in the JSON so the headline's
    # favorable-config choices are visible next to it.
    configs = [{"tokens_per_audio_sec": tok,
                "sort_by_duration": args.sort_by_duration,
                "headline": True}]
    if args.sweep and not args.quick:
        # tok-rate rows follow the HEADLINE's ordering; one row flips
        # the ordering at the headline rate
        for s_tok, s_sorted in ((2.0, args.sort_by_duration),
                                (3.0, args.sort_by_duration),
                                (4.0, args.sort_by_duration),
                                (tok, not args.sort_by_duration)):
            if s_tok == tok and s_sorted == args.sort_by_duration:
                continue
            configs.append({"tokens_per_audio_sec": s_tok,
                            "sort_by_duration": s_sorted})

    def cfg_utts(c):
        return utts_sorted if c["sort_by_duration"] else utts_manifest

    def cfg_tag(c):
        return (f"{'headline' if c.get('headline') else 'sweep'} "
                f"tok={c['tokens_per_audio_sec']:g} "
                f"sorted={c['sort_by_duration']}")

    # warm every config's compiled shapes up front (the headline twice —
    # the first pass compiles, the second flushes post-compile overheads)
    run_epoch(cfg_utts(configs[0]), configs[0]["tokens_per_audio_sec"])
    for c in configs:
        run_epoch(cfg_utts(c), c["tokens_per_audio_sec"])
    print("# warmed", file=sys.stderr)

    # timed epochs INTERLEAVED round-robin across configs: the shared
    # relay's speed drifts on multi-minute scales, so sequential
    # per-config measurement hands whichever config runs last a tail
    # wind (observed: manifest-order measured FASTER than sorted when
    # run minutes later); cycling configs each round exposes every
    # config to the same relay conditions, best-of-rounds per config
    best = {i: None for i in range(len(configs))}
    for ep in range(max(1, args.epochs)):
        for i, c in enumerate(configs):
            profile = bool(args.profile_dir) and ep == 0 and i == 0
            dt_ep = timed_epoch(cfg_utts(c), c["tokens_per_audio_sec"],
                                cfg_tag(c), ep, profile=profile)
            if best[i] is None or dt_ep < best[i]:
                best[i] = dt_ep

    rtfx = to_rtfx(best[0])
    sweep = []
    for i, c in enumerate(configs):
        row = {"tokens_per_audio_sec": c["tokens_per_audio_sec"],
               "sort_by_duration": c["sort_by_duration"],
               "rtfx": to_rtfx(best[i])}
        if c.get("headline"):
            row["headline"] = True
        sweep.append(row)

    print(json.dumps({
        "metric": "RTFx_batch16_speechio_protocol",
        "value": rtfx,
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 136.9, 3),
        "sweep": sweep,
    }))


if __name__ == "__main__":
    main()
