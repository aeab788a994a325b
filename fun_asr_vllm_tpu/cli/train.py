"""Finetune driver over nano-format chat JSONL.

The reference repo's data factory exists to PRODUCE training JSONL
(reference scp2nanojsonl.py builds ChatML records with
``<|startofspeech|>!path<|endofspeech|>`` audio spans) but delegates the
actual optimization to funasr's external trainer, keeping only the
DataParallel loss path in-repo (reference model.py:132-248). This
framework closes the loop natively: the same JSONL drives a pjit train
step over a (dp, tp) device mesh — batch sharded over ``dp``, params
over ``tp`` (parallel/mesh.py Megatron rules), XLA inserting the
collectives — with the reference's freeze semantics (encoder/LLM frozen,
adaptor trainable; reference model.py:60-66, 77-81, 120-124) expressed
as gradient partitioning, so frozen components cost zero backward FLOPs.

TPU-shaped data handling: utterances are shuffled, window-sorted by
``speech_length`` and padded to frame/token multiples so an epoch
compiles a bounded set of static-shape step programs; short tail batches
are padded with fully-masked dummy rows instead of recompiling. A
producer thread keeps audio I/O + fbank off the device clock.

Usage:
  python -m fun_asr_vllm_tpu.cli.train \
    --model_dir exp/init --train_jsonl data/train.jsonl \
    --output_dir exp/ft --batch_size 8 --num_epochs 2 --lr 1e-4
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import queue
import re
import shutil
import threading
import time
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# dataset


def read_jsonl_records(paths: Sequence[str]) -> List[Dict]:
    records: List[Dict] = []
    for path in paths:
        with open(path, encoding="utf-8") as f:
            for ln, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError as e:
                    print(f"[train] {path}:{ln + 1}: bad json ({e}); skipped")
                    continue
                if "messages" not in rec:
                    print(f"[train] {path}:{ln + 1}: no 'messages'; skipped")
                    continue
                records.append(rec)
    return records


def iter_epoch_batches(
    records: List[Dict],
    batch_size: int,
    *,
    epoch: int,
    seed: int,
    shuffle: bool = True,
    bucket_window: int = 16,
) -> Iterator[List[Dict]]:
    """Shuffle → window-sort by speech_length → fixed-size batches.

    Window sorting (bucket_window × batch_size records per window) keeps
    batches duration-homogeneous — the same padding-waste control the
    batch eval CLIs get from ``--sort_by_duration`` — while the shuffled
    windows preserve stochasticity across epochs."""
    order = np.arange(len(records))
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    window = max(batch_size * bucket_window, batch_size)
    for w0 in range(0, len(order), window):
        idx = order[w0:w0 + window]
        idx = sorted(
            idx, key=lambda i: float(records[i].get("speech_length", 0) or 0)
        )
        for b0 in range(0, len(idx), batch_size):
            chunk = [records[i] for i in idx[b0:b0 + batch_size]]
            if chunk:
                yield chunk


def build_samples(model, batch_records: List[Dict]) -> List[Dict]:
    """records → per-utterance data_load_speech outputs via the model's
    OWN ChatML builder (audio paths load inside the span parser), so the
    training layout is the inference layout by construction. Records
    whose audio fails to load are skipped with a warning (the
    reference's per-utterance failure-continue pattern)."""
    samples = []
    for rec in batch_records:
        try:
            contents = model.data_template(rec["messages"])
            samples.append(model.data_load_speech(contents))
        except Exception as e:  # noqa: BLE001 — per-utt resilience
            print(f"[train] skip {rec.get('key', '?')}: {e}")
    return samples


def pad_batch_rows(batch: Dict[str, np.ndarray], to: int) -> Dict[str, np.ndarray]:
    """Pad a collated batch to `to` rows so tail batches reuse the
    full-size compiled step instead of recompiling. Dummy rows REPLICATE
    row 0's speech/ids (never zero-length — an all-masked attention row
    would softmax to NaN, and NaN·0 still poisons the masked loss) with
    labels −100 everywhere, so they contribute zero loss."""
    b = batch["speech"].shape[0]
    if b >= to:
        return batch
    out = {}
    for k, v in batch.items():
        pad = np.repeat(v[:1], to - b, axis=0)
        if k == "labels":
            pad = np.full_like(pad, -100)
        out[k] = np.concatenate([v, pad], axis=0)
    return out


# ---------------------------------------------------------------------------
# checkpointing


def _opt_state_leaves(opt_state):
    import jax

    leaves, _ = jax.tree_util.tree_flatten(opt_state)
    return leaves


def save_checkpoint(
    ckpt_dir: str,
    model,
    tparams: Dict,
    fparams: Dict,
    opt_state,
    meta: Dict,
    lora_info: Optional[Dict] = None,
) -> None:
    """Checkpoints store BASE weights; a LoRA run saves its adapter as a
    sidecar (lora.safetensors) so resume keeps base + adapter separate
    while from_pretrained on the dir auto-merges for inference."""
    os.makedirs(ckpt_dir, exist_ok=True)
    merged = dict(fparams)
    merged.update(tparams)
    lora_tree = merged.pop("llm_lora", None)
    model.encoder_params = merged["audio_encoder"]
    model.adaptor_params = merged["audio_adaptor"]
    model.llm_params = merged["llm"]
    model.save_pretrained(ckpt_dir)
    if lora_tree is not None:
        from ..parallel import lora as L

        L.save_lora(ckpt_dir, lora_tree, rank=lora_info["rank"],
                    alpha=lora_info["alpha"], targets=lora_info["targets"])
    leaves = [np.asarray(x) for x in _opt_state_leaves(opt_state)]
    np.savez(os.path.join(ckpt_dir, "opt_state.npz"),
             **{f"leaf_{i}": a for i, a in enumerate(leaves)})
    with open(os.path.join(ckpt_dir, "train_meta.json"), "w") as f:
        json.dump(dict(meta, opt_leaves=len(leaves)), f, indent=2)


def load_opt_state(ckpt_dir: str, optimizer, tparams):
    """Rebuild opt_state: fresh init for the treedef, saved leaves for
    the values (same optimizer + same param structure → same treedef)."""
    import jax

    fresh = optimizer.init(tparams)
    leaves, treedef = jax.tree_util.tree_flatten(fresh)
    with np.load(os.path.join(ckpt_dir, "opt_state.npz")) as z:
        saved = [z[f"leaf_{i}"] for i in range(len(z.files))]
    if len(saved) != len(leaves):
        raise ValueError(
            f"checkpoint opt_state has {len(saved)} leaves, expected "
            f"{len(leaves)} — optimizer config changed since the save?"
        )
    cast = [np.asarray(s, dtype=l.dtype).reshape(np.shape(l))
            for s, l in zip(saved, leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)


def find_latest_checkpoint(output_dir: str) -> Optional[str]:
    cands = []
    for d in glob.glob(os.path.join(output_dir, "checkpoint-*")):
        m = re.fullmatch(r"checkpoint-(\d+)", os.path.basename(d))
        if m and os.path.exists(os.path.join(d, "train_meta.json")):
            cands.append((int(m.group(1)), d))
    return max(cands)[1] if cands else None


def prune_checkpoints(output_dir: str, keep_last: int) -> None:
    cands = []
    for d in glob.glob(os.path.join(output_dir, "checkpoint-*")):
        m = re.fullmatch(r"checkpoint-(\d+)", os.path.basename(d))
        if m:
            cands.append((int(m.group(1)), d))
    for _, d in sorted(cands)[:-keep_last] if keep_last > 0 else []:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# driver


def main(argv: Optional[Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_dir", required=True,
                    help="init model dir (config.yaml + weights)")
    ap.add_argument("--train_jsonl", required=True, nargs="+",
                    help="nano-format chat JSONL file(s)")
    ap.add_argument("--valid_jsonl", nargs="*", default=None)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_epochs", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=0,
                    help="stop after N optimizer steps (0 = run epochs out)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--warmup_steps", type=int, default=0)
    ap.add_argument("--schedule", choices=("constant", "cosine"),
                    default="constant")
    ap.add_argument("--clip_norm", type=float, default=0.0)
    ap.add_argument("--grad_accum", type=int, default=1)
    ap.add_argument("--trainable", default="audio_adaptor",
                    help="comma list of audio_encoder,audio_adaptor,llm "
                         "or 'all' (default mirrors the reference's "
                         "shipped freezes: adaptor only)")
    ap.add_argument("--lora_rank", type=int, default=0,
                    help="LoRA-finetune the frozen LLM at this rank "
                         "(the reference's use_lora/lora_conf, "
                         "model.py:83-102); 0 = off")
    ap.add_argument("--lora_alpha", type=float, default=16.0)
    ap.add_argument("--lora_targets", default="wqkv,wo",
                    help="stacked projection leaves to adapt "
                         "(wqkv,wo,w_gateup,w_down)")
    ap.add_argument("--dtype", default="float32",
                    help="training dtype (float32 recommended)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder/LLM layers in backward "
                         "(activation checkpointing — the reference's "
                         "activation_checkpoint flag, model.py:104-105)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel mesh size (0 = devices/tp)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel mesh size")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_interval", type=int, default=10)
    ap.add_argument("--save_interval", type=int, default=0,
                    help="checkpoint every N steps (0 = end of epoch only)")
    ap.add_argument("--eval_interval", type=int, default=0,
                    help="validation pass every N steps (0 = per epoch)")
    ap.add_argument("--keep_last", type=int, default=3)
    ap.add_argument("--resume", default="",
                    help="checkpoint dir, or 'auto' for latest in output_dir")
    ap.add_argument("--bucket_window", type=int, default=16)
    ap.add_argument("--frame_multiple", type=int, default=64)
    ap.add_argument("--token_multiple", type=int, default=16)
    ap.add_argument("--no_shuffle", action="store_true")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host data-parallel training via "
                         "jax.distributed (one process per host; dp "
                         "spans all hosts' devices over ICI/DCN)")
    ap.add_argument("--coordinator", default="127.0.0.1:9911")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--max_frames", type=int, default=0,
                    help="pinned GLOBAL fbank-frame shape (required with "
                         "--distributed: per-host shape maxima would "
                         "diverge; overlong records are skipped)")
    ap.add_argument("--max_seq", type=int, default=0,
                    help="pinned GLOBAL token-length shape (required "
                         "with --distributed)")
    args = ap.parse_args(argv)

    import jax

    if args.distributed:
        from ..utils.platform import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
        if not (args.max_frames and args.max_seq):
            raise SystemExit(
                "--distributed needs pinned global shapes: pass "
                "--max_frames and --max_seq (every host must compile the "
                "same static-shape step; per-host batch maxima diverge)"
            )

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.nano import FunASRNano
    from ..parallel.mesh import (
        adaptor_param_sharding,
        encoder_param_sharding,
        make_mesh,
        qwen3_param_sharding,
        shard_params,
    )
    from ..parallel import train as T

    os.makedirs(args.output_dir, exist_ok=True)
    trainable = (
        T.COMPONENTS if args.trainable == "all"
        else tuple(s for s in args.trainable.split(",") if s)
    )

    lora_on = args.lora_rank > 0
    if lora_on and "llm" in trainable:
        raise SystemExit("--lora_rank adapts the FROZEN llm; drop 'llm' "
                         "from --trainable (reference freezes the LLM and "
                         "trains only adapters, model.py:77-102)")

    resume_dir = args.resume
    if resume_dir == "auto":
        resume_dir = find_latest_checkpoint(args.output_dir) or ""
    init_dir = resume_dir or args.model_dir
    print(f"[train] loading {init_dir} (dtype={args.dtype}, "
          f"trainable={','.join(trainable)}"
          + (f", lora r={args.lora_rank}" if lora_on else "") + ")")
    model, _kw = FunASRNano.from_pretrained(
        model=init_dir, dtype=args.dtype, apply_lora=not lora_on,
    )
    params = {
        "audio_encoder": model.encoder_params,
        "audio_adaptor": model.adaptor_params,
        "llm": model.llm_params,
    }
    enc_cfg, llm_cfg = model.encoder_cfg, model.llm_cfg
    import dataclasses as _dc

    # the Pallas inference kernels carry no VJP — training always runs
    # the differentiable XLA paths (from_pretrained auto-enables the
    # kernels on TPU for inference callers)
    if enc_cfg.use_flash or enc_cfg.fused_attention:
        enc_cfg = _dc.replace(enc_cfg, use_flash=False,
                              fused_attention=False)
    if llm_cfg.use_flash:
        llm_cfg = _dc.replace(llm_cfg, use_flash=False)
    if args.remat:
        enc_cfg = _dc.replace(enc_cfg, remat=True)
        llm_cfg = _dc.replace(llm_cfg, remat=True)
    cfgs = T.NanoConfigs(enc_cfg, model.adaptor_cfg, llm_cfg)

    param_transform = None
    lora_info = None
    if lora_on:
        from ..parallel import lora as L

        lora_targets = tuple(s for s in args.lora_targets.split(",") if s)
        scale = L.lora_scale(args.lora_rank, args.lora_alpha)
        lora_info = dict(rank=args.lora_rank, alpha=args.lora_alpha,
                         targets=lora_targets, scale=scale)
        resumed_adapter = L.load_lora(resume_dir) if resume_dir else None
        if resumed_adapter is not None:
            params["llm_lora"] = resumed_adapter[0]
        else:
            params["llm_lora"] = L.init_lora_params(
                params["llm"], lora_targets, args.lora_rank,
                jax.random.PRNGKey(args.seed),
            )
        trainable = tuple(trainable) + ("llm_lora",)

        def param_transform(p):
            p = dict(p)
            p["llm"] = L.apply_lora(p["llm"], p.pop("llm_lora"), scale)
            return p

    records = read_jsonl_records(args.train_jsonl)
    if not records:
        print("[train] no training records"); return 1
    valid_records = (read_jsonl_records(args.valid_jsonl)
                     if args.valid_jsonl else [])
    steps_per_epoch = -(-len(records) // args.batch_size)
    total_updates = (
        args.max_steps or args.num_epochs * steps_per_epoch
    ) // max(args.grad_accum, 1) or 1
    print(f"[train] {len(records)} records, {steps_per_epoch} batches/epoch, "
          f"{args.num_epochs} epochs")

    optimizer = T.make_optimizer(
        args.lr, args.weight_decay, warmup_steps=args.warmup_steps,
        total_steps=total_updates, clip_norm=args.clip_norm or None,
        schedule=args.schedule, grad_accum=args.grad_accum,
    )
    sched = T.lr_schedule(args.lr, warmup_steps=args.warmup_steps,
                          total_steps=total_updates, schedule=args.schedule)

    # mesh + shardings (single-device runs skip the mesh entirely)
    n_dev = jax.device_count()
    tp = max(args.tp, 1)
    dp = args.dp or n_dev // tp
    mesh = None
    batch_sharding = None
    if dp * tp > 1:
        if dp * tp > n_dev:
            raise SystemExit(
                f"dp({dp})*tp({tp}) exceeds {n_dev} available devices"
            )
        mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])
        specs = {
            "audio_encoder": encoder_param_sharding(mesh),
            "audio_adaptor": adaptor_param_sharding(mesh),
            "llm": qwen3_param_sharding(mesh),
        }
        if "llm_lora" in params:
            from ..parallel.mesh import lora_param_sharding

            specs["llm_lora"] = lora_param_sharding(params["llm_lora"])
        params = shard_params(mesh, params, specs)
        batch_sharding = lambda v: jax.device_put(  # noqa: E731
            v, NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
        )
        if args.batch_size % dp:
            print(f"[train] batch_size {args.batch_size} not divisible by "
                  f"dp {dp}; rounding up")
            args.batch_size = -(-args.batch_size // dp) * dp
        print(f"[train] mesh dp{dp}xtp{tp} over {n_dev} devices")

    tparams, fparams = T.split_trainable(params, trainable)
    opt_state = (load_opt_state(resume_dir, optimizer, tparams)
                 if resume_dir else optimizer.init(tparams))
    train_step = T.make_partitioned_train_step(
        cfgs, optimizer, trainable, param_transform=param_transform
    )
    eval_step = T.make_eval_step(cfgs) if valid_records else None

    gstep, start_epoch = 0, 0
    if resume_dir:
        with open(os.path.join(resume_dir, "train_meta.json")) as f:
            meta = json.load(f)
        gstep, start_epoch = meta.get("step", 0), meta.get("epoch", 0)
        print(f"[train] resumed from {resume_dir} @ step {gstep}")

    nproc = jax.process_count()
    pid = jax.process_index()
    is_main = pid == 0
    if args.distributed and eval_step is not None:
        print("[train] validation is disabled under --distributed")
        eval_step = None
    log_path = os.path.join(args.output_dir, "train_log.jsonl")
    log_f = open(log_path if is_main else os.devnull, "a", encoding="utf-8")

    rows_local = args.batch_size
    if args.distributed:
        if mesh is None:
            raise SystemExit("--distributed needs a >1-device mesh")
        if args.batch_size % nproc:
            args.batch_size = -(-args.batch_size // nproc) * nproc
        rows_local = args.batch_size // nproc
    frames_to = args.max_frames or None
    tokens_to = args.max_seq or None

    def _prepare(batch_records):
        if args.distributed:
            # deterministic global order → every host takes its own
            # contiguous dp slice and loads ONLY that audio; the global
            # array is assembled from per-process shards
            batch_records = batch_records[pid * rows_local:
                                          (pid + 1) * rows_local]
        samples = build_samples(model, batch_records)
        if frames_to or tokens_to:
            kept = []
            for s in samples:
                if tokens_to and len(s["input_ids"]) > tokens_to:
                    print(f"[train] skip over-long sample "
                          f"({len(s['input_ids'])} tok > {tokens_to})")
                elif frames_to and s["speech"].shape[1] > frames_to:
                    print(f"[train] skip over-long sample "
                          f"({s['speech'].shape[1]} frames > {frames_to})")
                else:
                    kept.append(s)
            samples = kept
        if not samples:
            if not args.distributed:
                return None
            # a host can't sit a round out — feed a fully-masked dummy
            samples = None
        if args.distributed:
            if samples is None:
                dummy = {
                    "speech": np.zeros((1, 8, cfgs.encoder.input_size),
                                       np.float32),
                    "speech_lengths": np.asarray([8], np.int32),
                    "input_ids": [2, 2, 2, 2],
                    "labels_ids": [-100, -100, -100, -100],
                    "fbank_beg": np.asarray([1], np.int32),
                }
                samples = [dummy]
            local = T.collate_samples(
                samples, frame_multiple=args.frame_multiple,
                token_multiple=args.token_multiple,
                frames_to=frames_to, tokens_to=tokens_to,
            )
            local = pad_batch_rows(local, rows_local)
            return {
                k: jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1)))),
                    v,
                )
                for k, v in local.items()
            }
        batch = T.collate_samples(
            samples, frame_multiple=args.frame_multiple,
            token_multiple=args.token_multiple,
            frames_to=frames_to, tokens_to=tokens_to,
        )
        batch = pad_batch_rows(batch, args.batch_size)
        if batch_sharding is not None:
            batch = {k: batch_sharding(v) for k, v in batch.items()}
        return batch

    def _producer(epoch, out_q):
        # on error, forward the exception to the consumer: silently ending
        # the epoch would checkpoint it as complete with most batches
        # untrained, and under --distributed would desync the hosts (the
        # others block in collectives this host never joins)
        try:
            for batch_records in iter_epoch_batches(
                records, args.batch_size, epoch=epoch, seed=args.seed,
                shuffle=not args.no_shuffle, bucket_window=args.bucket_window,
            ):
                out_q.put(_prepare(batch_records))
            out_q.put(_EPOCH_END)
        except BaseException as e:  # noqa: BLE001 — re-raised by consumer
            out_q.put(e)

    def _run_eval(tag: str):
        stats_sum: Dict[str, float] = {}
        n = 0
        # merge once per eval pass: the LoRA fold materializes a second
        # full copy of the LLM weights — per-batch it would dominate
        merged = dict(fparams); merged.update(tparams)
        if param_transform is not None:
            merged = param_transform(merged)
        for batch_records in iter_epoch_batches(
            valid_records, args.batch_size, epoch=0, seed=0, shuffle=False,
        ):
            batch = _prepare(batch_records)
            if batch is None:
                continue
            st = {k: float(v) for k, v in eval_step(merged, batch).items()}
            w = st["batch_tokens"]
            stats_sum["loss"] = stats_sum.get("loss", 0.0) + st["loss"] * w
            stats_sum["acc"] = stats_sum.get("acc", 0.0) + st["acc"] * w
            stats_sum["tokens"] = stats_sum.get("tokens", 0.0) + w
            n += 1
        if n:
            tok = max(stats_sum["tokens"], 1.0)
            line = {"event": "eval", "tag": tag, "step": gstep,
                    "loss": stats_sum["loss"] / tok,
                    "acc": stats_sum["acc"] / tok}
            print(f"[train] eval@{gstep}: loss={line['loss']:.4f} "
                  f"acc={line['acc']:.4f}")
            log_f.write(json.dumps(line) + "\n"); log_f.flush()

    _EPOCH_END = object()
    t_start = time.perf_counter()
    tokens_done = 0.0
    stop = False
    ckpt_meta = lambda ep: {  # noqa: E731
        "step": gstep, "epoch": ep, "trainable": list(trainable),
        "lr": args.lr, "schedule": args.schedule,
        "grad_accum": args.grad_accum, "seed": args.seed,
    }

    cur_epoch = start_epoch
    for epoch in range(start_epoch, args.num_epochs):
        cur_epoch = epoch
        q: "queue.Queue" = queue.Queue(maxsize=2)
        th = threading.Thread(target=_producer, args=(epoch, q), daemon=True)
        th.start()
        while True:
            batch = q.get()
            if batch is _EPOCH_END:
                break
            if isinstance(batch, BaseException):
                raise batch  # producer failed — die loudly, never save
            if batch is None:
                continue
            tparams, opt_state, stats = train_step(
                tparams, fparams, opt_state, batch
            )
            gstep += 1
            tokens_done += float(stats["batch_tokens"])
            if gstep % args.log_interval == 0 or gstep == 1:
                st = {k: float(v) for k, v in stats.items()}
                lr_now = float(sched(min(gstep // max(args.grad_accum, 1),
                                         total_updates)))
                dt = time.perf_counter() - t_start
                line = {"event": "train", "step": gstep, "epoch": epoch,
                        "lr": lr_now, "tokens_per_s": tokens_done / dt,
                        **st}
                print(f"[train] step {gstep} epoch {epoch} "
                      f"loss={st['loss']:.4f} acc={st['acc']:.4f} "
                      f"lr={lr_now:.2e} tok/s={tokens_done / dt:.0f}")
                log_f.write(json.dumps(line) + "\n"); log_f.flush()
            if args.save_interval and gstep % args.save_interval == 0 \
                    and is_main:
                d = os.path.join(args.output_dir, f"checkpoint-{gstep}")
                save_checkpoint(d, model, tparams, fparams, opt_state,
                                ckpt_meta(epoch), lora_info)
                prune_checkpoints(args.output_dir, args.keep_last)
                print(f"[train] saved {d}")
            if eval_step and args.eval_interval and \
                    gstep % args.eval_interval == 0:
                _run_eval("interval")
            if args.max_steps and gstep >= args.max_steps:
                stop = True
                break
        th.join(timeout=5.0)
        if not stop and is_main:
            d = os.path.join(args.output_dir, f"checkpoint-{gstep}")
            save_checkpoint(d, model, tparams, fparams, opt_state,
                            ckpt_meta(epoch + 1), lora_info)
            prune_checkpoints(args.output_dir, args.keep_last)
            print(f"[train] epoch {epoch} done; saved {d}")
            if eval_step:
                _run_eval(f"epoch{epoch}")
        if stop:
            break
    if stop and is_main:
        # stopped mid-epoch: record the CURRENT epoch so a resume replays
        # it (interval-save semantics), not num_epochs (which would read
        # as "training finished")
        d = os.path.join(args.output_dir, f"checkpoint-{gstep}")
        save_checkpoint(d, model, tparams, fparams, opt_state,
                        ckpt_meta(cur_epoch), lora_info)
        prune_checkpoints(args.output_dir, args.keep_last)
        print(f"[train] max_steps reached; saved {d}")
        if eval_step:
            _run_eval("final")
    log_f.close()
    # final export at output_dir root (the dir a user hands to
    # from_pretrained / the eval CLIs); a LoRA run exports MERGED weights
    # plus a portable standalone adapter dir
    if args.distributed and not is_main:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("train_done")
        return 0
    merged = dict(fparams); merged.update(tparams)
    if param_transform is not None:
        adapter_tree = merged["llm_lora"]
        merged = param_transform(merged)
        from ..parallel import lora as L

        L.save_lora(os.path.join(args.output_dir, "adapter"), adapter_tree,
                    rank=lora_info["rank"], alpha=lora_info["alpha"],
                    targets=lora_info["targets"])
    model.encoder_params = merged["audio_encoder"]
    model.adaptor_params = merged["audio_adaptor"]
    model.llm_params = merged["llm"]
    model.save_pretrained(os.path.join(args.output_dir, "final"))
    print(f"[train] final model at {os.path.join(args.output_dir, 'final')}")
    if args.distributed:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("train_done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
