"""Shared multi-process-over-scp driver.

The reference repeats this pattern four times (run_add_punc.py:57-111,
kaldi_text_normalizer.py:152-206, kaldi_text_itn.py:94-148,
run_sense_voice.py:177-263): split input lines into N ranges, spawn N
workers each writing `{out}.part{i}`, then `cat | sort` merge. Unified
here with in-process fallback (TPU hosts usually want threads or a single
engine, not process-per-GPU).
"""

from __future__ import annotations

import multiprocessing as mp
import os
from typing import Callable, List, Sequence, Tuple

from .kaldi import read_scp, split_scp, write_scp

LineFn = Callable[[str, str], str]  # (key, value) -> new value


def _worker(lines: List[Tuple[str, str]], fn: LineFn, out_path: str) -> None:
    rows = []
    for key, val in lines:
        try:
            rows.append((key, fn(key, val)))
        except Exception as e:  # keep going, mark failures
            rows.append((key, ""))
            print(f"[mp_scp] {key} failed: {e}")
    write_scp(out_path, rows, sort=False)


def process_scp(
    in_path: str,
    out_path: str,
    fn: LineFn,
    num_workers: int = 1,
    use_processes: bool = False,
) -> None:
    """Apply `fn` to every scp line, write sorted merged output."""
    if not os.path.exists(in_path):
        raise SystemExit(f"error: input file not found: {in_path}")
    lines = read_scp(in_path)
    shards = split_scp(lines, max(1, num_workers))
    parts = [f"{out_path}.part{i}" for i in range(len(shards))]
    if use_processes and len(shards) > 1:
        ctx = mp.get_context("spawn")
        procs = [
            ctx.Process(target=_worker, args=(shard, fn, part))
            for shard, part in zip(shards, parts)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
    else:
        for shard, part in zip(shards, parts):
            _worker(shard, fn, part)
    rows: List[Tuple[str, str]] = []
    for part in parts:
        rows.extend(read_scp(part))
        os.remove(part)
    write_scp(out_path, rows, sort=True)
