"""Kaldi data-dir primitives: wav.scp/text/utt2spk/spk2utt read-write,
filtering, splitting, merging.

Unifies the reference's perl/bash utils (utils/filter_scp.pl,
utils/split_scp.pl, utils/utt2spk_to_spk2utt.pl, fix_data_dir.sh) and the
scp split/merge logic of the multi-process harness
(reference infer_kaldidata.py:493-544, 1013-1062) in one python module.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple


def read_scp(path: str) -> List[Tuple[str, str]]:
    """Read `key value...` lines (value may contain spaces)."""
    out: List[Tuple[str, str]] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            parts = line.split(maxsplit=1)
            out.append((parts[0], parts[1] if len(parts) > 1 else ""))
    return out


def read_scp_dict(path: str) -> Dict[str, str]:
    return dict(read_scp(path))


def write_scp(path: str, items: Iterable[Tuple[str, str]],
              sort: bool = True) -> None:
    items = list(items)
    if sort:
        items = sorted(items, key=lambda kv: kv[0])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for k, v in items:
            f.write(f"{k}\t{v}\n" if v != "" else f"{k}\n")


def split_scp(items: Sequence[Tuple[str, str]], n: int) -> List[List[Tuple[str, str]]]:
    """Contiguous near-equal split (the reference's shard scheme,
    infer_kaldidata.py:493-544)."""
    n = max(1, min(n, len(items)))
    base = len(items) // n
    rem = len(items) % n
    shards = []
    pos = 0
    for i in range(n):
        size = base + (1 if i < rem else 0)
        shards.append(list(items[pos : pos + size]))
        pos += size
    return shards


def filter_scp(keys: Iterable[str], items: Sequence[Tuple[str, str]],
               exclude: bool = False) -> List[Tuple[str, str]]:
    """utils/filter_scp.pl semantics."""
    keyset = set(keys)
    return [
        (k, v) for k, v in items if (k in keyset) != exclude
    ]


def utt2spk_to_spk2utt(utt2spk: Sequence[Tuple[str, str]]) -> List[Tuple[str, str]]:
    by_spk: Dict[str, List[str]] = {}
    for utt, spk in utt2spk:
        by_spk.setdefault(spk, []).append(utt)
    return [(spk, " ".join(sorted(utts))) for spk, utts in sorted(by_spk.items())]


def fix_data_dir(data_dir: str, files: Sequence[str] = ("wav.scp", "text",
                                                         "utt2spk", "wav2dur")) -> int:
    """Keep only utterances present in ALL files; rewrite sorted; rebuild
    spk2utt (fix_data_dir.sh behavior). Returns surviving utt count."""
    present = {}
    for name in files:
        p = os.path.join(data_dir, name)
        if os.path.exists(p):
            present[name] = read_scp(p)
    if not present:
        return 0
    common = None
    for items in present.values():
        keys = {k for k, _ in items}
        common = keys if common is None else (common & keys)
    for name, items in present.items():
        write_scp(os.path.join(data_dir, name),
                  [(k, v) for k, v in items if k in common])
    u2s = os.path.join(data_dir, "utt2spk")
    if os.path.exists(u2s):
        write_scp(os.path.join(data_dir, "spk2utt"),
                  utt2spk_to_spk2utt(read_scp(u2s)))
    return len(common)


def merge_results(
    part_dirs: Sequence[str],
    out_dir: str,
    filenames: Sequence[str] = ("text_itn", "text_tn", "hypos.txt"),
) -> None:
    """Concatenate per-shard output files, sorted by key
    (reference infer_kaldidata.py:1013-1062)."""
    os.makedirs(out_dir, exist_ok=True)
    for name in filenames:
        rows: List[Tuple[str, str]] = []
        for d in part_dirs:
            p = os.path.join(d, name)
            if os.path.exists(p):
                rows.extend(read_scp(p))
        if rows:
            write_scp(os.path.join(out_dir, name), rows)
