"""icefall-style transcript storage and aggregate error statistics.

Re-implementation of the reference's duplicated helpers
(reference infer.py:21-213 == infer_kaldidata.py:126-310), unified here.
Output file formats are preserved byte-for-byte in structure so downstream
tooling (`wer.txt` consumers) keeps working.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Dict, Iterable, List, TextIO, Tuple

from .wer import align

ERR = "*"
# alignment epsilon: a PRIVATE-USE char so a literal '*' in ref/hyp text
# cannot collide with the gap sentinel (icefall/kaldialign use '*' and
# miscount matched '*' tokens as ins+del); ERR stays the DISPLAY marker
_EPS = "\ue000"


def store_transcripts(
    filename: str, texts: Iterable[Tuple[str, str, str]]
) -> None:
    """Write ``id:\\tref=...`` / ``id:\\thyp=...`` lines
    (reference infer.py:21-38)."""
    with open(filename, "w", encoding="utf-8") as f:
        for cut_id, ref, hyp in texts:
            print(f"{cut_id}:\tref={ref}", file=f)
            print(f"{cut_id}:\thyp={hyp}", file=f)


def _combine_successive_errors(
    ali: List[Tuple[str, str]]
) -> List[Tuple[str, str]]:
    """Merge adjacent error spans into one (ref->hyp) group
    (reference infer.py:149-170)."""
    groups: List[List[List[str]]] = [[[x], [y]] for x, y in ali]
    for i in range(len(groups) - 1):
        if groups[i][0] != groups[i][1] and groups[i + 1][0] != groups[i + 1][1]:
            groups[i + 1][0] = groups[i][0] + groups[i + 1][0]
            groups[i + 1][1] = groups[i][1] + groups[i + 1][1]
            groups[i] = [[], []]
    out: List[Tuple[str, str]] = []
    for refs, hyps in groups:
        refs = [a for a in refs if a != _EPS]
        hyps = [a for a in hyps if a != _EPS]
        if not refs and not hyps:
            continue
        out.append(
            (ERR if not refs else " ".join(refs), ERR if not hyps else " ".join(hyps))
        )
    return out


def write_error_stats(
    f: TextIO,
    test_set_name: str,
    results: List[Tuple[str, str, str]],
    enable_log: bool = True,
) -> float:
    """Compute and write WER + per-utt alignments + sub/del/ins tables.

    Same report sections and ref_len convention (character count of the
    raw ref string) as the reference (infer.py:41-213). Returns WER in %.
    """
    subs: Dict[Tuple[str, str], int] = defaultdict(int)
    ins: Dict[str, int] = defaultdict(int)
    dels: Dict[str, int] = defaultdict(int)
    words: Dict[str, List[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    num_corr = 0
    alis: List[List[Tuple[str, str]]] = []
    for _cut_id, ref, hyp in results:
        ali = align(ref, hyp, _EPS)
        alis.append(ali)
        for ref_word, hyp_word in ali:
            if ref_word == _EPS:
                ins[hyp_word] += 1
                words[hyp_word][3] += 1
            elif hyp_word == _EPS:
                dels[ref_word] += 1
                words[ref_word][4] += 1
            elif hyp_word != ref_word:
                subs[(ref_word, hyp_word)] += 1
                words[ref_word][1] += 1
                words[hyp_word][2] += 1
            else:
                words[ref_word][0] += 1
                num_corr += 1
    # character count of the ref string — the reference's CER convention
    # (infer.py:113)
    ref_len = sum(len(r) for _, r, _ in results)

    sub_errs = sum(subs.values())
    ins_errs = sum(ins.values())
    del_errs = sum(dels.values())
    tot_errs = sub_errs + ins_errs + del_errs
    tot_err_rate = "%.2f" % (100.0 * tot_errs / ref_len) if ref_len > 0 else "0.00"

    if enable_log and ref_len > 0:
        logging.info(
            f"[{test_set_name}] %WER {tot_errs / ref_len:.2%} "
            f"[{tot_errs} / {ref_len}, {ins_errs} ins, "
            f"{del_errs} del, {sub_errs} sub ]"
        )

    print(f"%WER = {tot_err_rate}", file=f)
    print(
        f"Errors: {ins_errs} insertions, {del_errs} deletions, "
        f"{sub_errs} substitutions, over {ref_len} reference "
        f"words ({num_corr} correct)",
        file=f,
    )
    print(
        "Search below for sections starting with PER-UTT DETAILS:, "
        "SUBSTITUTIONS:, DELETIONS:, INSERTIONS:, PER-WORD STATS:",
        file=f,
    )
    print("", file=f)
    print("PER-UTT DETAILS: corr or (ref->hyp)  ", file=f)
    for (cut_id, _ref, _hyp), ali in zip(results, alis):
        grouped = _combine_successive_errors(ali)
        print(
            f"{cut_id}:\t"
            + " ".join(
                rw if rw == hw else f"({rw}->{hw})" for rw, hw in grouped
            ),
            file=f,
        )

    print("", file=f)
    print("SUBSTITUTIONS: count ref -> hyp", file=f)
    for count, (r, h) in sorted(((v, k) for k, v in subs.items()), reverse=True):
        print(f"{count}   {r} -> {h}", file=f)

    print("", file=f)
    print("DELETIONS: count ref", file=f)
    for count, r in sorted(((v, k) for k, v in dels.items()), reverse=True):
        print(f"{count}   {r}", file=f)

    print("", file=f)
    print("INSERTIONS: count hyp", file=f)
    for count, h in sorted(((v, k) for k, v in ins.items()), reverse=True):
        print(f"{count}   {h}", file=f)

    print("", file=f)
    print("PER-WORD STATS: word  corr tot_errs count_in_ref count_in_hyp", file=f)
    for _, word, counts in sorted(
        ((sum(v[1:]), k, v) for k, v in words.items()), reverse=True
    ):
        corr, ref_sub, hyp_sub, w_ins, w_dels = counts
        w_tot_errs = ref_sub + hyp_sub + w_ins + w_dels
        ref_count = corr + ref_sub + w_dels
        hyp_count = corr + hyp_sub + w_ins
        print(f"{word}   {corr} {w_tot_errs} {ref_count} {hyp_count}", file=f)

    return float(tot_errs) / ref_len * 100.0 if ref_len > 0 else 0.0
