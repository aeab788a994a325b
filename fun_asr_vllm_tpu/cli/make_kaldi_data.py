"""Kaldi data-dir builder CLI (the reference make_kaldi_data.sh:1-58 +
utils/wav_to_duration.sh + utils/wav2dur.py surfaces).

find audio under a root → wav.scp/text/utt2spk → durations (threaded
probe) → duration filter [0.5, 40] s → fix + spk2utt (+ text_punc copy).

Both invocation styles work:

    # the reference shell script's positional style
    python -m fun_asr_vllm_tpu.cli.make_kaldi_data AUDIO_DIR OUT_DIR wav flac
    # flag style
    python -m fun_asr_vllm_tpu.cli.make_kaldi_data --audio_dir d --out_dir k \
        [--text_scp labels] [--min_dur 0.5] [--max_dur 40]

Output files are byte-compatible with the reference pipeline (verified
by executing make_kaldi_data.sh side by side): wav.scp/utt2spk/text are
tab-keyed and key-sorted, wav2dur is space-separated full-precision in
wav.scp order (and unfiltered by text presence), spk2utt groups utts in
first-seen order, text_punc is a copy of text.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import glob
import os
import shutil
import sys

from ..data.kaldi import read_scp_dict
from ..data.prepare_domain import probe_duration


def _find_audio(audio_dir: str, formats):
    """(key, path, spk) for every matching file; key = stem, spk = the
    file's parent directory name (make_kaldi_data.sh awk $(NF-1)).
    Matching is case-sensitive like the reference's `find -name`. Keys
    containing whitespace cannot round-trip through whitespace-delimited
    Kaldi files (the reference pipeline breaks on them too) — warn and
    skip rather than emit a corrupt dir."""
    out = []
    for fmt in formats:
        for p in glob.glob(os.path.join(audio_dir, "**", f"*.{fmt}"),
                           recursive=True):
            key = os.path.splitext(os.path.basename(p))[0]
            if key != "".join(key.split()):
                print(f"warning: skipping {p!r} — whitespace in the utt "
                      "key breaks Kaldi scp round-trips", file=sys.stderr)
                continue
            spk = os.path.basename(os.path.dirname(p))
            out.append((key, p, spk))
    # the reference sorts the "name\tpath" lines
    out.sort(key=lambda t: (t[0], t[1]))
    return out


def _collect_text_lines(audio_dir: str, text_scp):
    """key → verbatim text line. Default: concatenate every *.txt under
    audio_dir (reference: find -name '*.txt' | xargs awk 1)."""
    lines = {}
    if text_scp:
        for k, v in read_scp_dict(text_scp).items():
            lines[k] = f"{k}\t{v}"
        return lines
    # conflict semantics: the reference's fix pass (`sort -k1,1 -u`) keeps
    # the first line per key in CONCATENATION order, which is `find`'s
    # filesystem order — not deterministic across machines. We keep the
    # first per key in sorted-path order: deterministic, and identical
    # whenever keys don't conflict across files (the common case; the
    # side-by-side conformance run was byte-identical).
    for p in sorted(glob.glob(os.path.join(audio_dir, "**", "*.txt"),
                              recursive=True)):
        for raw in open(p, encoding="utf-8"):
            raw = raw.rstrip("\n")
            if not raw.strip():
                continue
            key = raw.split()[0]
            if key not in lines:
                lines[key] = raw
    return lines


def wav2dur(items, num_workers: int = 8):
    """Parallel duration probe (the utils/wav_to_duration.sh split-N
    pattern, threaded instead of process-split) → (key, float seconds).
    Written with str(d): full precision, matching utils/wav2dur.py's
    '{} {}'.format(id, frames/rate)."""
    with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        durs = list(ex.map(lambda kv: probe_duration(kv[1]), items))
    return [(k, d) for (k, _), d in zip(items, durs)]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and not argv[0].startswith("-"):
        # reference positional style: AUDIO_DIR OUT_DIR [FORMATS...]
        if len(argv) < 2:
            raise SystemExit(
                "usage: make_kaldi_data AUDIO_DIR OUT_DIR [FORMATS...]  "
                "(or the --audio_dir/--out_dir flag style)"
            )
        ns = argparse.Namespace(
            audio_dir=argv[0], out_dir=argv[1],
            formats=argv[2:] or ["wav"], text_scp=None,
            min_dur=0.5, max_dur=40.0, num_workers=8,
        )
        args = ns
    else:
        ap = argparse.ArgumentParser(description="audio dir → Kaldi data dir")
        ap.add_argument("--audio_dir", required=True)
        ap.add_argument("--out_dir", required=True)
        ap.add_argument("--formats", default="wav,flac,mp3",
                        help="comma-separated audio extensions (the flag "
                             "style's historical default; the positional "
                             "style defaults to wav like the reference)")
        ap.add_argument("--text_scp", default=None,
                        help="optional key→transcript scp (default: "
                             "concatenate every *.txt under audio_dir)")
        ap.add_argument("--min_dur", type=float, default=0.5)
        ap.add_argument("--max_dur", type=float, default=40.0)
        ap.add_argument("--num_workers", type=int, default=8)
        args = ap.parse_args(argv)
        args.formats = [f.strip() for f in args.formats.split(",") if f]

    audio = _find_audio(args.audio_dir, args.formats)
    text_lines = _collect_text_lines(args.audio_dir, args.text_scp)
    durs = wav2dur([(k, p) for k, p, _ in audio], args.num_workers)

    # duration filter (wav2dur keeps every in-range key, even without text)
    dur_keep = [
        (k, d) for (k, d) in durs if args.min_dur <= d <= args.max_dur
    ]
    dur_keys = {k for k, _ in dur_keep}

    # final utterances: in-range AND transcribed (fix_data.sh dup-id pass)
    final = [(k, p, s) for k, p, s in audio
             if k in dur_keys and k in text_lines]
    os.makedirs(args.out_dir, exist_ok=True)

    def write(name, lines):
        with open(os.path.join(args.out_dir, name), "w",
                  encoding="utf-8") as f:
            for line in lines:
                f.write(line + "\n")

    write("wav.scp", [f"{k}\t{p}" for k, p, _ in final])
    write("text", [text_lines[k] for k, _, _ in final])
    write("wav2dur", [f"{k} {d}" for k, d in dur_keep])
    write("utt2spk", [f"{k}\t{s}" for k, _, s in final])
    spk_order, spk2utt = [], {}
    for k, _, s in final:
        if s not in spk2utt:
            spk_order.append(s)
            spk2utt[s] = []
        spk2utt[s].append(k)
    write("spk2utt", [f"{s} {' '.join(spk2utt[s])}" for s in spk_order])
    shutil.copyfile(os.path.join(args.out_dir, "text"),
                    os.path.join(args.out_dir, "text_punc"))
    print(f"{len(final)} utts → {args.out_dir}")


if __name__ == "__main__":
    main()
