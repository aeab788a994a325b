"""Mandarin-English code-switch corpus preprocessing (the reference
utils/preprocess.py:1-559 surface, SEAME-style).

Behaviors reproduced: noise-tag canonicalization (``(ppX)``/``<ppX>``/
``ppl|ppc|ppb|ppo|<v-noise>`` → ``<noise>``, ``<unl>``/``< unk >`` →
``<unk>``, repeated-noise collapse — reference :111-165), Mandarin char
spacing in both directions (:78-108), Kaldi file emission
(text/segments/utt2spk/spk2gender — :371-491), Mandarin char vocabulary +
BPE training text extraction (:494-539).
"""

from __future__ import annotations

import os
import re
import unicodedata
from typing import Dict, Iterable, List, Sequence, Tuple

from .kaldi import utt2spk_to_spk2utt, write_scp

_PUNCT_TABLE = {ord(c): " " for c in "!\"#$%&'()*+,-./:;=?@[\\]^_`{|}~“”‘’。，！？、"}


def is_mandarin(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def is_english(ch: str) -> bool:
    return ch.isascii() and ch.isalpha()


def remove_control_chars(text: str) -> str:
    return "".join(c for c in text if unicodedata.category(c)[0] != "C")


def insert_space_between_mandarin(text: str) -> str:
    """Each Mandarin char becomes its own token (reference :91-108)."""
    out = []
    for ch in text:
        if is_mandarin(ch):
            out.append(f" {ch} ")
        else:
            out.append(ch)
    return re.sub(r"\s+", " ", "".join(out)).strip()


def remove_space_between_mandarin(text: str) -> str:
    """Inverse: glue adjacent Mandarin chars back (reference :78-90)."""
    toks = text.strip().split()
    if not toks:
        return ""
    out = toks[0]
    for prev, cur in zip(toks, toks[1:]):
        if is_english(prev[-1]) or is_english(cur[0]):
            out += " "
        out += cur
    return out


def remove_repeated_noise(text: str, pattern: str = "<noise>") -> str:
    toks = text.split()
    out = []
    for t in toks:
        if t == pattern and out and out[-1] == pattern:
            continue
        out.append(t)
    return " ".join(out)


def normalize_text(text: str) -> str:
    """Reference :129-165 pipeline."""
    t = re.sub(r"\((pp\w+)\)", "<noise>", text.lower())
    t = re.sub(r"\<(pp\w+)\>", "<noise>", t)
    t = t.translate(_PUNCT_TABLE)
    t = remove_control_chars(t)
    t = " ".join(
        "<noise>" if w in {"ppl", "ppc", "ppb", "ppo", "<v-noise>"} else w
        for w in t.split()
    )
    t = t.replace("<unl>", "<unk>").replace("< unk >", "<unk>")
    t = re.sub(r"\<((unk)[a-z ]+)\>", "<unk>", t)
    t = insert_space_between_mandarin(t)
    t = re.sub(r"\s+", " ", t).strip()
    return remove_repeated_noise(t)


def parse_transcript_line(line: str) -> Tuple[str, str, float, float, str]:
    """'<utt_id> <start_ms> <end_ms> <lang> <text...>' SEAME convention →
    (utt_id, recording_id, start_s, end_s, text)."""
    parts = line.rstrip("\n").split("\t") if "\t" in line else line.split(None, 4)
    rec_id, start_ms, end_ms = parts[0], parts[1], parts[2]
    text = parts[-1] if len(parts) >= 4 else ""
    start_s, end_s = float(start_ms) / 1000.0, float(end_ms) / 1000.0
    utt_id = f"{rec_id}-{int(float(start_ms)):08d}-{int(float(end_ms)):08d}"
    return utt_id, rec_id, start_s, end_s, text


def write_kaldi_files(
    entries: Sequence[Tuple[str, str, float, float, str]],
    out_dir: str,
    gender_of: Dict[str, str] = None,
) -> int:
    """Emit text/segments/utt2spk/spk2utt/spk2gender (reference :371-491)."""
    os.makedirs(out_dir, exist_ok=True)
    texts, segments, u2s, genders = [], [], [], []
    for utt_id, rec_id, start, end, raw in entries:
        norm = normalize_text(raw)
        if not norm:
            continue
        texts.append((utt_id, norm))
        segments.append((utt_id, f"{rec_id} {start:.3f} {end:.3f}"))
        spk = rec_id.split("_")[0]
        u2s.append((utt_id, spk))
        if gender_of and spk in gender_of:
            genders.append((spk, gender_of[spk]))
    write_scp(os.path.join(out_dir, "text"), texts)
    write_scp(os.path.join(out_dir, "segments"), segments)
    write_scp(os.path.join(out_dir, "utt2spk"), u2s)
    write_scp(os.path.join(out_dir, "spk2utt"), utt2spk_to_spk2utt(u2s))
    if genders:
        write_scp(os.path.join(out_dir, "spk2gender"),
                  sorted(set(genders)))
    return len(texts)


def build_char_vocab(texts: Iterable[str]) -> List[str]:
    """Mandarin char vocabulary (reference :494-539)."""
    chars = set()
    for t in texts:
        for tok in t.split():
            if len(tok) == 1 and is_mandarin(tok):
                chars.add(tok)
    return sorted(chars)


def extract_bpe_train_text(texts: Iterable[str]) -> List[str]:
    """English-only word stream for BPE training (reference :494-539)."""
    out = []
    for t in texts:
        words = [w for w in t.split() if w.isascii() and not w.startswith("<")]
        if words:
            out.append(" ".join(words))
    return out
