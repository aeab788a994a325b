"""Shared light-weight text cleanup utilities.

Unifies the five divergent `detect_language` copies and the duplicated
alimeeting cleanup of the reference (reference asr_check.py:10,
kaldi_text_normalizer.py:34-59, infer_kaldidata.py:546, scp2nanojsonl.py:28,
scp2svsjsonl.py:9; infer.py:334-371 == infer_kaldidata.py:461).
"""

from __future__ import annotations

import re
import unicodedata


def nfkc(text: str) -> str:
    """Full-width → half-width etc. (reference infer.py:433)."""
    return unicodedata.normalize("NFKC", text)


def detect_language(text: str, en_ratio_threshold: float = 0.2) -> str:
    """Classify a line as 'zh' or 'en' by ASCII-letter ratio.

    The reference keeps five copies with thresholds between 0.2 and 0.5
    (kaldi_text_normalizer.py:34-59 uses >20% ascii ⇒ en); the threshold is
    a parameter here so each call-site keeps its behavior.

    Deliberate divergence (verified by executing the reference): its
    ratio counts EVERY ascii char — including spaces — against the raw
    string length, so space-separated pure-Chinese text ("去 天 我",
    40% ascii) classifies as "en" and silently skips zh ITN/TN. Here
    only ascii LETTERS count, against letters+han.
    """
    letters = sum(1 for c in text if c.isascii() and c.isalpha())
    han = sum(1 for c in text if "一" <= c <= "鿿")
    total = letters + han
    if total == 0:
        return "zh"
    return "en" if letters / total > en_ratio_threshold else "zh"


def remove_angle_bracket_content(text: str) -> str:
    """Strip ``<...>`` tags (reference kaldi_text_normalizer.py:19-31)."""
    return re.sub(r"<[^>]*>", "", text)


_FULLWIDTH_FIXUPS = {
    "Ａ": "A", "ａ": "A", "ｂ": "B", "ｃ": "C", "ｋ": "K", "ｔ": "T",
}
_DROP_STRINGS = (
    " ", " ", "<sil>", "<%>", "<->", "<$>", "<#>", "<_>", "<space>",
    "`", "&", ",", "，", "丶", "。", "、", "？",
)


def normalize_text_alimeeting(text: str) -> str:
    """M2MeT-challenge-style cleanup (reference infer.py:334-371):
    drop spaces/fillers/listed punctuation, uppercase if any latin letter,
    fix a few full-width letters."""
    for s in _DROP_STRINGS:
        text = text.replace(s, "")
    if re.search("[a-zA-Z]", text):
        text = text.upper()
    for k, v in _FULLWIDTH_FIXUPS.items():
        text = text.replace(k, v)
    return text


_SPECIAL_CHARS_RE = re.compile(r"[^\w\s　一-鿿]+")


def strip_special_chars(text: str) -> str:
    """Keep word chars / whitespace / CJK, drop the rest
    (reference model.py:692, run_add_punc.py:18-24)."""
    return _SPECIAL_CHARS_RE.sub("", text)


def clean_response(text: str) -> str:
    """Reference post-processing of LLM output: '/sil' → space, squeeze
    whitespace (reference model.py:695)."""
    return re.sub(r"\s+", " ", text.replace("/sil", " "))
