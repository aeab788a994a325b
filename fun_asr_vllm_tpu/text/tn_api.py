"""Unified TN entry point (reference kaldi_text_normalizer.py:62-111).

Prefers WeTextProcessing's OpenFst grammars when importable (exact parity
with the reference environment); otherwise falls back to the built-in
rule-based normalizers in this package.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from .normalize import detect_language, remove_angle_bracket_content


@lru_cache(maxsize=None)
def _zh_normalizer():
    try:  # pragma: no cover - depends on env
        from tn.chinese.normalizer import Normalizer as WeZhNormalizer

        import os

        return WeZhNormalizer(
            # per-user cache: a cwd-relative "./cache" rebuilds the FSTs
            # (tens of seconds) and litters a dir in every working dir
            cache_dir=os.path.expanduser("~/.cache/fun_asr_vllm_tpu/tn"),
            remove_erhua=False,
            remove_interjections=False,
            remove_puncts=True,
            overwrite_cache=False,
        )
    except Exception:
        from .zh_tn import ZhNormalizer

        return ZhNormalizer(remove_puncts=True)


@lru_cache(maxsize=None)
def _en_normalizer():
    try:  # pragma: no cover - depends on env
        from tn.english.normalizer import Normalizer as WeEnNormalizer

        import os

        return WeEnNormalizer(
            cache_dir=os.path.expanduser("~/.cache/fun_asr_vllm_tpu/tn"),
            overwrite_cache=False,
        )
    except Exception:
        from .en_tn import EnNormalizer

        return EnNormalizer()


# keep letters/digits/whitespace/hyphens/apostrophes/slashes, the
# reference's EN cleanup class (kaldi_text_normalizer.py:108)
_EN_PUNCT_RE = re.compile(r"[^\w\s一-鿿\-'/]")


def normalize_text(text: str, language: str = "auto") -> str:
    """Normalize a transcript line for scoring
    (reference kaldi_text_normalizer.py:62-111): strip tags, NFKC, route to
    zh/en grammar, en additionally lowercased and punct-stripped."""
    text = remove_angle_bracket_content(text).strip()
    if not text:
        return ""
    lang = detect_language(text) if language == "auto" else language
    if lang == "zh":
        text = unicodedata.normalize("NFKC", text)
        return _zh_normalizer().normalize(text)
    out = _en_normalizer().normalize(text)
    out = _EN_PUNCT_RE.sub(" ", out)
    return re.sub(r"\s+", " ", out).strip().lower()
