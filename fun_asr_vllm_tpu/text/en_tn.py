"""Rule-based English text normalization.

Stand-in for WeTextProcessing's ``tn.english.normalizer.Normalizer``
(reference kaldi_text_normalizer.py:96-111): verbalize numbers, strip
punctuation, collapse whitespace.
"""

from __future__ import annotations

import re

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 12, "trillion"), (10 ** 9, "billion"), (10 ** 6, "million"),
          (10 ** 3, "thousand"), (100, "hundred")]


def int_to_english(n: int) -> str:
    if n < 0:
        return "minus " + int_to_english(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + (" " + _ONES[r] if r else "")
    for base, name in _SCALE:
        if n >= base:
            q, r = divmod(n, base)
            out = int_to_english(q) + " " + name
            if r:
                out += " " + int_to_english(r)
            return out
    return _ONES[0]


def number_to_english(s: str) -> str:
    if "." in s:
        int_part, frac = s.split(".", 1)
        out = int_to_english(int(int_part or "0")) + " point"
        for d in frac:
            out += " " + _ONES[int(d)]
        return out
    n = int(s)
    # four-digit years read as pairs: 1987 → nineteen eighty seven
    if 1100 <= n <= 1999 or 2010 <= n <= 2099:
        hi, lo = divmod(n, 100)
        if lo:
            return int_to_english(hi) + " " + (
                "oh " + _ONES[lo] if lo < 10 else int_to_english(lo)
            )
        return int_to_english(hi) + " hundred"
    return int_to_english(n)


_PUNCT_RE = re.compile(r"[!\"#$&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]")


class EnNormalizer:
    def __init__(self, cache_dir: str = None, overwrite_cache: bool = False) -> None:
        pass

    def normalize(self, text: str) -> str:
        text = re.sub(r"(\d+(?:\.\d+)?)%",
                      lambda m: number_to_english(m.group(1)) + " percent", text)
        text = re.sub(r"\$(\d+(?:\.\d+)?)",
                      lambda m: number_to_english(m.group(1)) + " dollars", text)
        text = re.sub(r"\d+(?:,\d{3})+",
                      lambda m: m.group(0).replace(",", ""), text)
        text = re.sub(r"\d+(?:\.\d+)?", lambda m: number_to_english(m.group(0)),
                      text)
        text = _PUNCT_RE.sub(" ", text)
        return re.sub(r"\s+", " ", text).strip()
