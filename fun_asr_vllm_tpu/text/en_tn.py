"""Rule-based English text normalization.

Stand-in for WeTextProcessing's ``tn.english.normalizer.Normalizer``
(reference kaldi_text_normalizer.py:96-111). Coverage mirrors the
high-frequency grammar classes of the OpenFst version: cardinals,
decimals, negatives, ordinals (1st/22nd/103rd), time-of-day
(3:30 pm / 7:05 / 12:00), money with cents ($3.50), percent, common
fractions (1/2, 3/4, N/M), thousands separators, four-digit year
readings, and digit-prefixed measure units (5km, 3.5 kg). When
WeTextProcessing is importable `tn_api` prefers it automatically; this
module is the zero-dependency fallback with a divergence harness in
tests/test_text.py.
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

# irregular cardinal → ordinal word forms; regulars take "th"
_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}

# measure units verbalized only when directly attached to a number
# (5km, 3.5kg). Bare-letter units (m, s) are omitted: too ambiguous.
_UNITS = {
    "km": ("kilometer", "kilometers"),
    "kg": ("kilogram", "kilograms"),
    "cm": ("centimeter", "centimeters"),
    "mm": ("millimeter", "millimeters"),
    "ml": ("milliliter", "milliliters"),
    "mph": ("mile per hour", "miles per hour"),
    "kb": ("kilobyte", "kilobytes"),
    "mb": ("megabyte", "megabytes"),
    "gb": ("gigabyte", "gigabytes"),
    "ghz": ("gigahertz", "gigahertz"),
    "hz": ("hertz", "hertz"),
    "lb": ("pound", "pounds"),
    "lbs": ("pounds", "pounds"),
    "ft": ("foot", "feet"),
}


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


def int_to_english_ordinal(n: int) -> str:
    """21 → "twenty first", 30 → "thirtieth", 103 → "one hundred third"."""
    words = int_to_english(n).split(" ")
    last = words[-1]
    if last in _ORDINAL_IRREGULAR:
        words[-1] = _ORDINAL_IRREGULAR[last]
    elif last.endswith("y"):
        words[-1] = last[:-1] + "ieth"
    elif last.endswith("t"):
        words[-1] = last + "h"
    else:
        words[-1] = last + "th"
    return " ".join(words)


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


def time_to_english(h: int, m: int, suffix: str = "") -> str:
    """7:05 → "seven oh five"; 3:00 → "three o'clock"; 3:30 pm →
    "three thirty p m". 24h hours read as-is (15:30 → fifteen thirty)."""
    if not 0 <= h <= 23 or not 0 <= m <= 59:
        raise ValueError("not a clock time")
    hour = int_to_english(h)
    if m == 0:
        out = hour + (" " if suffix else " o'clock")
    elif m < 10:
        out = hour + " oh " + _ONES[m] + (" " if suffix else "")
    else:
        out = hour + " " + int_to_english(m) + (" " if suffix else "")
    if suffix:
        out += " ".join(suffix.replace(".", ""))  # "pm" → "p m"
    return out.strip()


def money_to_english(amount: str, currency: str = "dollar") -> str:
    """"3.50" → "three dollars and fifty cents"; "1" → "one dollar"."""
    cent_name = {"dollar": "cent", "pound": "penny", "euro": "cent"}[currency]
    cent_plural = {"cent": "cents", "penny": "pence"}[cent_name]
    if "." in amount:
        d, c = amount.split(".", 1)
        cents = int((c + "0")[:2]) if c else 0
    else:
        d, cents = amount, 0
    dollars = int(d or "0")
    parts = []
    if dollars or not cents:
        parts.append(int_to_english(dollars) + " "
                     + (currency if dollars == 1 else currency + "s"))
    if cents:
        parts.append(int_to_english(cents) + " "
                     + (cent_name if cents == 1 else cent_plural))
    return " and ".join(parts)


def fraction_to_english(num: int, den: int) -> str:
    """1/2 → "one half", 3/4 → "three quarters", 2/5 → "two fifths"."""
    if den == 2:
        return int_to_english(num) + (" half" if num == 1 else " halves")
    if den == 4:
        return int_to_english(num) + (" quarter" if num == 1 else " quarters")
    unit = int_to_english_ordinal(den)
    return int_to_english(num) + " " + unit + ("" if num == 1 else "s")


# the reference's EN cleanup keeps apostrophes/hyphens/slashes
# (kaldi_text_normalizer.py:108); strip the rest
_PUNCT_RE = re.compile(r"[!\"#$&()*+,.:;<=>?@\[\\\]^_`{|}~]")
_NUM = r"\d+(?:\.\d+)?"
# digits with optional thousands separators, for symbol-anchored rules
_CNUM = r"\d{1,3}(?:,\d{3})+(?:\.\d+)?|\d+(?:\.\d+)?"


class EnNormalizer:
    def __init__(self, cache_dir: str = None, overwrite_cache: bool = False) -> None:
        pass

    def normalize(self, text: str) -> str:
        # time-of-day (guard against scores/verse refs by requiring
        # a valid clock reading); the am/pm group must end at a word
        # boundary so it can't eat the front of the next word
        def _time(m):
            h, mi, suf = int(m.group(1)), int(m.group(2)), m.group(3) or ""
            try:
                return " " + time_to_english(h, mi, suf.lower()) + " "
            except ValueError:
                return m.group(0)
        text = re.sub(r"\b(\d{1,2}):(\d{2})\s*([ap]\.?m\.?\b)?(?!\d)",
                      _time, text, flags=re.IGNORECASE)
        # money: $3.50 / £5 / €1,234 — symbol-anchored rules run before
        # the bare comma-group pass so the currency word survives
        for sym, cur in (("$", "dollar"), ("£", "pound"), ("€", "euro")):
            text = re.sub(re.escape(sym) + r"(" + _CNUM + r")",
                          lambda m, c=cur: money_to_english(
                              m.group(1).replace(",", ""), c),
                          text)
        # percent (comma-grouped amounts read as plain cardinals, never
        # the year-pair reading)
        def _pct(m):
            raw = m.group(1)
            plain = raw.replace(",", "")
            if "," in raw and "." not in plain:
                return int_to_english(int(plain)) + " percent"
            return number_to_english(plain) + " percent"
        text = re.sub(r"(" + _CNUM + r")%", _pct, text)
        # remaining comma-grouped numbers are counts — verbalize as
        # cardinals so the year-pair reading below can't claim them
        # (1,234 is "one thousand…", not "twelve thirty four")
        def _comma_num(m):
            plain = m.group(0).replace(",", "")
            words = (number_to_english(plain) if "." in plain
                     else int_to_english(int(plain)))
            return " " + words + " "
        text = re.sub(r"(?<![\d.])\d{1,3}(?:,\d{3})+(?:\.\d+)?(?!\d)",
                      _comma_num, text)
        # ordinals: 1st / 22nd / 103rd / 5th
        text = re.sub(r"\b(\d+)(st|nd|rd|th)\b",
                      lambda m: int_to_english_ordinal(int(m.group(1))),
                      text, flags=re.IGNORECASE)
        # fractions N/M (small denominators only — larger slashes are
        # more likely dates or identifiers)
        def _frac(m):
            num, den = int(m.group(1)), int(m.group(2))
            if 2 <= den <= 20 and num < 100:
                return fraction_to_english(num, den)
            return m.group(0)
        text = re.sub(r"\b(\d{1,2})/(\d{1,2})\b", _frac, text)
        # digit-attached measure units: 5km / 3.5 kg
        def _unit(m):
            num, u = m.group(1), m.group(2).lower()
            sing, plur = _UNITS[u]
            word = sing if num in ("1", "1.0") else plur
            return number_to_english(num) + " " + word
        unit_alt = "|".join(sorted(_UNITS, key=len, reverse=True))
        text = re.sub(r"\b(" + _NUM + r")\s*(" + unit_alt + r")\b",
                      _unit, text, flags=re.IGNORECASE)
        # negatives, then plain numbers
        text = re.sub(r"(?<![\w.])-(" + _NUM + r")",
                      lambda m: " minus " + number_to_english(m.group(1)),
                      text)
        text = re.sub(_NUM, lambda m: number_to_english(m.group(0)), text)
        text = _PUNCT_RE.sub(" ", text)
        return re.sub(r"\s+", " ", text).strip()
