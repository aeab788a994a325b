"""Rule-based Chinese text normalization (TN: written → spoken form).

API-compatible stand-in for WeTextProcessing's
``tn.chinese.normalizer.Normalizer`` as configured by the reference
(reference infer.py:423-429: ``remove_erhua=False,
remove_interjections=False, remove_puncts=True``;
kaldi_text_normalizer.py:78-90). Implemented as ordered regex rewrites over
the number/date/time/percent patterns that dominate ASR references, not as
FSTs — if WeTextProcessing is importable it is preferred automatically by
``tn_api.normalize_text``.
"""

from __future__ import annotations

import re
import unicodedata

from .zh_num import digits_to_hanzi, int_to_hanzi, number_to_hanzi

_PUNCT_RE = re.compile(
    r"[、，。？！；：“”‘’『』「」《》〈〉（）【】…—～·　"
    r"!\"#$&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"
)

_NUM = r"\d+(?:\.\d+)?"


class ZhNormalizer:
    """digits/dates/percent → hanzi; optionally strip punctuation."""

    def __init__(
        self,
        cache_dir: str = None,
        remove_erhua: bool = False,
        remove_interjections: bool = False,
        remove_puncts: bool = True,
        overwrite_cache: bool = False,
        full_to_half: bool = True,
    ) -> None:
        self.remove_erhua = remove_erhua
        self.remove_interjections = remove_interjections
        self.remove_puncts = remove_puncts
        self.full_to_half = full_to_half

    # ---- individual rewrites (applied in order) ----

    @staticmethod
    def _year(m: re.Match) -> str:
        return digits_to_hanzi(m.group(1)) + "年"

    @staticmethod
    def _date_md(m: re.Match) -> str:
        return int_to_hanzi(int(m.group(1))) + "月" + int_to_hanzi(int(m.group(2))) + m.group(3)

    @staticmethod
    def _percent(m: re.Match) -> str:
        return "百分之" + number_to_hanzi(m.group(1))

    @staticmethod
    def _fraction(m: re.Match) -> str:
        return int_to_hanzi(int(m.group(2))) + "分之" + int_to_hanzi(int(m.group(1)))

    @staticmethod
    def _time(m: re.Match) -> str:
        h, mi = int(m.group(1)), int(m.group(2))
        out = int_to_hanzi(h) + "点"
        if mi:
            if mi < 10:
                out += "零"
            out += int_to_hanzi(mi)
            out += "分" if not m.group(3) else ""
        if m.group(3):
            out += "分" if mi else ""
            out += int_to_hanzi(int(m.group(3))) + "秒"
        return out

    @staticmethod
    def _phone(m: re.Match) -> str:
        return digits_to_hanzi(m.group(0), phone_style=True)

    @staticmethod
    def _number(m: re.Match) -> str:
        s = m.group(0)
        # very long integers are read digit-by-digit (IDs, zip codes)
        if "." not in s and (len(s) > 9 or (s.startswith("0") and len(s) > 1)):
            return digits_to_hanzi(s)
        return number_to_hanzi(s)

    def normalize(self, text: str) -> str:
        if self.full_to_half:
            text = unicodedata.normalize("NFKC", text)
        # ranges: 3-5个 → 三到五个 (before minus/number handling)
        text = re.sub(
            r"(\d+)\s*[-~—至]\s*(\d+)(?=[个件天年人次只张条位名%月])",
            lambda m: self._number_sub(m.group(1)) + "到" + self._number_sub(m.group(2)),
            text,
        )
        text = re.sub(r"(\d{2,4})年", self._year, text)
        text = re.sub(r"(\d{1,2})月(\d{1,2})(日|号)", self._date_md, text)
        text = re.sub(rf"({_NUM})%", self._percent, text)
        text = re.sub(r"(\d+)/(\d+)", self._fraction, text)
        text = re.sub(r"(\d{1,2}):(\d{2})(?::(\d{2}))?", self._time, text)
        # telephone-like: 7+ digit runs possibly separated by dashes
        text = re.sub(
            r"(?<!\d)(?:\d{3,4}-)?\d{7,11}(?!\d)",
            lambda m: digits_to_hanzi(m.group(0).replace("-", ""), phone_style=True),
            text,
        )
        text = re.sub(r"-?\d+(?:\.\d+)?", self._number, text)
        if self.remove_puncts:
            text = _PUNCT_RE.sub("", text)
        text = re.sub(r"\s+", " ", text).strip()
        return text

    @staticmethod
    def _number_sub(s: str) -> str:
        return number_to_hanzi(s)
