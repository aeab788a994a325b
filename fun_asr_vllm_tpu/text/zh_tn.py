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

# measure words that read 2 as 两 (WeTextProcessing measure.tsv behavior)
_MEASURES = (
    "个只件张条位名本台辆架间家把块瓶杯碗盘双对副层栋座匹头颗粒"
    "艘枝支首部页篇封盒箱包袋斤千百万亿米里分点钟"
    "天年月周岁倍场次回趟遍顿餐节课道门种样份股批组群套串"
)

# currency symbols → (unit read after the value, fen-style decimals)
_CURRENCIES = {
    "¥": ("元", True), "￥": ("元", True), "$": ("美元", False),
    "€": ("欧元", False), "£": ("英镑", False),
}

# common erhua carriers (WeTextProcessing erhua whitelist shape): 儿 after
# these is the rhotic suffix, dropped when remove_erhua=True
_ERHUA_PRE = "这那哪玩点份劲味门口活窍空盖头年根面边官量花样伴脸条"

# pure filler interjections removed when remove_interjections=True
# (conservative: particles like 吧/嘛/呀 carry meaning and are kept)
_INTERJECTION_RE = re.compile(r"[嗯呃唔噢喔诶欸]+")


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
        v = m.group(1)
        # WTP percent.tsv: -6% reads 负百分之六 (sign OUTSIDE the 百分之)
        if v.startswith("-"):
            return "负百分之" + number_to_hanzi(v[1:])
        return "百分之" + number_to_hanzi(v)

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
        # very long integers are read digit-by-digit (IDs, zip codes);
        # the sign is stripped for the length test and digit reading
        # (digits_to_hanzi has no '-' glyph) and restored as 负
        body = s[1:] if s.startswith("-") else s
        if "." not in body and (
                len(body) > 12 or (body.startswith("0") and len(body) > 1)):
            return ("负" if body is not s else "") + digits_to_hanzi(body)
        return number_to_hanzi(s)

    @staticmethod
    def _money(m: re.Match) -> str:
        """Currency symbol + value → spoken money (ZhNormalizer money.tsv
        behavior): ¥13.5 → 十三元五角, ¥13.55 → 十三元五角五分; foreign
        currencies read the decimal as 点 (e.g. $13.5 → 十三点五美元)."""
        unit, fen_style = _CURRENCIES[m.group(1)]
        value = m.group(2)
        if "." in value and fen_style:
            yuan, frac = value.split(".", 1)
            frac = frac[:2]
            out = int_to_hanzi(int(yuan or 0)) + "元"
            if len(frac) >= 1 and frac[0] != "0":
                out += int_to_hanzi(int(frac[0])) + "角"
            elif len(frac) == 2 and frac[1] != "0":
                out += "零"
            if len(frac) == 2 and frac[1] != "0":
                out += int_to_hanzi(int(frac[1])) + "分"
            return out
        return number_to_hanzi(value) + unit

    def normalize(self, text: str) -> str:
        if self.full_to_half:
            text = unicodedata.normalize("NFKC", text)
        # thousands separators: 1,400,000 → 1400000 (WTP whitelists
        # EXACT 3-digit groups before its number grammar — the (?!\d)
        # guard keeps list-style "1997,2008" as two separate numbers)
        text = re.sub(r"(?<=\d),(?=\d{3}(?!\d))", "", text)
        # temperature: ℃ NFKC-folds to °C; -27°C reads 零下 (WTP
        # measure grammar), positive just appends 摄氏度
        text = re.sub(
            r"(-?)(\d+(?:\.\d+)?)\s*(?:℃|°C)",
            lambda m: ("零下" if m.group(1) else "")
            + number_to_hanzi(m.group(2)) + "摄氏度",
            text,
        )
        # ISO-style dates 2002-01-28 / 2002/01/28 (WTP date.tsv accepts
        # both separators) — before fraction/minus handling would
        # misparse the separators
        text = re.sub(
            r"(?<!\d)(\d{4})[-/](\d{1,2})[-/](\d{1,2})(?!\d)",
            lambda m: digits_to_hanzi(m.group(1)) + "年"
            + int_to_hanzi(int(m.group(2))) + "月"
            + int_to_hanzi(int(m.group(3))) + "日",
            text,
        )
        # ranges: 3-5个 → 三到五个 (before minus/number handling)
        text = re.sub(
            r"(\d+)\s*[-~—至]\s*(\d+)(?=[个件天年人次只张条位名%月])",
            lambda m: self._number_sub(m.group(1)) + "到" + self._number_sub(m.group(2)),
            text,
        )
        # money: currency symbol before the value (after NFKC, ＄→$ etc.)
        text = re.sub(
            r"([¥￥$€£])\s*(\d+(?:\.\d+)?)", self._money, text
        )
        text = re.sub(r"(\d{2,4})年", self._year, text)
        text = re.sub(r"(\d{1,2})月(\d{1,2})(日|号)", self._date_md, text)
        text = re.sub(rf"(-?{_NUM})%", self._percent, text)
        text = re.sub(r"(\d+)/(\d+)", self._fraction, text)
        # clock time: hour ≤ 23 and minutes 00-59; anything else
        # colon-separated falls through to the score rule below
        text = re.sub(
            r"(?<!\d)((?:[01]?\d|2[0-3])):([0-5]\d)(?::([0-5]\d))?(?!\d)",
            self._time, text,
        )
        # sports scores / ratios (WTP sport rule): 3:2 → 三比二
        text = re.sub(
            r"(?<!\d)(\d{1,3}):(\d{1,3})(?!\d)",
            lambda m: int_to_hanzi(int(m.group(1))) + "比"
            + int_to_hanzi(int(m.group(2))),
            text,
        )
        # telephone numbers, digit-by-digit with 1 → 幺 (WTP telephone
        # convention). Context-gated so plain big integers (1000000)
        # keep their whole-number reading: either a telephony noun
        # prefix, a mobile-shaped 1[3-9]··· 11-digit run, or an
        # area-code 0···-······· dashed pair.
        text = re.sub(
            r"((?:电话|手机|固话|座机|热线|号码|传真|短信|拨打|致电)"
            r"[:：]?\s*)((?:\d{3,4}-)?\d{5,12})(?!\d)",
            lambda m: m.group(1) + digits_to_hanzi(
                m.group(2).replace("-", ""), phone_style=True),
            text,
        )
        text = re.sub(
            r"(?<!\d)(?:1[3-9]\d{9}|0\d{2,3}-\d{7,8})(?!\d)",
            lambda m: digits_to_hanzi(m.group(0).replace("-", ""),
                                      phone_style=True),
            text,
        )
        # alphanumeric serials (A380, MP3, G1024): digits read one by one
        text = re.sub(
            r"(?<=[A-Za-z])(\d+)(?!\.\d)",
            lambda m: digits_to_hanzi(m.group(1)), text,
        )
        # measure-word reading of 2: 2个 → 两个 (a standalone final 2
        # before a measure word reads 两, ZhNormalizer measure behavior);
        # 22个 keeps 二十二个 via the generic rule. 月 is excluded: a
        # bare "2月" is a date (二月), never a duration (durations use
        # 个月, caught by 个)
        # (?<!\d\.) keeps the 2 of a decimal fraction (1.2米) for the
        # generic decimal rule — 一点二米, not 一两米
        # 第2名 is ordinal 第二, never 第两 (WTP ordinal precedes measure)
        text = re.sub(
            rf"(?<!\d)(?<!\d\.)(?<!第)2(?=[{_MEASURES.replace('月', '')}])",
            "两", text,
        )
        text = re.sub(r"-?\d+(?:\.\d+)?", self._number, text)
        if self.remove_erhua:
            text = re.sub(rf"(?<=[{_ERHUA_PRE}])儿", "", text)
        if self.remove_interjections:
            text = _INTERJECTION_RE.sub("", text)
        if self.remove_puncts:
            text = _PUNCT_RE.sub("", text)
        text = re.sub(r"\s+", " ", text).strip()
        return text

    @staticmethod
    def _number_sub(s: str) -> str:
        return number_to_hanzi(s)
