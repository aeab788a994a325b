"""Rule-based Chinese inverse text normalization (ITN: spoken → written).

Stand-in for WeTextProcessing's
``itn.chinese.inverse_normalizer.InverseNormalizer(enable_0_to_9=False)``
(reference kaldi_text_itn.py:38-45): hanzi number words become digits, but
bare single digits below ten are left verbalized (enable_0_to_9=False
semantics), so "三个人" stays while "三十二个人" → "32个人".
"""

from __future__ import annotations

import re

from .zh_num import BIG_UNITS, NUM_CHARS, SMALL_UNITS, VALUE_OF, parse_hanzi_number

_NUM_RUN_RE = re.compile(
    "[" + "".join(sorted(NUM_CHARS | {"点"})) + "]+"
)


def _is_shi_idiom(text: str, start: int, end: int) -> bool:
    """Lexical (non-numeric) uses of bare 十, mirroring WeTextProcessing's
    whitelist (reference kaldi_text_itn.py:38-45 InverseNormalizer config):
    十分 as the adverb "very" (but 十分钟/十分之 are measures and convert),
    十足, 十全十美, 十字."""
    follow = text[end:]
    if text[:start].endswith("十全") and follow.startswith("美"):
        return True  # the second 十 of 十全十美
    if follow.startswith("分") and not follow.startswith(("分钟", "分之")):
        return True
    return follow.startswith(("足", "全十美", "字"))


def _format_number(run: str, enable_0_to_9: bool) -> str:
    # split off decimal part
    if "点" in run:
        int_part, _, frac_part = run.partition("点")
        if not int_part or not frac_part or not all(c in VALUE_OF for c in frac_part):
            return run
        try:
            iv, _ = parse_hanzi_number(int_part)
        except ValueError:
            return run
        frac = "".join(str(VALUE_OF[c]) for c in frac_part)
        return f"{iv}.{frac}"
    try:
        value, spelled = parse_hanzi_number(run)
    except ValueError:
        return run
    if spelled:
        # digit-by-digit readings (years, phone): always convert
        return "".join(str(VALUE_OF[c]) for c in run)
    if not enable_0_to_9 and value < 10 and len(run) == 1:
        return run
    return str(value)


class ZhInverseNormalizer:
    def __init__(self, cache_dir: str = None, enable_0_to_9: bool = False,
                 overwrite_cache: bool = False) -> None:
        self.enable_0_to_9 = enable_0_to_9

    def normalize(self, text: str) -> str:
        # percent first: 百分之五 → 5%, 百分之五点五 → 5.5% (the hanzi
        # value inside always digitizes, matching WeTextProcessing)
        def pct_repl(m: re.Match) -> str:
            inner = m.group(1)
            formatted = _format_number(inner, True)
            return formatted + "%" if formatted != inner else m.group(0)

        # (lookbehind: 三百分之一 is the fraction 1/300, not 三 + 1%)
        num_chars = "".join(sorted(NUM_CHARS))
        text = re.sub(
            f"(?<![{num_chars}])百分之([" + "".join(sorted(NUM_CHARS | {"点"}))
            + "]+)",
            pct_repl, text,
        )

        # fractions: X分之Y → Y/X (WeTextProcessing fraction.tsv), before
        # the generic run rule would leave "10分之3"
        num_cls = "[" + "".join(sorted(NUM_CHARS)) + "]+"

        def frac_repl(m: re.Match) -> str:
            den = _format_number(m.group(1), True)
            num = _format_number(m.group(2), True)
            if den == m.group(1) or num == m.group(2):
                return m.group(0)
            return f"{num}/{den}"

        # numerator/denominator may be decimal (五分之二点五 → 2.5/5)
        num_dec = f"{num_cls}(?:点{num_cls})?"
        text = re.sub(f"({num_dec})分之({num_dec})", frac_repl, text)

        def repl(m: re.Match) -> str:
            run = m.group(0)
            # leading big unit = lexical idiom (万一, 亿万, 万万), never a
            # spoken number — a value always precedes 万/亿
            if run[0] in BIG_UNITS:
                return run
            # otherwise require a digit char, except 十-leading readings
            # (十三 has one; bare 十 = 10 converts under enable_0_to_9=False)
            if not any(c in VALUE_OF for c in run) and run[0] != "十":
                return run
            if run == "十" and _is_shi_idiom(m.string, m.start(), m.end()):
                # lexical 十 idioms (十分高兴, 十足, 十全十美, 十字路口) —
                # WeTextProcessing protects these via its whitelist
                return run
            trail = len(run) - len(run.rstrip("点"))
            return (_format_number(run.rstrip("点"), self.enable_0_to_9)
                    + "点" * trail)

        out = _NUM_RUN_RE.sub(repl, text)
        # percent over already-digitized values: 百分之32 → 32%
        out = re.sub(r"百分之(\d+(?:\.\d+)?)", r"\1%", out)
        return out


def inverse_normalize_text(text: str, language: str = "auto") -> str:
    """Reference kaldi_text_itn.py:21-58: zh → ITN; en → punctuation-spacing
    fixes only."""
    from .normalize import detect_language

    lang = detect_language(text) if language == "auto" else language
    if lang == "zh":
        return ZhInverseNormalizer().normalize(text)
    # en: the reference's punctuation-spacing rules verbatim
    # (kaldi_text_itn.py:50-58) — the digit lookarounds protect decimals
    # like 3.14, the bracket guard avoids "). " splits
    import unicodedata

    out = unicodedata.normalize("NFKC", text)
    out = re.sub(r"\s+([,.!?;:])(?!\d)", r"\1", out)
    out = re.sub(r"([,.!?;:])(?=\S)(?<!\d[.,])(?!\s*[\)\]’”])", r"\1 ", out)
    out = re.sub(r"(\w)\s*-\s*(\w)", r"\1-\2", out)
    return out
