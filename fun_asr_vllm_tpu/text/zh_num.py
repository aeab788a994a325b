"""Chinese number verbalization / parsing primitives.

Shared by the rule-based ZhNormalizer (TN: digits → hanzi) and
ZhInverseNormalizer (ITN: hanzi → digits). These stand in for
WeTextProcessing's OpenFst grammars (reference kaldi_text_normalizer.py:78-90,
kaldi_text_itn.py:38-45) in environments without that C++ dependency; both
directions are self-consistent so CER scoring (which normalizes ref and hyp
identically) is unaffected by grammar differences.
"""

from __future__ import annotations

from typing import Tuple

DIGITS = "零一二三四五六七八九"
DIGIT_OF = {str(i): DIGITS[i] for i in range(10)}
VALUE_OF = {c: i for i, c in enumerate(DIGITS)}
VALUE_OF.update({"两": 2, "幺": 1, "壹": 1, "贰": 2, "叁": 3, "肆": 4,
                 "伍": 5, "陆": 6, "柒": 7, "捌": 8, "玖": 9})
SMALL_UNITS = {"十": 10, "拾": 10, "百": 100, "佰": 100, "千": 1000, "仟": 1000}
BIG_UNITS = {"万": 10_000, "亿": 100_000_000}
NUM_CHARS = set(VALUE_OF) | set(SMALL_UNITS) | set(BIG_UNITS)


def digits_to_hanzi(s: str, phone_style: bool = False) -> str:
    """Read a digit string digit-by-digit ('2024' → '二零二四').

    phone_style reads 1 as 幺 (telephone convention)."""
    out = []
    for ch in s:
        if ch == "1" and phone_style:
            out.append("幺")
        else:
            out.append(DIGIT_OF[ch])
    return "".join(out)


def _section_to_hanzi(n: int) -> str:
    """0 <= n < 10000 → hanzi, no leading 零, standard unit reading."""
    if n == 0:
        return "零"
    units = [(1000, "千"), (100, "百"), (10, "十")]
    out = []
    need_zero = False
    for base, unit in units:
        d = n // base
        n %= base
        if d == 0:
            if out:
                need_zero = True
            continue
        if need_zero:
            out.append("零")
            need_zero = False
        out.append(DIGITS[d] + unit)
    if n > 0:
        if need_zero:
            out.append("零")
        out.append(DIGITS[n])
    return "".join(out)


def int_to_hanzi(n: int) -> str:
    """Integer → standard hanzi reading with 万/亿 grouping."""
    if n < 0:
        return "负" + int_to_hanzi(-n)
    if n == 0:
        return "零"
    sections = []  # least-significant first, each < 10000
    while n > 0:
        sections.append(n % 10_000)
        n //= 10_000
    unit_names = ["", "万", "亿", "万亿"]
    out = []
    for idx in reversed(range(len(sections))):
        sec = sections[idx]
        if sec == 0:
            continue
        part = _section_to_hanzi(sec)
        # inter-section zero: e.g. 100001 → 十万零一
        if idx + 1 < len(sections) and sections[idx + 1] != 0 and sec < 1000:
            part = "零" + part
        out.append(part + unit_names[idx])
    text = "".join(out)
    # idiomatic: 一十X → 十X at the very front
    if text.startswith("一十"):
        text = text[1:]
    return text


def number_to_hanzi(s: str) -> str:
    """Verbalize a decimal number string (may contain '.', leading '-')."""
    neg = s.startswith("-") or s.startswith("−")
    if neg:
        s = s[1:]
    if "." in s:
        int_part, frac = s.split(".", 1)
        int_part = int_part or "0"
        text = int_to_hanzi(int(int_part)) + "点" + digits_to_hanzi(frac)
    else:
        text = int_to_hanzi(int(s))
    return ("负" if neg else "") + text


def parse_hanzi_number(s: str) -> Tuple[int, bool]:
    """Parse a hanzi integer ('三百二十一' → 321).

    Returns (value, is_spelled_out) where is_spelled_out means the string
    was a plain digit-by-digit reading ('二零二四')."""
    if not s:
        raise ValueError("empty")
    # digit-by-digit reading: all plain digits, len > 1, e.g. 二零二四 / 幺三九
    if len(s) > 1 and all(c in VALUE_OF for c in s):
        return int("".join(str(VALUE_OF[c]) for c in s)), True
    total = 0    # completed value across big-unit boundaries
    section = 0  # accumulated value below the next big unit
    num = 0      # pending digit value
    for ch in s:
        if ch in VALUE_OF:
            num = VALUE_OF[ch]
        elif ch in SMALL_UNITS:
            unit = SMALL_UNITS[ch]
            if num == 0:
                num = 1  # 十三 → 13
            section += num * unit
            num = 0
        elif ch in BIG_UNITS:
            unit = BIG_UNITS[ch]
            section += num
            if unit >= 100_000_000:
                # 亿 scales EVERYTHING accumulated so far: 三万亿 =
                # (3·10⁴)·10⁸ = 3·10¹², 五千万亿 = (5·10⁷)·10⁸
                total = (total + section) * unit
            else:
                # 万 scales only the current sub-亿 section
                total += section * unit
            section = 0
            num = 0
        else:
            raise ValueError(f"not a number char: {ch}")
    return total + section + num, False
