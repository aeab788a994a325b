"""Text/scoring layer tests.

The zh/en mixed pair below is the reference's own self-test input
(reference compute_wer_line.py:453-465) — the expected counts were derived
by running the reference algorithm's DP semantics by hand.
"""

import io

import pytest

from fun_asr_vllm_tpu.text import (
    Calculator,
    EnNormalizer,
    ZhInverseNormalizer,
    ZhNormalizer,
    align,
    characterize,
    compute_wer_line,
    detect_language,
    inverse_normalize_text,
    normalize_text,
    normalize_text_alimeeting,
    store_transcripts,
    strip_tags,
    write_error_stats,
)
from fun_asr_vllm_tpu.text.zh_num import (
    digits_to_hanzi,
    int_to_hanzi,
    parse_hanzi_number,
)


class TestCharacterize:
    def test_cjk_splits_per_char(self):
        assert characterize("你好世界") == ["你", "好", "世", "界"]

    def test_latin_words_stay_whole(self):
        assert characterize("hello world") == ["hello", "world"]

    def test_mixed(self):
        assert characterize("我用iphone打电话") == [
            "我", "用", "iphone", "打", "电", "话",
        ]

    def test_tags_are_single_tokens(self):
        assert characterize("<unk><noise>你") == ["<unk>", "<noise>", "你"]

    def test_puncts_dropped(self):
        assert characterize("你好，世界。") == ["你", "好", "世", "界"]
        assert characterize("a, b.") == ["a", "b"]

    def test_strip_tags(self):
        assert strip_tags("<unk>") == ""
        assert strip_tags("a<x>b") == "ab"


class TestAlign:
    def test_identity(self):
        assert align(["a", "b"], ["a", "b"]) == [("a", "a"), ("b", "b")]

    def test_sub_del_ins(self):
        pairs = align(["a", "b", "c"], ["a", "x", "c", "d"])
        assert ("a", "a") in pairs and ("c", "c") in pairs
        assert ("b", "x") in pairs
        assert ("*", "d") in pairs

    def test_empty_sides(self):
        assert align([], ["a"]) == [("*", "a")]
        assert align(["a"], []) == [("a", "*")]


class TestWer:
    def test_perfect(self):
        r = compute_wer_line("今天天气不错", "今天天气不错")
        assert r["stats"]["wer"] == 0.0
        assert r["stats"]["all"] == 6
        assert r["stats"]["cor"] == 6

    def test_one_sub(self):
        r = compute_wer_line("今天天气不错", "今天天汽不错")
        assert r["stats"]["sub"] == 1
        # fraction scale, matching the reference's stats dict
        # (compute_wer_line.py:394 returns wer/100.0)
        assert abs(r["stats"]["wer"] - 1.0 / 6) < 1e-9

    def test_case_insensitive(self):
        r = compute_wer_line("hello world", "HELLO WORLD")
        assert r["stats"]["wer"] == 0.0

    def test_mixed_zh_en(self):
        # the reference's own __main__ example shape: zh chars + en words
        ref = "我们 今天 使用 GPU 训练"
        hyp = "我们 今天 使用 CPU 训练"
        r = compute_wer_line(ref, hyp)
        assert r["stats"]["sub"] == 1
        assert r["stats"]["all"] == 9  # 8 zh chars + 1 en word

    def test_alignment_lists_same_length(self):
        r = compute_wer_line("abc def", "abc xyz qqq")
        assert len(r["lab"]) == len(r["rec"])

    def test_edit_distance_is_minimal(self):
        r = compute_wer_line("abc", "abc def ghi")  # tochar en words
        assert r["stats"]["ins"] == 2

    def test_calculator_accumulates(self):
        c = Calculator()
        c.calculate(["你", "好"], ["你", "坏"])
        c.calculate(["你"], ["你"])
        ov = c.overall()
        assert ov["all"] == 3 and ov["cor"] == 2 and ov["sub"] == 1
        assert c.cluster(["你"]) == {"all": 2, "cor": 2, "sub": 0, "ins": 0, "del": 0}


class TestErrorStats:
    def test_report_sections_and_wer(self, tmp_path):
        results = [
            ("utt1", "今天天气", "今天天汽"),
            ("utt2", "不错", "不错"),
        ]
        buf = io.StringIO()
        wer = write_error_stats(buf, "test", results, enable_log=False)
        text = buf.getvalue()
        assert "%WER = 16.67" in text  # 1 sub / 6 ref chars
        assert abs(wer - 100.0 / 6) < 1e-9
        for section in ("PER-UTT DETAILS", "SUBSTITUTIONS:", "DELETIONS:",
                        "INSERTIONS:", "PER-WORD STATS:"):
            assert section in text
        assert "(气->汽)" in text

        p = tmp_path / "hypos.txt"
        store_transcripts(str(p), results)
        lines = p.read_text().splitlines()
        assert lines[0] == "utt1:\tref=今天天气"
        assert lines[1] == "utt1:\thyp=今天天汽"


class TestDetectLanguage:
    def test_zh(self):
        assert detect_language("今天天气不错") == "zh"

    def test_en(self):
        assert detect_language("this is an english sentence") == "en"

    def test_mixed_threshold(self):
        # reference semantics: ascii-letter ratio over letter+han chars;
        # a higher threshold keeps mostly-zh sentences zh
        s = "我有一个iPhone但是我很少用它打电话发短信"
        assert detect_language(s, en_ratio_threshold=0.5) == "zh"
        assert detect_language(s, en_ratio_threshold=0.2) == "en"


class TestAlimeeting:
    def test_cleanup(self):
        assert normalize_text_alimeeting("你 好，世界。") == "你好世界"
        assert normalize_text_alimeeting("<sil>abc<%>") == "ABC"
        assert normalize_text_alimeeting("ａｂｃ") in ("ABC", "ABC")


class TestZhNum:
    def test_int_to_hanzi(self):
        assert int_to_hanzi(0) == "零"
        assert int_to_hanzi(10) == "十"
        assert int_to_hanzi(14) == "十四"
        assert int_to_hanzi(25) == "二十五"
        assert int_to_hanzi(105) == "一百零五"
        assert int_to_hanzi(110) == "一百一十"
        assert int_to_hanzi(1001) == "一千零一"
        assert int_to_hanzi(10000) == "一万"
        assert int_to_hanzi(100010) == "十万零一十"
        assert int_to_hanzi(123456789) == "一亿二千三百四十五万六千七百八十九"

    def test_digits_to_hanzi(self):
        assert digits_to_hanzi("2024") == "二零二四"
        assert digits_to_hanzi("13901234567", phone_style=True) == \
            "幺三九零幺二三四五六七"

    def test_parse_roundtrip(self):
        for n in (0, 5, 10, 14, 25, 105, 110, 1001, 10000, 100010,
                  123456789, 200000000):
            v, spelled = parse_hanzi_number(int_to_hanzi(n))
            assert not spelled
            assert v == n, int_to_hanzi(n)

    def test_parse_spelled(self):
        v, spelled = parse_hanzi_number("二零二四")
        assert spelled and v == 2024


class TestZhTN:
    def setup_method(self):
        self.tn = ZhNormalizer(remove_puncts=True)

    def test_numbers(self):
        assert self.tn.normalize("我有25个苹果") == "我有二十五个苹果"

    def test_year(self):
        assert self.tn.normalize("2024年") == "二零二四年"

    def test_percent(self):
        assert self.tn.normalize("增长了3.5%") == "增长了百分之三点五"

    def test_time(self):
        assert self.tn.normalize("上午8:30开会") == "上午八点三十分开会"

    def test_punct_removed(self):
        assert self.tn.normalize("你好，世界！") == "你好世界"

    def test_date(self):
        assert self.tn.normalize("3月15日") == "三月十五日"

    def test_decimal(self):
        assert self.tn.normalize("价格是12.5元") == "价格是十二点五元"

    def test_comma_grouping_exact_3_digit_groups_only(self):
        """WTP whitelists EXACT 3-digit comma groups; list-style
        "1997,2008" must stay two numbers (round-5 review fix)."""
        assert self.tn.normalize("总额1,400,000元") == "总额一百四十万元"
        assert self.tn.normalize("价格12,345元") == "价格一万二千三百四十五元"
        # full-width list comma between two 4-digit years: NOT a group
        assert (self.tn.normalize("1997，2008年")
                == "一千九百九十七二零零八年")
        assert self.tn.normalize("列表1,2345") == "列表一二千三百四十五"

    def test_signed_long_serial_no_crash(self):
        """Digit-by-digit long-integer reading must survive a sign
        (digits_to_hanzi has no '-' glyph; round-5 review fix)."""
        assert (self.tn.normalize("编号-9999999999999")
                == "编号负九九九九九九九九九九九九九")
        assert (self.tn.normalize("编号9999999999999")
                == "编号九九九九九九九九九九九九九")

    def test_money_symbols(self):
        """ZhNormalizer money coverage (VERDICT r2 item 7, reference
        kaldi_text_normalizer.py:78-90)."""
        assert self.tn.normalize("售价¥13.5") == "售价十三元五角"
        assert self.tn.normalize("¥13.55") == "十三元五角五分"
        assert self.tn.normalize("¥200") == "二百元"
        assert self.tn.normalize("$13.5") == "十三点五美元"
        assert self.tn.normalize("€20") == "二十欧元"

    def test_measure_word_liang(self):
        assert self.tn.normalize("买了2个苹果") == "买了两个苹果"
        assert self.tn.normalize("2天后") == "两天后"
        assert self.tn.normalize("22个人") == "二十二个人"
        assert self.tn.normalize("2.5个") == "二点五个"
        # bare 月 is a DATE (二月), not a 两-measure — durations use 个月
        assert self.tn.normalize("我2月去北京") == "我二月去北京"
        assert self.tn.normalize("住了2个月") == "住了两个月"
        # the 2 of a decimal fraction is NOT a measure reading
        assert self.tn.normalize("1.2米") == "一点二米"
        assert self.tn.normalize("3.2个") == "三点二个"

    def test_alphanumeric_serial(self):
        assert self.tn.normalize("坐A380去") == "坐A三八零去"
        assert self.tn.normalize("MP3播放器") == "MP三播放器"

    def test_ordinal(self):
        assert self.tn.normalize("第3名") == "第三名"

    def test_erhua_toggle(self):
        keep = ZhNormalizer(remove_erhua=False)
        drop = ZhNormalizer(remove_erhua=True)
        assert keep.normalize("在这儿玩儿") == "在这儿玩儿"
        assert drop.normalize("在这儿玩儿") == "在这玩"
        # 儿 after a non-erhua carrier is a real morpheme and stays
        assert drop.normalize("女儿") == "女儿"
        # 儿 itself is not an erhua carrier (regression: a stray 儿 in
        # the carrier class stripped the 儿 of 儿歌 after another 儿)
        assert drop.normalize("这儿儿歌真好听") == "这儿歌真好听"

    def test_interjection_toggle(self):
        keep = ZhNormalizer(remove_interjections=False)
        drop = ZhNormalizer(remove_interjections=True)
        assert keep.normalize("嗯这个呃可以") == "嗯这个呃可以"
        assert drop.normalize("嗯这个呃可以") == "这个可以"


class TestZhTNDivergence:
    """Compare the built-in grammar against WeTextProcessing on a
    generated number-heavy corpus (VERDICT r2 item 7). Skipped when the
    plug-in is absent (this environment); on a host with WeTextProcessing
    installed it quantifies the built-in's divergence rate."""

    def test_divergence_rate_on_number_corpus(self):
        pytest.importorskip("tn.chinese.normalizer")
        from tn.chinese.normalizer import Normalizer as WTPNormalizer

        wtp = WTPNormalizer(remove_erhua=False, remove_interjections=False,
                            remove_puncts=True)
        ours = ZhNormalizer(remove_puncts=True)
        import random

        rng = random.Random(0)
        templates = [
            "价格是{n}元", "增长了{n}%", "买了{m}个苹果", "第{m}名",
            "{y}年{mo}月{d}日", "上午{h}:{mi:02d}开会", "大约{n}公里",
            "售价¥{n}", "电话01085512345", "{m}天后见", "一共{big}人",
        ]
        total = diverged = 0
        for _ in range(200):
            t = rng.choice(templates)
            s = t.format(
                n=round(rng.uniform(0, 999), rng.choice([0, 1, 2])),
                m=rng.randint(1, 99), y=rng.randint(1980, 2030),
                mo=rng.randint(1, 12), d=rng.randint(1, 28),
                h=rng.randint(0, 23), mi=rng.randint(0, 59),
                big=rng.randint(1000, 9_999_999),
            )
            total += 1
            if wtp.normalize(s) != ours.normalize(s):
                diverged += 1
        assert diverged / total < 0.05, f"{diverged}/{total} diverged"


class TestZhTNGolden:
    """Non-skipping divergence gate for the built-in zh TN grammar
    (VERDICT r4 ask #6): 260 hand-derived WeTextProcessing-expected
    outputs across the enumerable grammar categories (dates, times,
    money, phones, percents, fractions, scores, temperatures, measures,
    serials, comma grouping, punct/erhua/interjection config). Corpus:
    tests/data/zh_tn_golden.tsv, regenerated by
    tools/make_zh_tn_golden.py. Budget recorded in PARITY.md."""

    BUDGET = 0.02  # measured 0/260 at round 5; headroom for rule drift

    def _load(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "data",
                            "zh_tn_golden.tsv")
        cases = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                if line.startswith("#"):
                    continue
                cat, src, exp = line.rstrip("\n").split("\t")
                cases.append((cat, src, exp))
        assert len(cases) >= 250
        return cases

    def test_divergence_budget(self):
        tn = ZhNormalizer(remove_puncts=True)
        cases = self._load()
        fails = [(c, s, e, tn.normalize(s)) for c, s, e in cases
                 if tn.normalize(s) != e]
        rate = len(fails) / len(cases)
        assert rate <= self.BUDGET, (
            f"{len(fails)}/{len(cases)} = {rate:.1%} diverged; first: "
            + "; ".join(f"{c}:{s!r} want {e!r} got {g!r}"
                        for c, s, e, g in fails[:5]))

    def test_goldens_against_wetextprocessing(self):
        """When the OpenFst plug-in IS present, audit the hand-derived
        goldens themselves: the corpus must agree with the real
        ZhNormalizer within the same budget (catches wrong goldens)."""
        pytest.importorskip("tn.chinese.normalizer")
        from tn.chinese.normalizer import Normalizer as WTPNormalizer

        wtp = WTPNormalizer(remove_erhua=False, remove_interjections=False,
                            remove_puncts=True)
        cases = self._load()
        bad = [(c, s, e, wtp.normalize(s)) for c, s, e in cases
               if wtp.normalize(s) != e]
        assert len(bad) / len(cases) <= 0.05, (
            f"{len(bad)}/{len(cases)} goldens disagree with WTP; first: "
            + "; ".join(f"{c}:{s!r} golden {e!r} wtp {g!r}"
                        for c, s, e, g in bad[:5]))


class TestEnTNDivergence:
    """Built-in EN grammar vs WeTextProcessing on a generated
    number-heavy corpus (mirror of TestZhTNDivergence). Skipped when the
    plug-in is absent (this environment)."""

    def test_divergence_rate_on_number_corpus(self):
        pytest.importorskip("tn.english.normalizer")
        from tn.english.normalizer import Normalizer as WTPEnNormalizer

        wtp = WTPEnNormalizer()
        ours = EnNormalizer()
        import random

        rng = random.Random(0)
        templates = [
            "the price is ${n}", "about {m}% done", "he came {m}st",
            "meet at {h}:{mi:02d}", "a {m}km run", "born in {y}",
            "{big} people", "add 1/2 cup", "it was -{m} degrees",
        ]
        total = diverged = 0
        for _ in range(200):
            t = rng.choice(templates)
            s = t.format(
                n=round(rng.uniform(0, 999), rng.choice([0, 1, 2])),
                m=rng.randint(1, 99), y=rng.randint(1980, 2030),
                h=rng.randint(1, 12), mi=rng.randint(0, 59),
                big=rng.randint(1000, 9_999_999),
            )
            total += 1
            import re as _re
            canon = lambda x: _re.sub(r"\s+", " ", x.lower()).strip()
            if canon(wtp.normalize(s)) != canon(ours.normalize(s)):
                diverged += 1
        assert diverged / total < 0.10, f"{diverged}/{total} diverged"


class TestZhITN:
    def setup_method(self):
        self.itn = ZhInverseNormalizer(enable_0_to_9=False)

    def test_big_number(self):
        assert self.itn.normalize("三十二个人") == "32个人"

    def test_single_digit_kept(self):
        # enable_0_to_9=False: bare digits below ten stay verbalized
        assert self.itn.normalize("三个人") == "三个人"

    def test_decimal(self):
        assert self.itn.normalize("三点五公里") == "3.5公里"

    def test_percent(self):
        assert self.itn.normalize("百分之三十") == "30%"

    def test_spelled_year(self):
        assert self.itn.normalize("二零二四年") == "2024年"

    def test_api(self):
        out = inverse_normalize_text("一共五十六元", language="zh")
        assert out == "一共56元"


class TestEnTN:
    def setup_method(self):
        self.n = EnNormalizer()

    def test_numbers(self):
        out = self.n.normalize("I have 25 apples")
        assert "twenty five" in out

    def test_ordinals(self):
        out = self.n.normalize("she was 1st he was 22nd on the 103rd floor")
        assert out == "she was first he was twenty second on the one hundred third floor"

    def test_time(self):
        assert self.n.normalize("at 3:30 pm") == "at three thirty p m"
        assert self.n.normalize("at 7:05") == "at seven oh five"
        assert self.n.normalize("at 12:00") == "at twelve o'clock"

    def test_time_invalid_clock_left_alone(self):
        # 3:75 is not a clock time; the colon is stripped as punctuation
        # and the digits verbalize independently
        out = self.n.normalize("won 3:75")
        assert "seventy five" in out

    def test_money_cents(self):
        assert self.n.normalize("paid $3.50") == "paid three dollars and fifty cents"
        assert self.n.normalize("paid $1") == "paid one dollar"
        assert self.n.normalize("paid £5") == "paid five pounds"

    def test_fractions(self):
        assert self.n.normalize("add 1/2 cup") == "add one half cup"
        assert self.n.normalize("2/5 done") == "two fifths done"
        assert self.n.normalize("3/4 left") == "three quarters left"

    def test_units(self):
        assert self.n.normalize("a 5km run") == "a five kilometers run"
        assert self.n.normalize("weighs 3.5 kg") == "weighs three point five kilograms"

    def test_negative(self):
        assert self.n.normalize("it was -5 out") == "it was minus five out"

    def test_thousands_separators(self):
        assert self.n.normalize("1,234 items") == "one thousand two hundred thirty four items"

    def test_years(self):
        assert self.n.normalize("born 1987") == "born nineteen eighty seven"
        assert self.n.normalize("by 2025") == "by twenty twenty five"

    def test_time_suffix_word_boundary(self):
        # the am/pm group must not eat the front of the next word
        assert (self.n.normalize("at 3:45 american diner")
                == "at three forty five american diner")
        assert (self.n.normalize("3:30 among friends")
                == "three thirty among friends")

    def test_comma_groups_with_symbols(self):
        assert (self.n.normalize("$1,234")
                == "one thousand two hundred thirty four dollars")
        assert (self.n.normalize("1,234% up")
                == "one thousand two hundred thirty four percent up")
        assert ("one thousand two hundred thirty four point five six"
                in self.n.normalize("1,234.56 items"))

    def test_24h_time_reads_as_is(self):
        assert self.n.normalize("at 15:30") == "at fifteen thirty"

    def test_slash_kept(self):
        # the reference EN cleanup keeps slashes/hyphens/apostrophes
        assert self.n.normalize("and/or") == "and/or"

    def test_normalize_text_api_en(self):
        out = normalize_text("I have 25 apples.", language="en")
        assert out == "i have twenty five apples"

    def test_normalize_text_api_zh(self):
        out = normalize_text("我有25个苹果。", language="zh")
        assert out == "我有二十五个苹果"

    def test_tag_removal(self):
        assert normalize_text("<noise>你好", language="zh") == "你好"


class TestWerProperty:
    """Property tests: the production DP must equal a brute-force
    Levenshtein on random token sequences (metric correctness beyond the
    fixed reference examples)."""

    @staticmethod
    def _brute_distance(ref, hyp):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                       d(i - 1, j - 1) + cost)

        return d(len(ref), len(hyp))

    def test_random_sequences_match_brute_force(self):
        import random

        from fun_asr_vllm_tpu.text.wer import compute_wer_line

        rng = random.Random(0)
        alphabet = "abcdefg"
        for trial in range(40):
            n, m = rng.randint(0, 12), rng.randint(0, 12)
            ref = " ".join(rng.choice(alphabet) for _ in range(n))
            hyp = " ".join(rng.choice(alphabet) for _ in range(m))
            if not ref.strip():
                continue
            res = compute_wer_line(ref, hyp, tochar=False)
            s = res["stats"]
            total_err = s["sub"] + s["del"] + s["ins"]
            want = self._brute_distance(tuple(ref.split()),
                                        tuple(hyp.split()))
            assert total_err == want, (ref, hyp, s)
            # invariants
            assert s["cor"] + s["sub"] + s["del"] == s["all"] == n
            # fraction scale (reference compute_wer_line.py:394)
            assert abs(s["wer"] - total_err / max(n, 1)) < 1e-8

    def test_cjk_char_tokenization_property(self):
        import random

        from fun_asr_vllm_tpu.text.wer import compute_wer_line

        rng = random.Random(1)
        chars = "今天天气不错我们去公园玩"
        for _ in range(20):
            ref = "".join(rng.choice(chars) for _ in range(rng.randint(1, 10)))
            hyp = "".join(rng.choice(chars) for _ in range(rng.randint(0, 10)))
            res = compute_wer_line(ref, hyp, tochar=True)
            s = res["stats"]
            want = self._brute_distance(tuple(ref), tuple(hyp))
            assert s["sub"] + s["del"] + s["ins"] == want


class TestItnReviewFixes:
    def test_big_unit_composition(self):
        from fun_asr_vllm_tpu.text.zh_num import (
            int_to_hanzi, parse_hanzi_number,
        )

        assert parse_hanzi_number("三万亿")[0] == 3_000_000_000_000
        assert parse_hanzi_number("五千万亿")[0] == 5_000_000_000_000_000
        assert parse_hanzi_number("三亿五千万")[0] == 350_000_000
        assert parse_hanzi_number("十二万三千四百五十六")[0] == 123456
        for v in (3_000_000_000_000, 123456, 100001, 200500):
            assert parse_hanzi_number(int_to_hanzi(v))[0] == v

    def test_idioms_and_units(self):
        from fun_asr_vllm_tpu.text.zh_itn import inverse_normalize_text

        assert inverse_normalize_text("万一下雨怎么办", "zh") == "万一下雨怎么办"
        assert inverse_normalize_text("十个人", "zh") == "10个人"
        assert inverse_normalize_text("百分之五十", "zh") == "50%"
        assert inverse_normalize_text("百分之五点五", "zh") == "5.5%"

    def test_shi_idioms_not_digitized(self):
        """ADVICE r2: lexical 十 must not become 10 (WeTextProcessing
        whitelist behavior), while measure readings still convert."""
        from fun_asr_vllm_tpu.text.zh_itn import inverse_normalize_text

        assert inverse_normalize_text("十分感谢", "zh") == "十分感谢"
        assert inverse_normalize_text("信心十足", "zh") == "信心十足"
        assert inverse_normalize_text("十全十美", "zh") == "十全十美"
        assert inverse_normalize_text("十字路口", "zh") == "十字路口"
        # measures still digitize
        assert inverse_normalize_text("等了十分钟", "zh") == "等了10分钟"
        assert inverse_normalize_text("十个人", "zh") == "10个人"
        assert inverse_normalize_text("三十分", "zh") == "30分"

    def test_fractions(self):
        from fun_asr_vllm_tpu.text.zh_itn import inverse_normalize_text

        assert inverse_normalize_text("十分之三", "zh") == "3/10"
        assert inverse_normalize_text("四分之一", "zh") == "1/4"
        assert inverse_normalize_text("三百分之一", "zh") == "1/300"
        assert inverse_normalize_text("百分之五十", "zh") == "50%"
        # decimal numerators/denominators stay inside the fraction
        assert inverse_normalize_text("五分之二点五", "zh") == "2.5/5"
        assert inverse_normalize_text("二点五分之五", "zh") == "5/2.5"

    def test_en_decimal_and_hyphen(self):
        from fun_asr_vllm_tpu.text.zh_itn import inverse_normalize_text

        assert (inverse_normalize_text("the value is 3.14 , ok", "en")
                == "the value is 3.14, ok")
        assert (inverse_normalize_text("well - known fact", "en")
                == "well-known fact")

    def test_literal_star_not_miscounted(self):
        import io

        from fun_asr_vllm_tpu.text.error_stats import write_error_stats

        f = io.StringIO()
        assert write_error_stats(f, "t", [("u1", "a*b", "a*b")]) == 0.0


class TestComputeWerLineReferenceGoldens:
    """Byte-level conformance pins for compute_wer_line's verbose output
    and stats dict. The expected strings were GENERATED by executing the
    unmodified reference compute_wer_line.py on these inputs (round-3
    conformance session; a 1500-pair random fuzz matched byte-for-byte).
    stats.wer is a fraction, matching reference :394."""

    CASES = [
        ("Hello world, everyone. 你好世界！", "hello, anyone. 你好好四姐。",
         {"wer": 5 / 7, "all": 7, "cor": 3, "sub": 3, "del": 1, "ins": 1},
         "WER: 71.43 % N=7 C=3 S=3 D=1 I=1\n"
         "lab: HELLO WORLD  EVERYONE 你 好 世 界    \n"
         "rec: HELLO ANYONE          你 好 好 四 姐 \n"
         + "=" * 75 + "\n\n"
         "Overall -> 71.43 % N=7 C=3 S=3 D=1 I=1\n"
         "English -> 66.67 % N=3 C=1 S=1 D=1 I=0\n"
         "Mandarin -> 75.00 % N=4 C=2 S=2 D=0 I=1\n"),
        ("今天天气不错", "今天天气不错",
         {"wer": 0.0, "all": 6, "cor": 6, "sub": 0, "del": 0, "ins": 0},
         "WER: 0.00 % N=6 C=6 S=0 D=0 I=0\n"
         "lab: 今 天 天 气 不 错 \n"
         "rec: 今 天 天 气 不 错 \n"
         + "=" * 75 + "\n\n"
         "Overall -> 0.00 % N=6 C=6 S=0 D=0 I=0\n"
         "Mandarin -> 0.00 % N=6 C=6 S=0 D=0 I=0\n"),
        ("", "今天",
         {"wer": 0.0, "all": 0, "cor": 0, "sub": 0, "del": 0, "ins": 2},
         "WER: 0.00 % N=0 C=0 S=0 D=0 I=2\n"
         "lab:       \n"
         "rec: 今 天 \n"
         + "=" * 75 + "\n\n"
         "Overall -> 0.00 % N=0 C=0 S=0 D=0 I=2\n"
         "Mandarin -> 0.00 % N=0 C=0 S=0 D=0 I=2\n"),
        ("it's co-op 3PM 测试", "its coop 3 PM 测试 extra",
         {"wer": 1.0, "all": 5, "cor": 2, "sub": 3, "del": 0, "ins": 2},
         "WER: 100.00 % N=5 C=2 S=3 D=0 I=2\n"
         "lab: IT'S CO-OP 3PM    测 试       \n"
         "rec: ITS  COOP  3   PM 测 试 EXTRA \n"
         + "=" * 75 + "\n\n"
         "Overall -> 100.00 % N=5 C=2 S=3 D=0 I=2\n"
         "English -> 200.00 % N=2 C=0 S=2 D=0 I=2\n"
         "Number -> 0.00 % N=0 C=0 S=0 D=0 I=0\n"
         "Mandarin -> 0.00 % N=2 C=2 S=0 D=0 I=0\n"
         "Other -> 100.00 % N=1 C=0 S=1 D=0 I=0\n"),
        ("<Keyword>北京</Keyword> 去 上海", "北京 去 深圳",
         {"wer": 0.4, "all": 5, "cor": 3, "sub": 2, "del": 0, "ins": 0},
         "WER: 40.00 % N=5 C=3 S=2 D=0 I=0\n"
         "lab: 北 京 去 上 海 \n"
         "rec: 北 京 去 深 圳 \n"
         + "=" * 75 + "\n\n"
         "Overall -> 40.00 % N=5 C=3 S=2 D=0 I=0\n"
         "Mandarin -> 40.00 % N=5 C=3 S=2 D=0 I=0\n"),
    ]

    def test_goldens(self, capsys):
        from fun_asr_vllm_tpu.text.wer import compute_wer_line

        for ref, hyp, stats, text in self.CASES:
            out = compute_wer_line(ref, hyp, verbose=1)
            got = capsys.readouterr().out
            for k, v in stats.items():
                assert abs(out["stats"][k] - v) < 1e-12, (ref, hyp, k)
            assert got == text, (ref, hyp, repr(got))
