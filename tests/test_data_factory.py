"""Data factory tests: JSONL generators, VAD, cat_cut stages, audio
processor filters, SEAME preprocessing, punctuation, tagging."""

import json
import os
import zipfile

import numpy as np
import pytest

from fun_asr_vllm_tpu.audio.io import write_wav
from fun_asr_vllm_tpu.data.kaldi import read_scp, write_scp


def _make_kaldi_dir(tmp_path, n=3, dur_s=1.0):
    rng = np.random.default_rng(0)
    wavs, texts, durs = [], [], []
    for i in range(n):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, rng.normal(scale=0.05, size=int(16000 * dur_s)).astype(
            np.float32), 16000)
        wavs.append((f"u{i}", str(p)))
        texts.append((f"u{i}", "今天有25个人参加会议"))
        durs.append((f"u{i}", f"{dur_s:.3f}"))
    write_scp(tmp_path / "wav.scp", wavs)
    write_scp(tmp_path / "text", texts)
    write_scp(tmp_path / "text_itn", texts)
    write_scp(tmp_path / "text_tn",
              [(k, "今天有二十五个人参加会议") for k, _ in texts])
    write_scp(tmp_path / "wav2dur", durs)
    return tmp_path


class TestJsonl:
    def test_nano_jsonl(self, tmp_path):
        from fun_asr_vllm_tpu.data.jsonl import (
            scp_to_nano_jsonl, speech_length_from_dur,
        )

        d = _make_kaldi_dir(tmp_path)
        out = tmp_path / "nano.jsonl"
        n = scp_to_nano_jsonl(str(d), str(out))
        assert n == 3
        rec = json.loads(out.read_text().splitlines()[0])
        assert [m["role"] for m in rec["messages"]] == [
            "system", "user", "assistant",
        ]
        assert "<|startofspeech|>!" in rec["messages"][1]["content"]
        assert rec["messages"][1]["content"].endswith("<|endofspeech|>")
        assert rec["speech_length"] == speech_length_from_dur(1.0) == 98

    def test_svs_jsonl(self, tmp_path):
        from fun_asr_vllm_tpu.data.jsonl import scp_to_svs_jsonl

        d = _make_kaldi_dir(tmp_path)
        out = tmp_path / "svs.jsonl"
        n = scp_to_svs_jsonl(str(d), str(out))
        assert n == 3
        rec = json.loads(out.read_text().splitlines()[0])
        assert rec["with_or_wo_itn"] == "<|withitn|>"
        assert rec["source_len"] == 100  # round(1.0 * 100)
        assert rec["text_language"] == "<|zh|>"

    def test_explicit_language_split_deterministic(self):
        from fun_asr_vllm_tpu.data.jsonl import choose_explicit_language

        a = [choose_explicit_language(f"utt{i}") for i in range(200)]
        b = [choose_explicit_language(f"utt{i}") for i in range(200)]
        assert a == b
        assert 0.3 < sum(a) / len(a) < 0.7  # roughly 50/50

    def test_count_text_units(self):
        from fun_asr_vllm_tpu.data.jsonl import count_text_units

        assert count_text_units("你好world 123") == 4  # 你 好 world 123


class TestVAD:
    def test_segments_speech_and_silence(self):
        from fun_asr_vllm_tpu.data.vad import EnergyVAD, VADConfig

        fs = 16000
        rng = np.random.default_rng(0)
        sil = np.zeros(fs, np.float32)
        speech = (0.3 * np.sin(2 * np.pi * 300 * np.arange(fs) / fs)
                  ).astype(np.float32)
        wav = np.concatenate([sil, speech, sil, speech, sil])
        vad = EnergyVAD(VADConfig(max_end_silence_ms=300))
        segs = vad.segments(wav)
        assert len(segs) == 2
        s0, e0 = segs[0]
        assert abs(s0 - 1000) < 200 and abs(e0 - 2000) < 400

    def test_max_segment_cut(self):
        from fun_asr_vllm_tpu.data.vad import EnergyVAD, VADConfig

        fs = 16000
        speech = (0.3 * np.sin(2 * np.pi * 300 * np.arange(5 * fs) / fs)
                  ).astype(np.float32)
        vad = EnergyVAD(VADConfig(max_single_segment_ms=2000))
        segs = vad.segments(speech)
        assert len(segs) >= 2  # forced cuts

    def test_empty(self):
        from fun_asr_vllm_tpu.data.vad import EnergyVAD

        assert EnergyVAD().segments(np.zeros(10, np.float32)) == []


class TestCatCut:
    def test_stage1_and_stage3_roundtrip(self, tmp_path):
        from fun_asr_vllm_tpu.data.cat_cut import stage1_concat, stage3_split

        rng = np.random.default_rng(0)
        scp = []
        for i, dur in enumerate((2.0, 4.0, 8.0)):
            p = tmp_path / f"u{i}.wav"
            write_wav(p, rng.normal(scale=0.1, size=int(16000 * dur)).astype(
                np.float32), 16000)
            scp.append((f"u{i}", str(p)))
        out = tmp_path / "concat"
        manifests = stage1_concat(scp, str(out))
        assert manifests
        # 2s and 4s go to class 5; 8s to class 10
        classes = set()
        for m in manifests:
            for line in open(m):
                classes.add(json.loads(line)["class_s"])
        assert classes == {5, 10}
        # split back the first manifest's wav
        man = manifests[0]
        wav_path = json.loads(open(man).readline())["wav"]
        rows = stage3_split(wav_path, man, str(tmp_path / "split"),
                            {"u0": "文本", "u1": "文本"})
        assert all(os.path.exists(p) for _, p in rows)

    def test_xcorr_alignment(self):
        from fun_asr_vllm_tpu.data.cat_cut import find_offset_xcorr

        rng = np.random.default_rng(1)
        ref = rng.normal(size=16000).astype(np.float32)
        delay = 1234
        recorded = np.concatenate(
            [np.zeros(delay, np.float32), 0.7 * ref,
             np.zeros(2000, np.float32)]
        )
        off = find_offset_xcorr(recorded, ref, search_seconds=2.0,
                                anchor_seconds=0.5)
        assert abs(off - delay) <= 2

    def test_wer_range_filter(self):
        from fun_asr_vllm_tpu.data.cat_cut import (
            parse_wer_ranges, stage5_filter_wer,
        )

        ranges = parse_wer_ranges("0:5:10,5:100:30")
        rows = [
            {"wer": 5.0, "dur_s": 2.0},   # ≤10 keep
            {"wer": 20.0, "dur_s": 2.0},  # >10 drop
            {"wer": 20.0, "dur_s": 10.0},  # ≤30 keep
        ]
        kept = stage5_filter_wer(rows, ranges)
        assert len(kept) == 2


class TestAudioProcessor:
    def test_jaccard_and_filter(self):
        from fun_asr_vllm_tpu.data.audio_processor import (
            TextFilter, jaccard_char_similarity,
        )

        assert jaccard_char_similarity("abc", "abc") == 1.0
        assert jaccard_char_similarity("abc", "xyz") == 0.0
        f = TextFilter(sim_threshold=0.6)
        assert f.accept("今天天气不错")
        assert not f.accept("今天天气不错呀")  # near-dup
        assert f.accept("完全不同的句子")
        assert not f.accept("x")  # too short → noise

    def test_package_filter(self):
        from fun_asr_vllm_tpu.data.audio_processor import PackageFilter

        pf = PackageFilter.parse("dev7:20250101:20250301")
        assert pf.matches("dev7_20250215_pack.zip")
        assert not pf.matches("dev8_20250215_pack.zip")
        assert not pf.matches("dev7_20250401_pack.zip")

    def test_process_zip_package(self, tmp_path):
        from fun_asr_vllm_tpu.data.audio_processor import SimpleAudioProcessor

        fs = 16000
        t = np.arange(fs) / fs
        speech = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        sil = np.zeros(fs, np.float32)
        mic = np.concatenate([sil, speech, sil])
        ref = np.zeros_like(mic)
        stereo = np.stack([mic, ref], axis=1)
        pcm = (stereo * 32767).astype("<i2").tobytes()
        zpath = tmp_path / "dev1_20250101.zip"
        with zipfile.ZipFile(zpath, "w") as zf:
            zf.writestr("rec0.pcm", pcm)
        proc = SimpleAudioProcessor(
            str(tmp_path / "out"),
            transcribe_fn=lambda segs: ["你好世界"] * len(segs),
        )
        records = proc.process_package(str(zpath))
        assert len(records) == 1
        assert records[0]["text"] == "你好世界"
        assert os.path.exists(records[0]["wav"])
        summary = proc.batch_process(str(tmp_path))
        assert os.path.exists(tmp_path / "out" / "processing_summary.json")
        assert summary["packages"] >= 1


class TestSeame:
    def test_normalize(self):
        from fun_asr_vllm_tpu.data.seame import normalize_text

        assert normalize_text("(ppl) hello 你好") == "<noise> hello 你 好"
        assert normalize_text("ppo ppo word") == "<noise> word"
        assert normalize_text("<unl> x") == "<unk> x"

    def test_mandarin_spacing_roundtrip(self):
        from fun_asr_vllm_tpu.data.seame import (
            insert_space_between_mandarin, remove_space_between_mandarin,
        )

        spaced = insert_space_between_mandarin("我有iphone手机")
        assert spaced == "我 有 iphone 手 机"
        # reference semantics: spaces around english words are preserved
        # (reference utils/preprocess.py:78-90)
        assert remove_space_between_mandarin(spaced) == "我有 iphone 手机"

    def test_kaldi_emission(self, tmp_path):
        from fun_asr_vllm_tpu.data.seame import (
            parse_transcript_line, write_kaldi_files,
        )

        lines = [
            "rec1_a\t0\t1500\tzh\t你好 world",
            "rec1_a\t1500\t3000\tzh\t(ppb) 再见",
        ]
        entries = [parse_transcript_line(l) for l in lines]
        n = write_kaldi_files(entries, str(tmp_path), {"rec1": "f"})
        assert n == 2
        segs = read_scp(tmp_path / "segments")
        assert segs[0][1] == "rec1_a 0.000 1.500"
        assert read_scp(tmp_path / "spk2gender") == [("rec1", "f")]

    def test_vocab_and_bpe_text(self):
        from fun_asr_vllm_tpu.data.seame import (
            build_char_vocab, extract_bpe_train_text,
        )

        texts = ["你 好 hello world", "好 的 <noise>"]
        assert build_char_vocab(texts) == ["你", "好", "的"]
        assert extract_bpe_train_text(texts) == ["hello world"]


class TestPunc:
    def test_rule_punctuator(self):
        from fun_asr_vllm_tpu.data.punc import RulePunctuator

        p = RulePunctuator()
        out = p("今天天气不错但是明天要下雨")
        assert "，但是" in out
        assert out.endswith("。")
        assert p("") == ""


class TestTags:
    def test_parse_leading_tags(self):
        from fun_asr_vllm_tpu.data.sensevoice_tags import parse_leading_tags

        lang, emo, event, rest = parse_leading_tags(
            "<|en|><|HAPPY|><|Speech|>hello"
        )
        assert (lang, emo, event, rest) == ("en", "HAPPY", "Speech", "hello")
        lang, emo, event, rest = parse_leading_tags("no tags")
        assert (lang, emo, event) == ("zh", "NEUTRAL", "Speech")

    def test_tag_scp(self, tmp_path):
        from fun_asr_vllm_tpu.data.sensevoice_tags import tag_scp

        write_scp(tmp_path / "wav.scp", [("u0", "/x.wav"), ("u1", "/y.wav")])
        write_scp(tmp_path / "text",
                  [("u0", "你好世界测试语句"), ("u1", "this is english text")])
        n = tag_scp(str(tmp_path / "wav.scp"), str(tmp_path),
                    text_path=str(tmp_path / "text"))
        assert n == 2
        langs = dict(read_scp(tmp_path / "sense_voice_language"))
        assert langs == {"u0": "zh", "u1": "en"}


class TestMpScp:
    def test_process_scp_threads_and_processes(self, tmp_path):
        from fun_asr_vllm_tpu.data.mp_scp import process_scp

        src = tmp_path / "in.scp"
        write_scp(src, [(f"k{i}", f"v{i}") for i in range(9)])
        out = tmp_path / "out.scp"
        process_scp(str(src), str(out), lambda k, v: v.upper(), num_workers=3)
        rows = read_scp(out)
        assert rows == [(f"k{i}", f"V{i}") for i in range(9)]
