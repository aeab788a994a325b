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
        # a key in BOTH text_itn and text_tn emits TWO records — the ITN
        # target with the default prompt and the TN target with the
        # 「不进行文本规整」 prompt (reference scp2nanojsonl.py:236-240)
        n = scp_to_nano_jsonl(str(d), str(out))
        assert n == 6
        recs = [json.loads(l) for l in out.read_text().splitlines()]
        rec = recs[0]
        assert [m["role"] for m in rec["messages"]] == [
            "system", "user", "assistant",
        ]
        assert "<|startofspeech|>!" in rec["messages"][1]["content"]
        assert rec["messages"][1]["content"].endswith("<|endofspeech|>")
        assert rec["speech_length"] == speech_length_from_dur(1.0) == 98
        # per key: one default-prompt record + one TN-prompt record
        tn_marks = ["，不进行文本规整：" in r["messages"][1]["content"]
                    for r in recs]
        assert tn_marks == [False, True] * 3
        # the TN record carries the TN text, the ITN record the ITN text
        assert recs[0]["messages"][2]["content"] == "今天有25个人参加会议"
        assert recs[1]["messages"][2]["content"] == "今天有二十五个人参加会议"

    def test_nano_jsonl_flags(self, tmp_path):
        """Reference flag semantics: forced --text_language, per-utt
        language file, and the seeded 50/50 explicit-language split."""
        from fun_asr_vllm_tpu.data.jsonl import nano_jsonl

        d = _make_kaldi_dir(tmp_path)
        wav = dict(read_scp(d / "wav.scp"))
        itn = dict(read_scp(d / "text_itn"))
        durs = dict(read_scp(d / "wav2dur"))
        out = tmp_path / "n.jsonl"
        # force <|en|>: every explicit-language prompt says 英文
        nano_jsonl(wav, str(out), text_itn=itn, wav2dur=durs,
                   text_language="<|en|>")
        prompts = [json.loads(l)["messages"][1]["content"]
                   for l in out.read_text().splitlines()]
        assert any("语音转写成英文" in p for p in prompts) or all(
            "语音转写成" not in p for p in prompts)
        assert not any("语音转写成中文" in p for p in prompts)
        # per-utt language map beats detection
        nano_jsonl(wav, str(out), text_itn=itn, wav2dur=durs,
                   lang_map={k: "<|en|>" for k in wav})
        prompts2 = [json.loads(l)["messages"][1]["content"]
                    for l in out.read_text().splitlines()]
        assert prompts2 == prompts
        # a different prompt_lang_seed flips some keys' split side
        nano_jsonl(wav, str(out), text_itn=itn, wav2dur=durs,
                   prompt_lang_seed=7)
        assert isinstance(out.read_text(), str)

    def test_svs_jsonl(self, tmp_path):
        from fun_asr_vllm_tpu.data.jsonl import scp_to_svs_jsonl

        d = _make_kaldi_dir(tmp_path)
        out = tmp_path / "svs.jsonl"
        # BOTH variants per utt when text_tn and text_itn exist
        # (reference scp2svsjsonl.py:199-245)
        n = scp_to_svs_jsonl(str(d), str(out))
        assert n == 6
        recs = [json.loads(l) for l in out.read_text().splitlines()]
        assert [r["with_or_wo_itn"] for r in recs[:2]] == [
            "<|woitn|>", "<|withitn|>"]
        assert all(r["source_len"] == 100 for r in recs)  # round(1.0*100)
        assert all(r["text_language"] == "<|zh|>" for r in recs)
        assert "task" not in recs[0]  # the reference emits no task field

    def test_explicit_language_split_deterministic(self):
        from fun_asr_vllm_tpu.data.jsonl import choose_explicit_language

        a = [choose_explicit_language(f"utt{i}") for i in range(200)]
        b = [choose_explicit_language(f"utt{i}") for i in range(200)]
        assert a == b
        assert 0.3 < sum(a) / len(a) < 0.7  # roughly 50/50

    def test_count_text_units(self):
        from fun_asr_vllm_tpu.data.jsonl import count_text_units

        # reference count_text_length semantics (scp2svsjsonl.py:36-66):
        # \b-anchored words/numbers — a token glued to CJK counts 0
        assert count_text_units("你好 world 123") == 4
        assert count_text_units("你好world 123") == 3   # world glued to 好
        assert count_text_units("句123") == 1            # digits glued
        assert count_text_units("co-op") == 2            # word + '-' punct

    def test_empty_transcripts_skipped(self, tmp_path):
        """A bare-key text line (empty transcript) is skipped, not
        emitted as an empty training target (nano) or a crash (svs)."""
        from fun_asr_vllm_tpu.data.jsonl import nano_jsonl, svs_jsonl

        d = _make_kaldi_dir(tmp_path, n=2)
        wav = dict(read_scp(d / "wav.scp"))
        durs = dict(read_scp(d / "wav2dur"))
        out = tmp_path / "e.jsonl"
        n = nano_jsonl(wav, str(out), text_itn={"u0": "", "u1": "真文本"},
                       wav2dur=durs)
        assert n == 1
        assert "真文本" in out.read_text()
        n = svs_jsonl(wav, str(out), text_itn={"u0": "", "u1": "真文本"},
                      wav2dur=durs)
        assert n == 1

    def test_cli_flags_apply_with_data_dir(self, tmp_path):
        """--data_dir composes with the explicit-file flags (e.g.
        --language_file) instead of silently ignoring them."""
        from fun_asr_vllm_tpu.data import jsonl as jsonl_mod

        d = _make_kaldi_dir(tmp_path)
        lang = tmp_path / "langs"
        lang.write_text("u0 <|en|>\nu1 <|en|>\nu2 <|en|>\n")
        out = tmp_path / "cli.jsonl"
        jsonl_mod.main(["--format", "svs", "--data_dir", str(d),
                        "--output", str(out),
                        "--language_file", str(lang)])
        recs = [json.loads(l) for l in out.read_text().splitlines()]
        assert all(r["text_language"] == "<|en|>" for r in recs)


class TestPrepareDomain:
    @staticmethod
    def _audio_dir(tmp_path, n=4):
        rng = np.random.default_rng(0)
        d = tmp_path / "raw"
        d.mkdir()
        for i in range(n):
            wav = rng.normal(scale=0.05, size=16000).astype(np.float32)
            write_wav(d / f"a{i}.wav", wav, 16000)
            (d / f"a{i}.txt").write_text(f"第{i}句，有25个字！")
        return d

    def test_end_to_end_cli(self, tmp_path):
        from fun_asr_vllm_tpu.data.prepare_domain import main

        d = self._audio_dir(tmp_path)
        out = tmp_path / "out"
        main(["--audio_dir", str(d), "--out_dir", str(out),
              "--split_train_test", "--test_ratio", "0.25",
              "--jsonl_format", "svs"])
        for name in ("wav.scp", "text", "wav2dur", "utt2spk", "spk2utt",
                     "text_tn", "text_itn", "prepare_meta.json",
                     "sense_voice_language", "all.jsonl", "train.jsonl",
                     "test.jsonl"):
            assert (out / name).exists(), name
        # default text_tn is punct-strip only (reference :200-209):
        # the ！ is gone but 25 stays undigitized
        tn = dict(read_scp(out / "text_tn"))
        assert tn["a0"] == "第0句有25个字"
        # split partitions the keys
        train = [k for k, _ in read_scp(out / "train" / "wav.scp")]
        test = [k for k, _ in read_scp(out / "test" / "wav.scp")]
        assert sorted(train + test) == ["a0", "a1", "a2", "a3"]
        assert len(test) == 1
        meta = json.loads((out / "prepare_meta.json").read_text())
        # reference meta schema (prepare_domain_asr_dataset.py:412-421)
        assert meta["n_final_utterances"] == 4
        assert meta["text_tn_itn_mode"] == "from_text_normalize"

    def test_apply_text_tn_and_precomputed(self, tmp_path):
        from fun_asr_vllm_tpu.data.prepare_domain import (
            build_kaldi_and_texts, to_text_tn,
        )

        d = self._audio_dir(tmp_path, n=2)
        # full TN digit verbalization behind the flag
        assert to_text_tn("有25个字！", apply_tn=True) == "有二十五个字"
        # precomputed *_tn.txt/*_itn.txt pass through recursively merged
        (d / "labels_tn.txt").write_text("a0 预先规整零\na1 预先规整一\n")
        (d / "labels_itn.txt").write_text("a0 预先ITN0\na1 预先ITN1\n")
        out = tmp_path / "out2"
        build_kaldi_and_texts(str(d), str(out))
        assert dict(read_scp(out / "text_tn"))["a0"] == "预先规整零"
        assert dict(read_scp(out / "text_itn"))["a1"] == "预先ITN1"
        # --ignore_precomputed_tn_itn regenerates from text
        out3 = tmp_path / "out3"
        build_kaldi_and_texts(str(d), str(out3),
                              ignore_precomputed_tn_itn=True)
        assert dict(read_scp(out3 / "text_tn"))["a0"] == "第0句有25个字"

    def test_custom_sensevoice_prefix_flows_into_jsonl(self, tmp_path):
        """--sensevoice_prefix_name tags are read back by the JSONL step
        (regression: the default-name wrapper ignored custom prefixes)."""
        from fun_asr_vllm_tpu.data.prepare_domain import main

        d = self._audio_dir(tmp_path, n=2)
        out = tmp_path / "outp"
        main(["--audio_dir", str(d), "--out_dir", str(out),
              "--sensevoice_prefix_name", "mytags",
              "--jsonl_format", "svs"])
        assert (out / "mytags_language").exists()
        # overwrite the tags and re-emit: the jsonl must reflect them
        (out / "mytags_language").write_text("a0 <|en|>\na1 <|en|>\n")
        from fun_asr_vllm_tpu.data.prepare_domain import _emit_jsonl

        n = _emit_jsonl(str(out), str(out / "re.jsonl"), "svs", "mytags")
        assert n == 4  # 2 utts x (woitn + withitn) variants
        recs = [json.loads(l)
                for l in (out / "re.jsonl").read_text().splitlines()]
        assert all(r["text_language"] == "<|en|>" for r in recs)

    def test_label_table_with_ignore_excel(self, tmp_path):
        """An explicit --label_table wins even with --ignore_excel
        (which only disables auto-discovery)."""
        from fun_asr_vllm_tpu.data.prepare_domain import load_labels

        d = self._audio_dir(tmp_path, n=1)
        csv = tmp_path / "labels.csv"
        csv.write_text("音频名称,标注后文本\na0.wav,表格里的文本\n")
        labels = load_labels(str(d), str(csv), ignore_excel=True)
        assert labels["a0"] == "表格里的文本"

    def test_formats_and_relpath_keys(self, tmp_path):
        from fun_asr_vllm_tpu.data.prepare_domain import collect_audio

        d = self._audio_dir(tmp_path, n=1)
        sub = d / "sub"
        sub.mkdir()
        rng = np.random.default_rng(1)
        write_wav(sub / "b.wav", rng.normal(
            scale=0.05, size=8000).astype(np.float32), 16000)
        (sub / "c.flac").write_bytes(b"not really flac")
        items = collect_audio(str(d), formats="wav",
                              utt_key_mode="relpath")
        keys = [k for k, _ in items]
        assert "sub_b" in keys and "a0" in keys
        assert not any("c" == k for k in keys)


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
    def test_stage1_and_manifest_split_roundtrip(self, tmp_path):
        from fun_asr_vllm_tpu.data.cat_cut import (
            split_by_manifest, stage1_concat,
        )

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
        rows = split_by_manifest(wav_path, man, str(tmp_path / "split"),
                                 {"u0": "文本", "u1": "文本"})
        assert all(os.path.exists(p) for _, p in rows)

    def test_stage1_emits_text_lists_for_stage3(self, tmp_path):
        """Reference parity: stage1 writes per-concat-file *_tn.txt /
        *_itn.txt (run_audio_cat_cut.py:267-268) — the inputs stage3's
        text restore consumes."""
        from fun_asr_vllm_tpu.data.cat_cut import stage1_concat

        rng = np.random.default_rng(2)
        scp = []
        for i in range(3):
            p = tmp_path / f"u{i}.wav"
            write_wav(p, rng.normal(scale=0.1, size=16000 * 2).astype(
                np.float32), 16000)
            scp.append((f"u{i}", str(p)))
        tn = {f"u{i}": f"tn{i}" for i in range(3)}
        itn = {f"u{i}": f"itn{i}" for i in range(3)}
        dur = {f"u{i}": "2.0" for i in range(3)}
        out = tmp_path / "c2"
        manifests = stage1_concat(scp, str(out), text_tn=tn, text_itn=itn,
                                  wav2dur=dur, sample_rate=16000)
        assert manifests
        base = manifests[0][:-len(".jsonl")]
        tn_lines = open(base + "_tn.txt").read().splitlines()
        itn_lines = open(base + "_itn.txt").read().splitlines()
        assert tn_lines == [f"u{i}\ttn{i}" for i in range(3)]
        assert itn_lines == [f"u{i}\titn{i}" for i in range(3)]

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

    def test_duration_range_filter(self):
        from fun_asr_vllm_tpu.data.cat_cut import filter_rows_by_duration

        ranges = [(0, 5, 10.0), (5, 100, 30.0)]
        rows = [
            {"wer": 5.0, "dur_s": 2.0},   # ≤10 keep
            {"wer": 20.0, "dur_s": 2.0},  # >10 drop
            {"wer": 20.0, "dur_s": 10.0},  # ≤30 keep
        ]
        kept = filter_rows_by_duration(rows, ranges)
        assert len(kept) == 2

    def test_stage2_dual_align_and_stage3_4ch_split(self, tmp_path):
        """Reference-shaped stage 2+3: dual 1ch/4ch PCM alignment with
        chunked 4ch writing, fixed-length split with tn/itn restore and
        row-paired 4ch segments (reference :361-519)."""
        from fun_asr_vllm_tpu.data.cat_cut import stage2_align, stage3_split

        rng = np.random.default_rng(2)
        fs = 16000
        ref = rng.normal(scale=0.2, size=4 * fs).astype(np.float32)
        refp = tmp_path / "concat.wav"
        write_wav(refp, ref, fs)
        delay = 3210
        rec1 = np.concatenate([np.zeros(delay, np.float32), 0.8 * ref,
                               np.zeros(fs, np.float32)])
        rec4 = np.stack([rec1 * g for g in (1.0, 0.9, 0.8, 0.7)], axis=1)
        p1 = tmp_path / "rec_ch1.pcm"
        p4 = tmp_path / "rec_ch4.pcm"
        (np.clip(rec1 * 32767, -32768, 32767).astype("<i2")).tofile(p1)
        (np.clip(rec4 * 32767, -32768, 32767).astype("<i2")).tofile(p4)

        out1 = tmp_path / "aligned" / "a_1ch.wav"
        out4 = tmp_path / "aligned" / "a_4ch.wav"
        off1, off4 = stage2_align(str(refp), str(p1), str(p4), str(out1),
                                  str(out4), search_range_sec=2.0)
        assert abs(off1 - delay) <= 2 and abs(off4 - delay) <= 2
        from fun_asr_vllm_tpu.audio.io import read_wav

        a4, sr = read_wav(str(out4), always_2d=True)
        assert a4.shape == (len(ref), 4) and sr == fs

        # stage 3: 1 s segments, 4 text lines
        tn = tmp_path / "c_tn.txt"
        itn = tmp_path / "c_itn.txt"
        tn.write_text("".join(f"seg{i}\t文本{i}\n" for i in range(4)))
        itn.write_text("".join(f"seg{i}\t文本ITN{i}\n" for i in range(4)))
        segdir = tmp_path / "segments"
        seg4dir = tmp_path / "segments_4ch"
        n = stage3_split(str(out1), str(tn), str(itn), str(segdir),
                         segment_sec=1.0, aligned_wav_4ch=str(out4),
                         output_dir_4ch=str(seg4dir))
        assert n == 4
        assert len(list(segdir.glob("*.wav"))) == 4
        assert len(list(seg4dir.glob("*.wav"))) == 4
        assert (segdir / "a_1ch_text_tn.txt").exists()
        assert (seg4dir / "a_4ch_text_itn.txt").exists()
        seg, _ = read_wav(str(sorted(seg4dir.glob("*.wav"))[0]),
                          always_2d=True)
        assert seg.shape == (fs, 4)

    def test_stage4_and_stage5_row_sync(self, tmp_path):
        """Stage 4 report + stage 5 row-index filtering with 4ch sync
        (reference :549-663, :789-871)."""
        from fun_asr_vllm_tpu.data.cat_cut import (
            stage4_asr_eval, stage5_filter_wer,
        )

        segdir = tmp_path / "segments"
        segdir.mkdir()
        rng = np.random.default_rng(3)
        names = []
        for i in range(4):
            name = f"s_{i + 1:04d}"
            write_wav(segdir / f"{name}.wav",
                      rng.normal(scale=0.1, size=8000).astype(np.float32),
                      16000)
            names.append(name)
        text_file = segdir / "s_text_tn.txt"
        text_file.write_text("".join(f"{n}\t你好世界\n" for n in names))

        hyps = ["你好世界", "你好", "完全不同", "你好世界"]

        def fake_asr(wavs):
            return hyps[: len(wavs)]

        rows = stage4_asr_eval(str(segdir), str(text_file),
                               str(tmp_path / "asr_wer_ch1.xlsx"),
                               transcribe_fn=fake_asr, batch_size=4)
        assert [r["wav_name"] for r in rows] == names
        # wer is a FRACTION, the scale the reference writes to the stage-4
        # Excel and compares stage-5 range thresholds against
        assert rows[0]["wer"] == 0.0 and rows[2]["wer"] > 0.5

        # fabricate the ch4 report with the same rows
        from fun_asr_vllm_tpu.data.cat_cut import _write_report

        _write_report(str(tmp_path / "asr_wer_ch4.xlsx"),
                      ("wav_name", "text", "asr", "wer"), rows)
        kept1, kept4 = stage5_filter_wer(
            str(tmp_path), ["0:1:0.0"], global_max_wer=0.6,
        )
        # rows 0-1 need wer ≤ 0 (row 0 passes, row 1 fails); rows 2-3 use
        # the global cap 0.6 — fraction scale, as the reference compares
        # (row 2 fails, row 3 passes)
        assert kept1 == 2 and kept4 == 2

    def test_align_split_asr_merged_driver(self, tmp_path):
        from fun_asr_vllm_tpu.data.cat_cut import run_align_split_asr

        rng = np.random.default_rng(4)
        fs = 16000
        ref = rng.normal(scale=0.2, size=2 * fs).astype(np.float32)
        refp = tmp_path / "concat.wav"
        write_wav(refp, ref, fs)
        rec1 = np.concatenate([np.zeros(800, np.float32), ref])
        rec4 = np.stack([rec1] * 4, axis=1)
        p1 = tmp_path / "r_ch1.pcm"
        p4 = tmp_path / "r_ch4.pcm"
        (rec1 * 32767).astype("<i2").tofile(p1)
        (rec4 * 32767).astype("<i2").tofile(p4)
        tn = tmp_path / "c_tn.txt"
        itn = tmp_path / "c_itn.txt"
        tn.write_text("a\t文本一\nb\t文本二\n")
        itn.write_text("a\t文本1\nb\t文本2\n")
        work = tmp_path / "work"

        rows1, rows4 = run_align_split_asr(
            str(refp), str(p1), str(p4), str(tn), str(itn),
            segment_sec=1.0, work_dir=str(work),
            transcribe_fn=lambda wavs: ["文本一"] * len(wavs),
            search_range_sec=1.0,
        )
        assert len(rows1) == 2 and len(rows4) == 2
        assert (work / "segments").is_dir()
        assert (work / "segments_4ch").is_dir()
        report = (work / "asr_wer_ch1.xlsx")
        assert report.exists() or report.with_suffix(".csv").exists()

    def test_streaming_rf64_writer_roundtrip(self, tmp_path):
        from fun_asr_vllm_tpu.audio.io import StreamingWavWriter, read_wav

        rng = np.random.default_rng(5)
        x = np.clip(rng.normal(scale=0.3, size=(50000, 4)), -0.99, 0.99
                    ).astype(np.float32)
        p = tmp_path / "big.wav"
        with StreamingWavWriter(str(p), 16000, 4, force_rf64=True) as w:
            for s in range(0, len(x), 12000):
                w.write(x[s : s + 12000])
        y, sr = read_wav(str(p), always_2d=True)
        assert sr == 16000 and y.shape == x.shape
        # quantization + the 32767-write/32768-read scale asymmetry
        np.testing.assert_allclose(y, x, atol=2.5 / 32768)
        assert open(p, "rb").read(4) == b"RF64"


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


class TestAudioFilter:
    """Reference AudioFilter semantics (simple_audio_processor.py:260-537)."""

    def _f(self, **kw):
        from fun_asr_vllm_tpu.data.audio_processor import AudioFilter

        kw.setdefault("remove_files", False)
        return AudioFilter(**kw)

    def test_noise_rules(self):
        f = self._f()
        assert f.is_noise_text("")                     # empty
        assert f.is_noise_text("嗯嗯")                  # too short
        assert f.is_noise_text("嗯，啊。")               # fillers dominate
        assert f.is_noise_text("哈哈哈哈哈哈哈哈哈哈")      # low diversity
        assert not f.is_noise_text("今天天气真的很不错")

    def test_remove_punctuation(self):
        f = self._f()
        assert f.remove_punctuation("你好，世界！") == "你好世界"
        assert f.remove_punctuation("hello, world!") == "hello world"

    def test_dedup_keeps_longest(self):
        f = self._f()
        rows = [
            {"key": "a", "text": "今天天气不错我们去公园"},
            {"key": "b", "text": "今天天气不错我们"},       # contained
            {"key": "c", "text": "完全无关的另一句话呀"},
        ]
        kept = f.filter_results(rows)
        assert {r["key"] for r in kept} == {"a", "c"}
        assert f.stats["contained"] == 1

    def test_rejected_files_deleted(self, tmp_path):
        from fun_asr_vllm_tpu.data.audio_processor import AudioFilter

        p1 = tmp_path / "a.wav"
        p2 = tmp_path / "b.wav"
        p1.write_bytes(b"x")
        p2.write_bytes(b"x")
        f = AudioFilter(remove_files=True)
        rows = [
            {"key": "a", "text": "今天天气不错我们去公园", "wav": str(p1)},
            {"key": "b", "text": "今天天气不错我们", "wav": str(p2)},
        ]
        kept = f.filter_results(rows)
        assert len(kept) == 1 and p1.exists() and not p2.exists()

    def test_summary_report_shape(self, tmp_path):
        """batch_process emits the reference's processing_summary.json
        structure with date-grouped durations (reference :1126-1181)."""
        import json as _json
        import zipfile

        from fun_asr_vllm_tpu.data.audio_processor import SimpleAudioProcessor

        rng = np.random.default_rng(0)
        zdir = tmp_path / "zips"
        zdir.mkdir()
        pcm = (np.repeat(rng.normal(scale=0.2, size=16000), 2)
               * 32767).astype("<i2")
        with zipfile.ZipFile(zdir / "dev1_20250102_a.zip", "w") as zf:
            zf.writestr("rec.pcm", pcm.tobytes())
        proc = SimpleAudioProcessor(
            str(tmp_path / "out"),
            transcribe_fn=lambda segs: ["今天天气很不错啊朋友"] * len(segs),
        )
        proc.batch_process(str(zdir))
        report = _json.loads(
            (tmp_path / "out" / "processing_summary.json").read_text()
        )
        assert set(report) >= {"summary", "type_statistics",
                               "duration_statistics", "duration_by_date"}
        assert "20250102" in report["duration_by_date"]
        s = report["summary"]
        assert s["total_packages"] == 1 and s["zip_files_total"] == 1


class TestSeameSplit:
    """SEAME dataset-split machinery (reference utils/preprocess.py:168-370)."""

    def _build(self, tmp_path):
        from fun_asr_vllm_tpu.data.seame import read_trans

        trans = tmp_path / "t.txt"
        trans.write_text(
            "NI01MAX_0101\t1230\t4560\tzh\t你好 hello\n"
            "NI01MAX_0101\t5000\t8000\ten\tgood morning\n"
            "UI02FBY_0202\t100\t2000\tzh\t再见 bye\n"
        )
        data = {}
        read_trans(data, str(trans), "PhaseII",
                   ["NI01MAX_0101", "UI02FBY_0202"], "/audio")
        return data

    def test_read_trans_stamps_and_speakers(self, tmp_path):
        data = self._build(tmp_path)
        # 1230 ms → 00123 centisecond stamp (devset convention)
        assert "ni01max_0101-00123-00456" in data
        rec = data["ni01max_0101-00123-00456"]
        assert rec["speaker"] == "ni01m"  # alpha head → [:5]
        assert rec["split"] == "train"
        assert rec["audio_pth"].endswith("NI01MAX_0101.flac")
        rec2 = data["ui02fby_0202-00010-00200"]
        assert rec2["speaker"] == "ui02f"  # alpha head → [:5]

    def test_check_test_split_fuzzy_match(self, tmp_path):
        from fun_asr_vllm_tpu.data.seame import check_test_split

        data = self._build(tmp_path)
        # dev key with ±2 centisecond jitter still matches
        n = check_test_split(["ni01max_0101-00125-00458"], data, "devman")
        assert n == 1
        assert data["ni01max_0101-00123-00456"]["split"] == "devman"

    def test_sieve_and_split_val(self, tmp_path):
        from fun_asr_vllm_tpu.data.seame import (
            check_test_split, count_data, sieve_train, split_val,
        )

        data = self._build(tmp_path)
        check_test_split(["ni01max_0101-00125-00458"], data, "devman")
        sieve_train(data, ["ni01max_0101"])  # UI02 not train-listed
        assert data["ui02fby_0202-00010-00200"]["split"] == "other"
        data, tr, val, test = split_val(data, num_val=1)
        assert len(val) == 1 and len(test) == 1
        assert data[val[0]]["split"] == "valid"
        stats = count_data(data)
        assert "devman" in stats and stats["devman"]["speakers"] == 1

    def test_read_list_and_text(self, tmp_path):
        from fun_asr_vllm_tpu.data.seame import read_list, read_text

        lst = tmp_path / "wav_file.txt"
        lst.write_text("/data/conversation/NI01/audio.flac\n"
                       "/data/interview/UI02/audio.flac\n")
        stypes, idxs = read_list(str(lst))
        assert stypes == ["conversation", "interview"]
        assert idxs == ["NI01", "UI02"]
        txt = tmp_path / "text"
        txt.write_text("SPK1-ni01max-001 你好\n")
        assert read_text(str(txt)) == ["spk1-ni01max-001"]
        assert read_text(str(txt), rmspk=True) == ["ni01max-001"]

    def test_repeated_idx_raises(self, tmp_path):
        from fun_asr_vllm_tpu.data.seame import read_trans

        trans = tmp_path / "t.txt"
        trans.write_text(
            "NI01MAX_0101\t1230\t4560\tzh\t你好\n"
            "NI01MAX_0101\t1230\t4560\tzh\t你好\n"
        )
        with pytest.raises(ValueError, match="repeated"):
            read_trans({}, str(trans), "PhaseII", ["NI01MAX_0101"], "/a")


class TestSvsJsonlReferenceGoldens:
    """Byte-level golden pins for the SVS JSONL generator, GENERATED by
    executing the unmodified reference scp2svsjsonl.py (round-3
    conformance session; 4 fuzz scenarios x ~70 records matched
    byte-for-byte). Covers: dual woitn/withitn emission, the reference's
    \\b-anchored unit counting (今天有25个人 -> 5: '25' glued to 有
    counts 0), invalid-duration -> source_len 0, and >80%%-english
    detection (it's 3.5%% ok -> <|en|>)."""

    GOLDEN = [
        '{"key": "u0", "text_language": "<|zh|>", "emo_target": '
        '"<|NEUTRAL|>", "event_target": "<|Speech|>", "with_or_wo_itn": '
        '"<|woitn|>", "target": "今天有25个人", "source": "/x/u0.wav", '
        '"target_len": 5, "source_len": 123}',
        '{"key": "u0", "text_language": "<|zh|>", "emo_target": '
        '"<|NEUTRAL|>", "event_target": "<|Speech|>", "with_or_wo_itn": '
        '"<|withitn|>", "target": "今天有二十五个人123", "source": '
        '"/x/u0.wav", "target_len": 8, "source_len": 123}',
        '{"key": "u1", "text_language": "<|zh|>", "emo_target": '
        '"<|NEUTRAL|>", "event_target": "<|Speech|>", "with_or_wo_itn": '
        '"<|woitn|>", "target": "hello 世界 co-op", "source": '
        '"/x/u1.wav", "target_len": 5, "source_len": 0}',
        '{"key": "u2", "text_language": "<|en|>", "emo_target": '
        '"<|NEUTRAL|>", "event_target": "<|Speech|>", "with_or_wo_itn": '
        '"<|withitn|>", "target": "it\'s 3.5% ok", "source": '
        '"/x/u2.wav", "target_len": 6, "source_len": 789}',
    ]

    def test_goldens(self, tmp_path):
        from fun_asr_vllm_tpu.data.jsonl import main

        (tmp_path / "wav.scp").write_text(
            "u0 /x/u0.wav\nu1 /x/u1.wav\nu2 /x/u2.wav\n")
        (tmp_path / "text_tn").write_text(
            "u0 今天有25个人\nu1 hello 世界 co-op\n")
        (tmp_path / "text_itn").write_text(
            "u0 今天有二十五个人123\nu2 it's 3.5% ok\n")
        (tmp_path / "wav2dur").write_text("u0 1.234\nu1 oops\nu2 7.89\n")
        out = tmp_path / "svs.jsonl"
        main(["--format", "svs", "--wav_scp", str(tmp_path / "wav.scp"),
              "--wav2dur", str(tmp_path / "wav2dur"),
              "--output", str(out)])
        assert out.read_text().splitlines() == self.GOLDEN


class TestMakeKaldiData:
    def test_reference_byte_formats(self, tmp_path):
        """Output-format pins GENERATED by executing the unmodified
        reference make_kaldi_data.sh pipeline side by side (round-3
        conformance session; all six files byte-identical). Covers: the
        positional invocation style, parent-dir speakers, tab-keyed
        sorted wav.scp/text/utt2spk, space-separated full-precision
        wav2dur UNFILTERED by text presence, first-seen-order spk2utt,
        the [0.5, 40] s duration filter, and the text_punc copy."""
        from fun_asr_vllm_tpu.cli.make_kaldi_data import main

        for spk in ("s1", "s2"):
            d = tmp_path / "src" / spk
            d.mkdir(parents=True)
            for i, sec in enumerate((1.0, 0.2)):  # one in range, one short
                write_wav(d / f"{spk}u{i}.wav",
                          np.zeros(int(16000 * sec), np.float32), 16000)
                (d / f"{spk}u{i}.txt").write_text(f"{spk}u{i}\t文本{i}\n")
        # an audio file without any transcript: excluded from wav.scp
        # but still present in wav2dur
        write_wav(tmp_path / "src" / "s1" / "s1nolabel.wav",
                  np.zeros(16000, np.float32), 16000)
        out = tmp_path / "kd"
        main([str(tmp_path / "src"), str(out), "wav"])
        src = str(tmp_path / "src")
        assert (out / "wav.scp").read_text() == (
            f"s1u0\t{src}/s1/s1u0.wav\ns2u0\t{src}/s2/s2u0.wav\n")
        assert (out / "text").read_text() == "s1u0\t文本0\ns2u0\t文本0\n"
        assert (out / "utt2spk").read_text() == "s1u0\ts1\ns2u0\ts2\n"
        assert (out / "spk2utt").read_text() == "s1 s1u0\ns2 s2u0\n"
        assert (out / "wav2dur").read_text() == (
            "s1nolabel 1.0\ns1u0 1.0\ns2u0 1.0\n")
        assert (out / "text_punc").read_text() == (out / "text").read_text()


class TestRunAsrData:
    def test_tn_itn_tags_jsonl_concat(self, tmp_path):
        """The dataset-list driver (reference run_asr_data.sh surface):
        per-dir TN/ITN passes + tagging sidecars + JSONL, concatenated
        into one list. No engine (dirs already carry text)."""
        from fun_asr_vllm_tpu.cli.run_asr_data import main

        dirs = []
        for name in ("d1", "d2"):
            (tmp_path / name).mkdir()
            d = _make_kaldi_dir(tmp_path / name)
            os.remove(d / "text_tn")   # force the driver's own TN pass
            os.remove(d / "text_itn")
            dirs.append(str(d))
        out_list = tmp_path / "train.jsonl"
        main(["--data_dirs", *dirs, "--out_list", str(out_list),
              "--format", "nano"])
        for d in dirs:
            assert os.path.exists(os.path.join(d, "text_tn"))
            assert os.path.exists(os.path.join(d, "text_itn"))
            assert os.path.exists(os.path.join(d, "sense_voice_language"))
            assert os.path.exists(os.path.join(d, "nano.jsonl"))
        lines = out_list.read_text().splitlines()
        per_dir = (tmp_path / "d1" / "nano.jsonl").read_text().splitlines()
        assert len(lines) == 2 * len(per_dir) and len(per_dir) > 0
        # the driver's ITN pass digitized the spelled number
        itn = dict(read_scp(tmp_path / "d1" / "text_itn"))
        assert itn["u0"] == "今天有25个人参加会议"


class TestMergeTables:
    def test_csv_merge_adds_source(self, tmp_path):
        import pandas as pd

        from fun_asr_vllm_tpu.data.merge_tables import merge_tables

        a = tmp_path / "a.csv"
        b = tmp_path / "b.csv"
        pd.DataFrame({"k": ["x"], "wer": [0.1]}).to_csv(a, index=False)
        pd.DataFrame({"k": ["y"], "wer": [0.2]}).to_csv(b, index=False)
        out = tmp_path / "m.csv"
        n = merge_tables([str(a), str(b)], str(out))
        assert n == 2
        m = pd.read_csv(out)
        assert list(m["source"]) == ["a.csv", "b.csv"]
        assert list(m["k"]) == ["x", "y"]
