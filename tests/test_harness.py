"""Batch-eval harness tests: Kaldi utils + the infer_kaldidata pipeline over
a tiny fabricated model dir and wav.scp (output file-tree parity)."""

import json
import os

import numpy as np
import pytest

from fun_asr_vllm_tpu.data.kaldi import (
    filter_scp,
    fix_data_dir,
    merge_results,
    read_scp,
    read_scp_dict,
    split_scp,
    utt2spk_to_spk2utt,
    write_scp,
)


class TestKaldiUtils:
    def test_scp_roundtrip(self, tmp_path):
        p = tmp_path / "wav.scp"
        write_scp(p, [("b", "/x/b.wav"), ("a", "/x/a wav.wav")])
        items = read_scp(p)
        assert items == [("a", "/x/a wav.wav"), ("b", "/x/b.wav")]

    def test_split_scp(self):
        items = [(str(i), str(i)) for i in range(10)]
        shards = split_scp(items, 3)
        assert [len(s) for s in shards] == [4, 3, 3]
        assert sum(shards, []) == items

    def test_filter_scp(self):
        items = [("a", "1"), ("b", "2"), ("c", "3")]
        assert filter_scp(["a", "c"], items) == [("a", "1"), ("c", "3")]
        assert filter_scp(["a"], items, exclude=True) == [("b", "2"), ("c", "3")]

    def test_utt2spk_to_spk2utt(self):
        out = utt2spk_to_spk2utt([("u1", "s1"), ("u2", "s1"), ("u3", "s2")])
        assert out == [("s1", "u1 u2"), ("s2", "u3")]

    def test_fix_data_dir(self, tmp_path):
        write_scp(tmp_path / "wav.scp", [("a", "x"), ("b", "y"), ("c", "z")])
        write_scp(tmp_path / "text", [("a", "t1"), ("b", "t2")])
        write_scp(tmp_path / "utt2spk", [("a", "s"), ("b", "s"), ("c", "s")])
        n = fix_data_dir(str(tmp_path))
        assert n == 2
        assert [k for k, _ in read_scp(tmp_path / "wav.scp")] == ["a", "b"]
        assert read_scp(tmp_path / "spk2utt") == [("s", "a b")]

    def test_merge_results(self, tmp_path):
        d1, d2 = tmp_path / "p0", tmp_path / "p1"
        write_scp(d1 / "text_tn", [("b", "x")])
        write_scp(d2 / "text_tn", [("a", "y")])
        merge_results([str(d1), str(d2)], str(tmp_path), ("text_tn",))
        assert read_scp(tmp_path / "text_tn") == [("a", "y"), ("b", "x")]


@pytest.fixture(scope="module")
def kaldi_setup(tmp_path_factory):
    from fun_asr_vllm_tpu.audio.io import write_wav
    from fun_asr_vllm_tpu.models.nano import make_test_model_dir

    root = tmp_path_factory.mktemp("kaldi")
    model_dir = make_test_model_dir(str(root / "model"))
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    items = []
    for i, n in enumerate((16000, 8000, 12000)):
        p = wav_dir / f"utt{i}.wav"
        write_wav(p, rng.normal(scale=0.05, size=n).astype(np.float32), 16000)
        items.append((f"utt{i}", str(p)))
    write_scp(root / "wav.scp", items)
    write_scp(root / "text", [(k, "今天天气不错") for k, _ in items])
    return root, model_dir


class TestInferKaldidata:
    def test_single_process_outputs(self, kaldi_setup, tmp_path):
        from fun_asr_vllm_tpu.cli.infer_kaldidata import run_shard
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        root, model_dir = kaldi_setup
        pipe = BatchPipeline(
            str(model_dir), dtype="float32", enable_engine=True,
            max_num_seqs=2, max_tokens=4, max_model_len=512,
        )
        scp = read_scp(root / "wav.scp")
        texts = read_scp_dict(root / "text")
        out = tmp_path / "out"
        run_shard(pipe, scp, texts, str(out), batch_size=2, itn=True)
        for name in ("text", "text_itn", "text_tn", "hypos.txt", "wer.txt",
                     "inference_time.txt", "process_info.json"):
            assert (out / name).exists(), name
        assert [k for k, _ in read_scp(out / "text")] == ["utt0", "utt1", "utt2"]
        info = json.loads((out / "process_info.json").read_text())
        assert info["num_utts"] == 3
        assert info["audio_seconds"] == pytest.approx(2.25, rel=0.01)
        wer_text = (out / "wer.txt").read_text()
        assert "%WER" in wer_text

    def test_custom_output_filenames(self, kaldi_setup, tmp_path):
        """--output_file/--stats_file/--result_text_itn/--result_text_tn
        rename the shard outputs (reference infer_kaldidata.py:356-379)."""
        from fun_asr_vllm_tpu.cli.infer_kaldidata import run_shard
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        root, model_dir = kaldi_setup
        pipe = BatchPipeline(str(model_dir), dtype="float32",
                             enable_engine=False, max_tokens=3)
        scp = read_scp(root / "wav.scp")
        texts = read_scp_dict(root / "text")
        out = tmp_path / "custom"
        run_shard(pipe, scp, texts, str(out), batch_size=2, itn=False,
                  language="zh",
                  filenames=("hyp.out", "stats.out", "itn.out", "tn.out"))
        for name in ("hyp.out", "stats.out", "itn.out", "tn.out"):
            assert (out / name).exists(), name
        assert not (out / "hypos.txt").exists()
        # itn=False: the itn file carries the raw hypothesis text
        assert read_scp(out / "itn.out") == read_scp(out / "text")

    def test_multiprocess_shard_merge(self, kaldi_setup, tmp_path):
        from fun_asr_vllm_tpu.cli.infer_kaldidata import run_shard
        from fun_asr_vllm_tpu.data.kaldi import merge_results, split_scp
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        root, model_dir = kaldi_setup
        pipe = BatchPipeline(
            str(model_dir), dtype="float32", enable_engine=False,
            max_tokens=3,
        )
        scp = read_scp(root / "wav.scp")
        shards = split_scp(scp, 2)
        parts = []
        for i, shard in enumerate(shards):
            d = tmp_path / f"process_{i}"
            run_shard(pipe, shard, None, str(d), batch_size=2, itn=True)
            parts.append(str(d))
        merge_results(parts, str(tmp_path), ("text", "text_itn", "text_tn"))
        merged = read_scp(tmp_path / "text")
        assert [k for k, _ in merged] == ["utt0", "utt1", "utt2"]


class TestTranscribeMany:
    def test_matches_transcribe_batch(self, kaldi_setup):
        """transcribe_many (prefetch thread + packed upload + device
        unpack) must produce the same texts as sequential
        transcribe_batch calls."""
        from fun_asr_vllm_tpu.audio.io import load_audio
        from fun_asr_vllm_tpu.pipeline import BatchPipeline

        root, model_dir = kaldi_setup
        pipe = BatchPipeline(
            str(model_dir), dtype="float32", enable_engine=True,
            max_num_seqs=2, max_tokens=4, max_model_len=512,
        )
        scp = read_scp(root / "wav.scp")
        wavs = [load_audio(p, fs=16000) for _, p in scp]
        batches = [wavs[:2], wavs[2:]]
        want = [pipe.transcribe_batch(b) for b in batches]
        got = list(pipe.transcribe_many(iter(batches)))
        assert got == want
        # f32 upload mode too
        got_f32 = list(pipe.transcribe_many(iter(batches), upload="f32"))
        assert got_f32 == want
        # packed engine: transcribe_many auto-uses sample-level ragged
        # uploads (one packed row per batch) — same texts
        pipe_p = BatchPipeline(
            str(model_dir), dtype="float32", enable_engine=True,
            max_num_seqs=2, max_tokens=4, max_model_len=512, packed=True,
        )
        got_p = list(pipe_p.transcribe_many(iter(batches)))
        assert got_p == want
