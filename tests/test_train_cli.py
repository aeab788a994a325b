"""Finetune driver (cli/train.py) tests on a fabricated tiny stack.

The reference repo produces training JSONL (scp2nanojsonl.py) but has no
in-repo trainer; cli/train.py closes that loop natively. These tests run
the REAL CLI main() end-to-end on a fabricated model dir: convergence,
freeze semantics (reference model.py:60-66/77-81 — frozen components
must not move), checkpoint/resume continuity, and a (dp, tp) mesh run on
the virtual 8-device CPU mesh."""

import json
import os

import numpy as np
import pytest

from fun_asr_vllm_tpu.audio.io import write_wav
from fun_asr_vllm_tpu.cli import train as train_cli
from fun_asr_vllm_tpu.data.jsonl import scp_to_nano_jsonl
from fun_asr_vllm_tpu.models.nano import FunASRNano, make_test_model_dir


TEXTS = ["今天天气", "hello", "你好 world", "测试"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Fabricated model dir + tiny Kaldi dir → nano JSONL."""
    root = tmp_path_factory.mktemp("train_cli")
    model_dir = make_test_model_dir(str(root / "model"))
    data_dir = root / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(7)
    with open(data_dir / "wav.scp", "w") as scp, \
            open(data_dir / "text", "w") as txt, \
            open(data_dir / "wav2dur", "w") as dur:
        for i, text in enumerate(TEXTS):
            n = 4800 + 1600 * i
            t = np.arange(n) / 16000.0
            wav = (0.3 * np.sin(2 * np.pi * (160 + 40 * i) * t)
                   + 0.03 * rng.normal(size=n)).astype(np.float32)
            p = root / f"utt{i}.wav"
            write_wav(p, wav, 16000)
            scp.write(f"utt{i} {p}\n")
            txt.write(f"utt{i} {text}\n")
            dur.write(f"utt{i} {n / 16000.0:.2f}\n")
    jsonl = str(root / "train.jsonl")
    n = scp_to_nano_jsonl(str(data_dir), jsonl)
    assert n == len(TEXTS)
    return model_dir, jsonl, str(root)


def _logged(output_dir):
    with open(os.path.join(output_dir, "train_log.jsonl")) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_train_converges_and_exports(corpus):
    model_dir, jsonl, root = corpus
    out = os.path.join(root, "exp_all")
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--output_dir", out, "--batch_size", "2", "--num_epochs", "30",
        "--lr", "3e-3", "--trainable", "all", "--log_interval", "1",
        "--frame_multiple", "32", "--token_multiple", "8", "--seed", "1",
    ])
    assert rc == 0
    lines = [l for l in _logged(out) if l["event"] == "train"]
    assert lines, "no train log lines"
    # stats parity keys from the reference model.py:200-243 stats dict
    for key in ("loss", "acc", "batch_tokens", "padding_tokens",
                "batch_size_real_frames", "dialog_turns_avg"):
        assert key in lines[-1], key
    first = np.mean([l["loss"] for l in lines[:2]])
    last = np.mean([l["loss"] for l in lines[-2:]])
    assert last < first * 0.5, (first, last)
    # the exported final dir round-trips through from_pretrained
    final = os.path.join(out, "final")
    m, _ = FunASRNano.from_pretrained(model=final, dtype="float32")
    assert m.llm_params is not None
    # validation pass emits eval events when --valid_jsonl is given
    out2 = os.path.join(root, "exp_eval")
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--valid_jsonl", jsonl, "--output_dir", out2,
        "--batch_size", "2", "--num_epochs", "1", "--trainable", "all",
    ])
    assert rc == 0
    assert any(l["event"] == "eval" for l in _logged(out2))


def test_freeze_semantics(corpus):
    """trainable=audio_adaptor (the reference's shipped freeze config):
    encoder and LLM leaves must be bit-identical after training; the
    adaptor must move."""
    import jax

    model_dir, jsonl, root = corpus
    before, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
    out = os.path.join(root, "exp_frozen")
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--output_dir", out, "--batch_size", "2", "--max_steps", "4",
        "--num_epochs", "1", "--lr", "1e-2", "--trainable", "audio_adaptor",
    ])
    assert rc == 0
    after, _ = FunASRNano.from_pretrained(
        model=os.path.join(out, "final"), dtype="float32"
    )
    for name in ("llm_params", "encoder_params"):
        same = jax.tree.map(
            lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
            getattr(before, name), getattr(after, name),
        )
        assert all(jax.tree.leaves(same)), f"{name} moved while frozen"
    moved = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        before.adaptor_params, after.adaptor_params,
    )
    assert not all(jax.tree.leaves(moved)), "adaptor did not train"


def test_checkpoint_resume(corpus):
    model_dir, jsonl, root = corpus
    out = os.path.join(root, "exp_resume")
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--output_dir", out, "--batch_size", "2", "--max_steps", "3",
        "--num_epochs", "5", "--trainable", "audio_adaptor",
        "--save_interval", "3", "--dp", "1",
    ])
    assert rc == 0
    ck = train_cli.find_latest_checkpoint(out)
    assert ck and ck.endswith("checkpoint-3")
    with open(os.path.join(ck, "train_meta.json")) as f:
        assert json.load(f)["step"] == 3
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--output_dir", out, "--batch_size", "2", "--max_steps", "6",
        "--num_epochs", "5", "--trainable", "audio_adaptor",
        "--resume", "auto", "--dp", "1",
    ])
    assert rc == 0
    ck = train_cli.find_latest_checkpoint(out)
    with open(os.path.join(ck, "train_meta.json")) as f:
        meta = json.load(f)
    assert meta["step"] == 6, meta
    # opt_state round-trip: leaves count recorded and reloadable
    from fun_asr_vllm_tpu.parallel import train as T
    m, _ = FunASRNano.from_pretrained(model=ck, dtype="float32")
    tp, _f = T.split_trainable(
        {"audio_encoder": m.encoder_params, "audio_adaptor": m.adaptor_params,
         "llm": m.llm_params}, ("audio_adaptor",),
    )
    opt = T.make_optimizer(1e-4, total_steps=10)
    st = train_cli.load_opt_state(ck, opt, tp)
    assert st is not None


def test_mesh_train_run(corpus):
    """dp2×tp2 over the virtual 8-CPU mesh: sharded params, dp-sharded
    batch, two optimizer steps, finite loss."""
    model_dir, jsonl, root = corpus
    out = os.path.join(root, "exp_mesh")
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--output_dir", out, "--batch_size", "2", "--max_steps", "2",
        "--num_epochs", "1", "--trainable", "all",
        "--dp", "2", "--tp", "2", "--log_interval", "1",
    ])
    assert rc == 0
    lines = [l for l in _logged(out) if l["event"] == "train"]
    assert lines and np.isfinite(lines[-1]["loss"])


def test_lora_training(corpus):
    """--lora_rank: base LLM bit-frozen, adapter trains as a sidecar,
    checkpoint auto-merges at load, final export == base + scale·A@B."""
    import jax

    model_dir, jsonl, root = corpus
    base, _ = FunASRNano.from_pretrained(model=model_dir, dtype="float32")
    out = os.path.join(root, "exp_lora")
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--output_dir", out, "--batch_size", "2", "--max_steps", "6",
        "--num_epochs", "9", "--lr", "1e-2", "--lora_rank", "4",
        "--lora_alpha", "8", "--trainable", "audio_adaptor",
        "--save_interval", "3", "--dp", "1", "--log_interval", "1",
    ])
    assert rc == 0
    ck = train_cli.find_latest_checkpoint(out)
    assert os.path.exists(os.path.join(ck, "lora.safetensors"))

    # checkpoint stores the UNtouched base LLM
    raw, _ = FunASRNano.from_pretrained(model=ck, dtype="float32",
                                        apply_lora=False)
    same = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        base.llm_params, raw.llm_params)
    assert all(jax.tree.leaves(same)), "base llm moved under LoRA"

    # auto-merge at load == eager apply_lora == final export
    from fun_asr_vllm_tpu.parallel import lora as L
    auto, _ = FunASRNano.from_pretrained(model=ck, dtype="float32")
    tree, meta = L.load_lora(ck)
    want = L.apply_lora(raw.llm_params, tree,
                        L.lora_scale(meta["rank"], meta["alpha"]))
    ok = jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        auto.llm_params, want)
    assert all(jax.tree.leaves(ok))
    diff = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        auto.llm_params["layers"]["wqkv"], raw.llm_params["layers"]["wqkv"])
    assert not all(jax.tree.leaves(diff)), "adapter never moved the weights"
    assert os.path.isdir(os.path.join(out, "adapter"))

    # resume continues from the adapter sidecar
    rc = train_cli.main([
        "--model_dir", model_dir, "--train_jsonl", jsonl,
        "--output_dir", out, "--batch_size", "2", "--max_steps", "8",
        "--num_epochs", "9", "--lr", "1e-2", "--lora_rank", "4",
        "--lora_alpha", "8", "--trainable", "audio_adaptor",
        "--resume", "auto", "--dp", "1",
    ])
    assert rc == 0
    with open(os.path.join(train_cli.find_latest_checkpoint(out),
                           "train_meta.json")) as f:
        assert json.load(f)["step"] == 8


def test_lora_delta_zero_init():
    """PEFT-convention init (B = 0): the merged model IS the base model."""
    import jax
    import jax.numpy as jnp
    from fun_asr_vllm_tpu.models import qwen3
    from fun_asr_vllm_tpu.parallel import lora as L

    cfg = qwen3.Qwen3Config(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=48, dtype=jnp.float32)
    p = qwen3.init_params(cfg, jax.random.PRNGKey(0))
    adapters = L.init_lora_params(p, ("wqkv", "wo"), 4, jax.random.PRNGKey(1))
    merged = L.apply_lora(p, adapters, L.lora_scale(4, 8))
    ok = jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        p, merged)
    assert all(jax.tree.leaves(ok))


def test_producer_failure_dies_loudly(corpus, tmp_path, monkeypatch):
    """A mid-epoch data-pipeline error must abort the run (re-raised from
    the producer thread), never silently end the epoch and checkpoint it
    as complete — under --distributed a silent stop would desync hosts."""
    model_dir, jsonl, root = corpus

    def boom(model, recs):
        raise RuntimeError("synthetic data failure")

    monkeypatch.setattr(train_cli, "build_samples", boom)
    with pytest.raises(RuntimeError, match="synthetic data failure"):
        train_cli.main([
            "--model_dir", model_dir, "--train_jsonl", jsonl,
            "--output_dir", str(tmp_path / "out"),
            "--batch_size", "2", "--max_steps", "1",
            "--trainable", "audio_adaptor",
        ])
    assert not os.path.isdir(tmp_path / "out" / "final")
