"""tools/acceptance.py — the weights-landing acceptance runner.

Drives the real three-stage pipeline (converter coverage → smoke decode
→ scored eval) against a fabricated full-key-space checkpoint, the same
command that closes the real-weight CER item the day a checkpoint
lands (reference README.md:96's CER 7.03 bar).
"""

import json
import os
import subprocess
import sys
import wave

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("acc")
    ck = root / "ck"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_checkpoint.py"),
         "--fabricate", str(ck)],
        check=True, cwd=REPO, env={**os.environ, "FUN_ASR_PLATFORM": "cpu"},
    )
    data = root / "data"
    data.mkdir()
    sr = 16000
    with open(data / "wav.scp", "w") as scp, open(data / "text", "w") as txt:
        for i, dur in enumerate([0.4, 0.7]):
            t = np.arange(int(sr * dur))
            x = (0.1 * np.sin(2 * np.pi * 330 * t / sr) * 32767
                 ).astype(np.int16)
            p = data / f"u{i}.wav"
            with wave.open(str(p), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(x.tobytes())
            scp.write(f"u{i} {p}\n")
            txt.write(f"u{i} 你好\n")
    return ck, data


def test_acceptance_runner_end_to_end(fixture_dirs, tmp_path):
    ck, data = fixture_dirs
    report_path = tmp_path / "report.json"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "acceptance.py"),
         "--model_dir", str(ck), "--dtype", "float32",
         "--smoke_wav", str(data / "u0.wav"),
         "--wav_scp", str(data / "wav.scp"), "--text", str(data / "text"),
         "--output_dir", str(tmp_path / "eval"),
         "--batch_size", "2", "--cer_budget", "101",
         "--report", str(report_path), "--disable_engine"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "FUN_ASR_PLATFORM": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    report = json.loads(report_path.read_text())
    assert report["pass"] is True
    stages = report["stages"]
    assert stages["converter_coverage"]["ok"] is True
    assert stages["smoke_decode"]["ok"] is True
    assert stages["scored_eval"]["ok"] is True
    assert stages["scored_eval"]["cer_pct"] is not None
    assert os.path.exists(tmp_path / "eval" / "wer.txt")


def test_acceptance_cer_gate_fails_over_budget(fixture_dirs, tmp_path):
    """Random weights score ~100% CER — a real budget must FAIL."""
    ck, data = fixture_dirs
    report_path = tmp_path / "report.json"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "acceptance.py"),
         "--model_dir", str(ck), "--dtype", "float32",
         "--skip_converter", "--skip_smoke",
         "--wav_scp", str(data / "wav.scp"), "--text", str(data / "text"),
         "--output_dir", str(tmp_path / "eval"),
         "--batch_size", "2", "--cer_budget", "7.03",
         "--report", str(report_path), "--disable_engine"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "FUN_ASR_PLATFORM": "cpu"},
    )
    assert out.returncode == 1
    report = json.loads(report_path.read_text())
    assert report["pass"] is False
    assert report["stages"]["scored_eval"]["ok"] is False
