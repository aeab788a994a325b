"""Execute the real-checkpoint goldens harness on a SYNTHETIC bundle.

`tests/test_goldens_optional.py` is the push-button CER-parity gate for
the day real Fun-ASR-Nano weights land — but weights don't exist in this
environment, so (VERDICT r2) the harness itself had never executed. This
test closes that: fabricate a full funasr-format checkpoint
(tools/check_checkpoint.py), produce a goldens.npz from the INDEPENDENT
torch mini-reference stack (exactly the tensors tools/dump_goldens.py
captures from funasr), then run the optional test module for real in a
subprocess with FUN_ASR_GOLDENS/FUN_ASR_MODEL_DIR set — every assertion
in the harness must pass against the converted weights.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import check_checkpoint as cc  # noqa: E402  (tools/ on sys.path)

from fun_asr_vllm_tpu.models.nano import FunASRNano  # noqa: E402
from fun_asr_vllm_tpu.text.normalize import clean_response  # noqa: E402
from fun_asr_vllm_tpu.utils.tokenizer import ByteTokenizer  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_bundle(model_dir, enc_ref, ad_ref, hf_llm, out_path):
    """The tensors tools/dump_goldens.py captures, from the torch refs."""
    rng = np.random.default_rng(11)
    t = np.arange(24000) / 16000
    wav = (0.2 * np.sin(2 * np.pi * 180 * t)
           + 0.03 * rng.normal(size=t.shape)).astype(np.float32)

    m, _ = FunASRNano.from_pretrained(model=str(model_dir), dtype="float32")
    feats, lens = m.frontend.extract([wav])
    n = int(lens[0])

    with torch.no_grad():
        speech = torch.from_numpy(np.array(feats))
        tl = torch.from_numpy(np.asarray(lens, np.int64))
        enc_out = enc_ref(speech, tl)
        ad_out = ad_ref(enc_out)

    tok = ByteTokenizer()
    prefix = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
              "<|im_start|>user\n语音转写：")
    prompt_ids = np.asarray(tok.encode(prefix), np.int32)

    # reference greedy transcript via the torch full stack (the splice
    # bookkeeping comes from inference_prepare; weights are all torch)
    msgs = [
        {"role": "system", "content": "You are a helpful assistant."},
        {"role": "user",
         "content": "语音转写：<|startofspeech|>!!<|endofspeech|>",
         "audio": wav},
        {"role": "assistant", "content": "null"},
    ]
    _, _, output, _, _ = m.inference_prepare(
        [msgs], tokenizer=m.tokenizer, frontend=m.frontend
    )
    ids = np.maximum(np.asarray(output["source_ids"]), 0)
    with torch.no_grad():
        t_embeds = hf_llm.get_input_embeddings()(
            torch.from_numpy(ids)
        ).clone()
        audio_t = ad_ref(enc_ref(speech, tl))
        si = 0
        for turn, beg in enumerate(np.asarray(output["fbank_beg"])):
            if beg <= 0:
                continue
            k = int(output["fake_token_len"][turn])
            t_embeds[beg: beg + k] = audio_t[si, :k]
            si += 1
        out_ids = hf_llm.generate(
            inputs_embeds=t_embeds[None], max_new_tokens=16,
            do_sample=False, eos_token_id=1, pad_token_id=0,
        )[0].tolist()
    gen = []
    for tid in out_ids:
        if tid == 1:
            break
        gen.append(tid)
    text = clean_response(tok.decode(gen, skip_special_tokens=True))

    np.savez(
        out_path,
        wav=wav,
        fbank=np.array(feats[0]),
        fbank_len=n,
        encoder_out=enc_out[0].numpy(),
        adaptor_out=ad_out[0].numpy(),
        prompt_ids=prompt_ids,
        greedy_tokens=np.asarray(gen, np.int32),
        reference_text=np.asarray(text),
    )


def test_goldens_harness_passes_on_synthetic_bundle(tmp_path):
    model_dir = tmp_path / "ckpt"
    enc_ref, ad_ref, hf_llm = cc.fabricate(str(model_dir), seed=6)
    npz = tmp_path / "goldens.npz"
    _make_bundle(model_dir, enc_ref, ad_ref, hf_llm, npz)

    env = dict(os.environ)
    env["FUN_ASR_GOLDENS"] = str(npz)
    env["FUN_ASR_MODEL_DIR"] = str(model_dir)
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_goldens_optional.py", "-q", "--no-header"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "4 passed" in r.stdout, r.stdout
