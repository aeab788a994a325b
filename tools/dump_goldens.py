#!/usr/bin/env python
"""Dump golden activations from a REAL funasr Fun-ASR-Nano checkpoint.

Run this in an environment that has `funasr` + the ModelScope checkpoint
(this repo's dev environment has neither — zero egress). It produces a
single `goldens.npz` consumed by tests/test_goldens_optional.py, closing
the CER-parity loop the moment weights exist:

    python tools/dump_goldens.py --model_dir /path/Fun-ASR-Nano-2512 \
        --wav /path/example/zh.mp3 --out goldens.npz

Captured tensors (all float32 numpy):
    wav                  [N]        input samples @16k
    fbank                [T, D]     frontend output (LFR+CMVN applied)
    encoder_out          [T, E]     audio_encoder(speech)
    adaptor_out          [T', H]    audio_adaptor(encoder_out)
    prompt_ids           [P]        tokenized ChatML prefix
    greedy_tokens        [M]        reference greedy transcript token ids

The matching test loads the SAME wav through this framework's frontend /
converted weights and asserts activation closeness layer by layer, then
token-exact greedy decode.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable without installing the package (tools/ shadows the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--out", default="goldens.npz")
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()

    import numpy as np
    import torch
    from funasr import AutoModel
    from funasr.utils.load_utils import (
        extract_fbank,
        load_audio_text_image_video,
    )

    model, kwargs = AutoModel.build_model(
        model=args.model_dir, trust_remote_code=True, device=args.device
    )
    frontend = kwargs["frontend"]
    tokenizer = kwargs["tokenizer"]

    wav = load_audio_text_image_video(args.wav, fs=frontend.fs)
    speech, speech_lengths = extract_fbank(
        wav, data_type="sound", frontend=frontend, is_final=True
    )
    with torch.no_grad():
        if getattr(model, "feat_permute", False):
            enc_in = speech.permute(0, 2, 1)
        else:
            enc_in = speech
        encoder_out, enc_lens = model.audio_encoder(enc_in, speech_lengths)
        adaptor_out, ad_lens = model.audio_adaptor(encoder_out, enc_lens)

    prompt = "语音转写："
    prefix = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        f"<|im_start|>user\n{prompt}"
    )
    prompt_ids = np.asarray(tokenizer.encode(prefix), np.int32)

    res, _meta = model.inference(
        data_in=[args.wav], tokenizer=tokenizer, frontend=frontend,
        itn=True, device=args.device,
    )
    greedy_tokens = np.asarray(
        tokenizer.encode(res[0]["text"]), np.int32
    )

    np.savez(
        args.out,
        wav=np.asarray(wav, np.float32).reshape(-1),
        fbank=speech[0].float().numpy(),
        fbank_len=int(speech_lengths[0]),
        encoder_out=encoder_out[0].float().numpy(),
        adaptor_out=adaptor_out[0].float().numpy(),
        prompt_ids=prompt_ids,
        greedy_tokens=greedy_tokens,
        reference_text=np.asarray(res[0]["text"]),
    )
    print(f"→ {args.out}")


if __name__ == "__main__":
    main()
