"""Training-JSONL generators (the reference scp2nanojsonl.py:1-392 and
scp2svsjsonl.py:1-333 surfaces).

- `scp_to_nano_jsonl`: Kaldi dir (wav.scp + text_tn/text_itn + wav2dur) →
  chat-format FunASRNano training JSONL: ChatML messages with
  ``<|startofspeech|>!{path}<|endofspeech|>`` audio spans,
  ``speech_length = (dur_ms - 25)//10 + 1`` (scp2nanojsonl.py:171),
  prompt variants (hotwords / explicit language / ITN off), deterministic
  50/50 explicit-language split by md5(key) (scp2nanojsonl.py:150-158).
- `scp_to_svs_jsonl`: same inputs → SenseVoice-format JSONL with
  ``source_len = round(dur*100)`` and unit-counting text length
  (scp2svsjsonl.py:36-66).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
from typing import Dict, Iterable, Optional

from .kaldi import read_scp, read_scp_dict

LANG_NAMES = {"zh": "中文", "en": "英文", "ja": "日文", "ko": "韩文",
              "yue": "粤语"}


def speech_length_from_dur(dur_s: float) -> int:
    """(dur_ms - 25)//10 + 1 (reference scp2nanojsonl.py:171)."""
    return int((dur_s * 1000 - 25) // 10 + 1)


def choose_explicit_language(key: str) -> bool:
    """Deterministic 50/50 split by md5(key)
    (reference scp2nanojsonl.py:150-158)."""
    return int(hashlib.md5(key.encode()).hexdigest(), 16) % 2 == 0


def nano_prompt(
    language: Optional[str] = None,
    itn: bool = True,
    hotwords: Optional[str] = None,
) -> str:
    """Prompt variants (reference scp2nanojsonl.py:89-109)."""
    prompt = ""
    if hotwords:
        prompt = (
            "请结合上下文信息，更加准确地完成语音转写任务。"
            "如果没有相关信息，我们会留空。\n\n\n**上下文信息：**\n\n\n"
            f"热词列表：[{hotwords}]\n"
        )
    prompt += "语音转写" if language is None else f"语音转写成{language}"
    if not itn:
        prompt += "，不进行文本规整"
    return prompt + "："


def count_text_units(text: str) -> int:
    """SenseVoice unit counting: each han char / latin word / number run /
    punct counts 1 (reference scp2svsjsonl.py:36-66)."""
    units = re.findall(r"[一-鿿]|[A-Za-z']+|\d+|[^\sA-Za-z0-9一-鿿]",
                       text)
    return len(units)


def scp_to_nano_jsonl(
    data_dir: str,
    out_path: str,
    *,
    tokenizer=None,
    system_prompt: str = "You are a helpful assistant.",
    default_language: str = "zh",
) -> int:
    """→ count of emitted lines. Uses text_itn as the default target (ITN
    on) and text_tn with the '不进行文本规整' prompt for the TN variant,
    mirroring the reference's dual-target scheme."""
    wav = read_scp(os.path.join(data_dir, "wav.scp"))
    text_itn = _maybe(data_dir, "text_itn") or _maybe(data_dir, "text") or {}
    text_tn = _maybe(data_dir, "text_tn") or {}
    durs = _maybe(data_dir, "wav2dur") or {}
    langs = _maybe(data_dir, "sense_voice_language") or {}

    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for key, path in wav:
            target = text_itn.get(key) or text_tn.get(key)
            if not target:
                continue
            dur = float(durs.get(key, 0) or 0)
            if dur <= 0:
                dur = _probe_duration(path)
                if dur <= 0:
                    print(f"[nano_jsonl] skip {key}: no duration")
                    continue
            lang_code = langs.get(key, default_language)
            explicit = choose_explicit_language(key)
            language = LANG_NAMES.get(lang_code, lang_code) if explicit else None

            use_tn = key in text_tn and key not in text_itn
            prompt = nano_prompt(language=language, itn=not use_tn)
            tgt = text_tn[key] if use_tn else target
            record = {
                "key": key,
                "messages": [
                    {"role": "system", "content": system_prompt},
                    {
                        "role": "user",
                        "content": f"{prompt}<|startofspeech|>!{path}"
                                   f"<|endofspeech|>",
                    },
                    {"role": "assistant", "content": tgt},
                ],
                "speech_length": speech_length_from_dur(dur),
                "text_length": (
                    len(tokenizer.encode(tgt)) if tokenizer is not None
                    else count_text_units(tgt)
                ),
            }
            f.write(json.dumps(record, ensure_ascii=False) + "\n")
            n += 1
    return n


def scp_to_svs_jsonl(
    data_dir: str,
    out_path: str,
    *,
    default_language: str = "zh",
) -> int:
    """SenseVoice training JSONL (reference scp2svsjsonl.py:210-247)."""
    wav = read_scp(os.path.join(data_dir, "wav.scp"))
    text_itn = _maybe(data_dir, "text_itn") or {}
    text_tn = _maybe(data_dir, "text_tn") or _maybe(data_dir, "text") or {}
    durs = _maybe(data_dir, "wav2dur") or {}
    langs = _maybe(data_dir, "sense_voice_language") or {}
    emos = _maybe(data_dir, "sense_voice_emotion") or {}
    events = _maybe(data_dir, "sense_voice_event") or {}

    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for key, path in wav:
            with_itn = key in text_itn
            target = text_itn.get(key) or text_tn.get(key)
            if not target:
                continue
            dur = float(durs.get(key, 0) or 0)
            if dur <= 0:
                dur = _probe_duration(path)
                if dur <= 0:
                    continue
            record = {
                "key": key,
                "task": "<|ASR|>",
                "text_language": f"<|{langs.get(key, default_language)}|>",
                "emo_target": f"<|{emos.get(key, 'NEUTRAL')}|>",
                "event_target": f"<|{events.get(key, 'Speech')}|>",
                "with_or_wo_itn": "<|withitn|>" if with_itn else "<|woitn|>",
                "target": target,
                "source": path,
                "target_len": count_text_units(target),
                "source_len": round(dur * 100),
            }
            f.write(json.dumps(record, ensure_ascii=False) + "\n")
            n += 1
    return n


def _maybe(data_dir: str, name: str) -> Optional[Dict[str, str]]:
    p = os.path.join(data_dir, name)
    return read_scp_dict(p) if os.path.exists(p) else None


def _probe_duration(path: str) -> float:
    try:
        from ..audio.io import read_wav

        x, sr = read_wav(path)
        return len(x) / sr
    except Exception:
        return -1.0


def main():
    ap = argparse.ArgumentParser(description="Kaldi dir → training JSONL")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--format", choices=["nano", "svs"], default="nano")
    ap.add_argument("--tokenizer_dir", default=None)
    args = ap.parse_args()
    tok = None
    if args.tokenizer_dir:
        from ..utils.tokenizer import load_tokenizer

        tok = load_tokenizer(args.tokenizer_dir)
    if args.format == "nano":
        n = scp_to_nano_jsonl(args.data_dir, args.out, tokenizer=tok)
    else:
        n = scp_to_svs_jsonl(args.data_dir, args.out)
    print(f"wrote {n} lines → {args.out}")


if __name__ == "__main__":
    main()
