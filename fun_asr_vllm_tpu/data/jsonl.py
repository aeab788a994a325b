"""Training-JSONL generators (the reference scp2nanojsonl.py:1-392 and
scp2svsjsonl.py:1-333 surfaces).

- `nano_jsonl`: wav.scp + text_tn/text_itn (+wav2dur, language file) →
  chat-format FunASRNano training JSONL: ChatML messages with
  ``<|startofspeech|>!{path}<|endofspeech|>`` audio spans,
  ``speech_length = (dur_ms - 25)//10 + 1`` (scp2nanojsonl.py:171).
  A key present in BOTH text files emits TWO records — the ITN target
  with the default prompt and the TN target with the
  「，不进行文本规整」 prompt (scp2nanojsonl.py:236-240). The
  「语音转写」/「语音转写成xx」 prompt halves are split deterministically by
  md5 over ``{seed}|{key}|{variant}`` (scp2nanojsonl.py:149-158) so the
  split is independent per ITN/TN variant and stable across runs.
- `scp_to_svs_jsonl`: same inputs → SenseVoice-format JSONL with
  ``source_len = round(dur*100)`` and unit-counting text length
  (scp2svsjsonl.py:36-66).

The CLI (`python -m fun_asr_vllm_tpu.data.jsonl`) carries the reference
flag surface for both formats (--wav_scp/--text_tn/--text_itn/--wav2dur/
--output/--language_file/--text_language/--prompt_lang_seed/
--enable_hotwords/--hotword_prob/--hotword_seed/--max_workers,
plus svs --emotion_file/--event_file/--sensevoice_prefix) and keeps the
``--data_dir`` convention as a shorthand for a Kaldi dir with the
conventional file names.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import random
import re
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

from .kaldi import read_scp, read_scp_dict

#: SenseVoice-style language tag → human-readable prompt name
#: (reference scp2nanojsonl.py:22-25)
LANG_TAG_TO_PROMPT_NAME = {"<|zh|>": "中文", "<|en|>": "英文"}

LANG_NAMES = {"zh": "中文", "en": "英文", "ja": "日文", "ko": "韩文",
              "yue": "粤语"}


def speech_length_from_dur(dur_s: float) -> int:
    """(dur_ms - 25)//10 + 1 (reference scp2nanojsonl.py:171)."""
    return int((dur_s * 1000 - 25) // 10 + 1)


def detect_language_tag(text: str) -> str:
    """Text → SenseVoice language tag, the scp2svsjsonl-consistent rule
    (reference scp2nanojsonl.py:28-45): >80% english words ⇒ <|en|>."""
    if not text:
        return "<|zh|>"
    text_no_punct = re.sub(r"[^\w\s一-鿿]", "", text)
    num_zh = len(re.findall(r"[一-鿿]", text_no_punct))
    num_en = len(re.findall(r"\b[a-zA-Z]+\b", text_no_punct))
    total = num_zh + num_en
    if total == 0:
        return "<|zh|>"
    return "<|en|>" if num_en / total > 0.8 else "<|zh|>"


def pick_language_tag(
    key: str,
    text: str,
    lang_map: Dict[str, str],
    text_language: Optional[str] = None,
) -> str:
    """Forced --text_language > per-utt language file > detection
    (reference scp2nanojsonl.py:66-77)."""
    if text_language:
        return text_language
    if key in lang_map and lang_map[key].strip():
        return lang_map[key].strip()
    return detect_language_tag(text)


def lang_tag_to_prompt_language(lang_tag: str) -> str:
    """``<|zh|>`` → 中文; unknown tags keep their inner name
    (reference scp2nanojsonl.py:80-87)."""
    if lang_tag in LANG_TAG_TO_PROMPT_NAME:
        return LANG_TAG_TO_PROMPT_NAME[lang_tag]
    m = re.match(r"^<\|(.+?)\|>$", lang_tag.strip())
    if m:
        return m.group(1)
    return LANG_NAMES.get(lang_tag, lang_tag)


def choose_explicit_language(key: str, itn: bool = True,
                             seed: int = 12345) -> bool:
    """Deterministic 50/50 prompt split by md5 over seed|key|variant
    (reference scp2nanojsonl.py:149-158): stable per key and independent
    between the ITN and TN variants."""
    variant = "itn" if itn else "tn"
    payload = f"{seed}|{key}|{variant}".encode("utf-8", errors="ignore")
    return hashlib.md5(payload).digest()[0] % 2 == 1


def extract_hotwords_entity_stub(text: str) -> List[str]:
    """Entity-extraction hook for hotword prompts. The reference ships
    this as an empty stub (scp2nanojsonl.py:112-119); plug a NER /
    domain-dictionary extractor in here."""
    _ = text
    return []


def maybe_hotwords(text: str, enable: bool, prob: float,
                   rng: random.Random) -> List[str]:
    """Probabilistic hotword attachment (reference scp2nanojsonl.py:122-131)."""
    if not enable or prob <= 0:
        return []
    if rng.random() >= prob:
        return []
    return extract_hotwords_entity_stub(text)


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


_CTL_ZH = re.compile(r"[一-鿿㐀-䶿\U00020000-\U0002a6df]")
_CTL_EN = re.compile(r"\b[a-zA-Z][a-zA-Z'\-]*\b")
_CTL_NUM = re.compile(r"\b[-+]?\d[\d,.]*\b")
_CTL_PUNCT = re.compile(
    r"[。，、；：！？“”‘’（）《》【】「」『』〔〕…—"
    r".,;:!?\"'()\[\]{}<>~@#$%^&*_+=|\\/\-]"
)


def count_text_units(text: str) -> int:
    """SenseVoice unit counting, regex-for-regex the reference's
    count_text_length (scp2svsjsonl.py:36-66): han chars + \\b-anchored
    latin words + \\b-anchored number runs + puncts, each 1 unit. The
    \\b anchors matter: digits/words glued to CJK (句123) contribute 0
    because CJK is a word char, and '-' inside a word double-counts as
    punct — byte-parity with the reference requires both quirks."""
    if not text:
        return 0
    return (len(_CTL_ZH.findall(text)) + len(_CTL_EN.findall(text))
            + len(_CTL_NUM.findall(text)) + len(_CTL_PUNCT.findall(text)))


def _probe_duration(path: str) -> float:
    """Audio duration in seconds; supports http(s) URLs like the
    reference's soundfile-over-BytesIO probe (scp2nanojsonl.py:134-143)."""
    try:
        from ..audio.io import read_wav

        if path.startswith(("http://", "https://")):
            from urllib.request import urlopen

            # bounded: one unresponsive host must not hang the threaded
            # probe pool forever — failures record as "no duration"
            with urlopen(path, timeout=30.0) as resp:
                if resp.status != 200:
                    return -1.0
                x, sr = read_wav(resp.read())
        else:
            x, sr = read_wav(path)
        return len(x) / sr
    except Exception:
        return -1.0


def _fill_durations(jobs: List[dict], max_workers: Optional[int]) -> List[str]:
    """Threaded duration probing for jobs lacking wav2dur entries
    (reference scp2nanojsonl.py:246-267). Each distinct wav_path is
    probed once and shared across its variant jobs. Returns errors."""
    to_fetch = [j for j in jobs if j["duration_sec"] is None]
    errors: List[str] = []
    if not to_fetch:
        return errors
    workers = max_workers or (os.cpu_count() or 4)
    paths = sorted({j["wav_path"] for j in to_fetch})

    with ThreadPoolExecutor(max_workers=workers) as ex:
        durs = dict(zip(paths, ex.map(_probe_duration, paths)))
    seen_err = set()
    for j in to_fetch:
        d = durs[j["wav_path"]]
        if d <= 0:
            if j["key"] not in seen_err:
                errors.append(f"{j['key']}: no duration")
                seen_err.add(j["key"])
        else:
            j["duration_sec"] = d
    return errors


def nano_jsonl(
    wav_scp: Dict[str, str],
    out_path: str,
    *,
    text_tn: Optional[Dict[str, str]] = None,
    text_itn: Optional[Dict[str, str]] = None,
    wav2dur: Optional[Dict[str, str]] = None,
    lang_map: Optional[Dict[str, str]] = None,
    tokenizer=None,
    text_language: Optional[str] = None,
    prompt_lang_seed: int = 12345,
    enable_hotwords: bool = False,
    hotword_prob: float = 0.3,
    hotword_seed: int = 42,
    max_workers: Optional[int] = None,
    system_prompt: str = "You are a helpful assistant.",
) -> int:
    """Core generator, reference collect_jobs/process_one_job semantics
    (scp2nanojsonl.py:190-282): sorted keys, a record per available
    ITN/TN variant, threaded duration fill. Returns lines written."""
    text_tn = text_tn or {}
    text_itn = text_itn or {}
    wav2dur = wav2dur or {}
    lang_map = lang_map or {}
    valid_keys = sorted(set(wav_scp) & (set(text_tn) | set(text_itn)))
    rng = random.Random(hotword_seed)

    jobs: List[dict] = []
    for key in valid_keys:
        dur = None
        if key in wav2dur:
            try:
                dur = float(wav2dur[key])
            except ValueError:
                dur = None

        def add(text: str, itn: bool) -> None:
            tag = pick_language_tag(key, text, lang_map, text_language)
            explicit = choose_explicit_language(key, itn, prompt_lang_seed)
            language = lang_tag_to_prompt_language(tag) if explicit else None
            hws = maybe_hotwords(text, enable_hotwords, hotword_prob, rng)
            prompt = nano_prompt(language=language, itn=itn,
                                 hotwords=", ".join(hws) if hws else None)
            jobs.append({"key": key, "wav_path": wav_scp[key],
                         "text": text, "prompt": prompt,
                         "duration_sec": dur})

        # empty transcripts are skipped, not emitted as empty targets
        if text_itn.get(key):
            add(text_itn[key], itn=True)
        if text_tn.get(key):
            add(text_tn[key], itn=False)

    errors = _fill_durations(jobs, max_workers)
    for e in errors[:10]:
        print(f"[nano_jsonl] skip {e}")
    if len(errors) > 10:
        print(f"[nano_jsonl] ... and {len(errors) - 10} more")

    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for j in jobs:
            if j["duration_sec"] is None or j["duration_sec"] <= 0:
                continue
            tgt = j["text"]
            record = {
                "messages": [
                    {"role": "system", "content": system_prompt},
                    {
                        "role": "user",
                        "content": f"{j['prompt']}<|startofspeech|>!"
                                   f"{j['wav_path']}<|endofspeech|>",
                    },
                    {"role": "assistant", "content": tgt},
                ],
                "speech_length": speech_length_from_dur(j["duration_sec"]),
                "text_length": (
                    len(tokenizer.encode(tgt)) if tokenizer is not None
                    else count_text_units(tgt)
                ),
            }
            f.write(json.dumps(record, ensure_ascii=False) + "\n")
            n += 1
    return n


def scp_to_nano_jsonl(
    data_dir: str,
    out_path: str,
    *,
    tokenizer=None,
    system_prompt: str = "You are a helpful assistant.",
    **kwargs,
) -> int:
    """Kaldi-dir convenience wrapper: auto-loads the conventional file
    names (text_itn falling back to text, like the reference auto-load
    behavior, scp2nanojsonl.py:318-344)."""
    wav = dict(read_scp(os.path.join(data_dir, "wav.scp")))
    text_itn = _maybe(data_dir, "text_itn") or _maybe(data_dir, "text")
    return nano_jsonl(
        wav, out_path,
        text_tn=_maybe(data_dir, "text_tn"),
        text_itn=text_itn,
        wav2dur=_maybe(data_dir, "wav2dur"),
        lang_map=_maybe(data_dir, "sense_voice_language"),
        tokenizer=tokenizer, system_prompt=system_prompt, **kwargs,
    )


def svs_jsonl(
    wav_scp: Dict[str, str],
    out_path: str,
    *,
    text_tn: Optional[Dict[str, str]] = None,
    text_itn: Optional[Dict[str, str]] = None,
    wav2dur: Optional[Dict[str, str]] = None,
    lang_map: Optional[Dict[str, str]] = None,
    emo_map: Optional[Dict[str, str]] = None,
    evt_map: Optional[Dict[str, str]] = None,
    text_language: Optional[str] = None,
    max_workers: Optional[int] = None,
) -> int:
    """SenseVoice training JSONL (reference scp2svsjsonl.py:210-247)."""
    text_tn = text_tn or {}
    text_itn = text_itn or {}
    wav2dur = wav2dur or {}
    lang_map = lang_map or {}
    emo_map = emo_map or {}
    evt_map = evt_map or {}

    # one job per (key, variant): the reference emits BOTH a woitn and a
    # withitn record when both transcripts exist (scp2svsjsonl.py:199-245)
    jobs = []
    for key in sorted(set(wav_scp) & (set(text_tn) | set(text_itn))):
        dur = None
        if key in wav2dur:
            try:
                dur = float(wav2dur[key])
            except ValueError:
                # the reference warns and emits source_len=0
                dur = 0.0
        # empty transcripts are skipped (the reference's file parser
        # drops valueless lines before they reach this point)
        variants = []
        if text_tn.get(key):
            variants.append(("<|woitn|>", text_tn[key]))
        if text_itn.get(key):
            variants.append(("<|withitn|>", text_itn[key]))
        for tag, target in variants:
            jobs.append({"key": key, "wav_path": wav_scp[key],
                         "text": target, "itn_tag": tag,
                         "duration_sec": dur})
    errors = _fill_durations(jobs, max_workers)
    for e in errors[:10]:
        print(f"[svs_jsonl] skip {e}")
    if len(errors) > 10:
        print(f"[svs_jsonl] ... and {len(errors) - 10} more")

    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for j in jobs:
            if j["duration_sec"] is None or j["duration_sec"] < 0:
                continue
            key, target = j["key"], j["text"]
            # language picked per VARIANT text (detection may differ
            # between the TN and ITN sides, reference :203/:228)
            tag = pick_language_tag(key, target, lang_map, text_language)
            record = {
                "key": key,
                "text_language": tag,
                "emo_target": f"<|{emo_map.get(key, 'NEUTRAL')}|>"
                              if not emo_map.get(key, "").startswith("<|")
                              else emo_map[key],
                "event_target": f"<|{evt_map.get(key, 'Speech')}|>"
                                if not evt_map.get(key, "").startswith("<|")
                                else evt_map[key],
                "with_or_wo_itn": j["itn_tag"],
                "target": target,
                "source": j["wav_path"],
                "target_len": count_text_units(target),
                "source_len": round(j["duration_sec"] * 100),
            }
            f.write(json.dumps(record, ensure_ascii=False) + "\n")
            n += 1
    return n


def scp_to_svs_jsonl(
    data_dir: str,
    out_path: str,
    *,
    default_language: str = "zh",
    **kwargs,
) -> int:
    """Kaldi-dir convenience wrapper for the SenseVoice format."""
    wav = dict(read_scp(os.path.join(data_dir, "wav.scp")))
    lang = _maybe(data_dir, "sense_voice_language") or {}
    # bare codes in the sidecar → tags; keys without a sidecar entry fall
    # back to the caller's default language rather than detection
    lang_map = {k: (v if v.startswith("<|") else f"<|{v}|>")
                for k, v in lang.items()}
    for key in wav:
        lang_map.setdefault(key, f"<|{default_language}|>")
    text_tn = _maybe(data_dir, "text_tn")
    text_itn = _maybe(data_dir, "text_itn")
    if not text_tn and not text_itn:
        # Kaldi-dir convention, consistent with jsonl.main() and
        # prepare_domain: a plain `text` file is the ITN-side (withitn)
        # transcript source
        text_itn = _maybe(data_dir, "text")
    return svs_jsonl(
        wav, out_path,
        text_tn=text_tn,
        text_itn=text_itn,
        wav2dur=_maybe(data_dir, "wav2dur"),
        lang_map=lang_map,
        emo_map=_maybe(data_dir, "sense_voice_emotion"),
        evt_map=_maybe(data_dir, "sense_voice_event"),
        **kwargs,
    )


def _maybe(data_dir: str, name: str) -> Optional[Dict[str, str]]:
    p = os.path.join(data_dir, name)
    return read_scp_dict(p) if os.path.exists(p) else None


def _load(path: Optional[str]) -> Optional[Dict[str, str]]:
    return read_scp_dict(path) if path and os.path.exists(path) else None


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="wav.scp + text_tn/text_itn → training JSONL "
                    "(reference scp2nanojsonl.py / scp2svsjsonl.py)")
    ap.add_argument("--format", choices=["nano", "svs"], default="nano")
    src = ap.add_argument_group("inputs")
    src.add_argument("--data_dir", default=None,
                     help="Kaldi dir shorthand (conventional file names)")
    src.add_argument("--wav_scp", default=None, help="utt<TAB>path")
    src.add_argument("--text_tn", default=None,
                     help="TN text; prompts gain 「不进行文本规整」")
    src.add_argument("--text_itn", default=None,
                     help="ITN text; default prompt")
    src.add_argument("--wav2dur", default=None,
                     help="utt<TAB>seconds; missing keys probe the audio")
    ap.add_argument("--output", "--out", dest="output", required=True)
    ap.add_argument("--max_workers", type=int, default=None)
    ap.add_argument("--text_language", choices=["<|zh|>", "<|en|>"],
                    default=None,
                    help="force one language tag for all utterances")
    ap.add_argument("--language_file", default=None,
                    help="per-utt language tags (e.g. run_sense_voice)")
    ap.add_argument("--prompt_lang_seed", type=int, default=12345)
    ap.add_argument("--enable_hotwords", action="store_true")
    ap.add_argument("--hotword_prob", type=float, default=0.3)
    ap.add_argument("--hotword_seed", type=int, default=42)
    ap.add_argument("--sensevoice_prefix", default=None,
                    help="svs: base path for {prefix}_language/_emotion/"
                         "_event sidecars")
    ap.add_argument("--emotion_file", default=None)
    ap.add_argument("--event_file", default=None)
    ap.add_argument("--tokenizer_dir", default=None)
    args = ap.parse_args(argv)

    tok = None
    if args.tokenizer_dir:
        from ..utils.tokenizer import load_tokenizer

        tok = load_tokenizer(args.tokenizer_dir)

    # --data_dir is a shorthand for --wav_scp <dir>/wav.scp; all the
    # explicit-file flags (language/emotion/event/...) apply either way
    if args.data_dir and not args.wav_scp:
        args.wav_scp = os.path.join(args.data_dir, "wav.scp")
    if not args.wav_scp:
        ap.error("--wav_scp (or --data_dir) is required")
    wav = dict(read_scp(args.wav_scp))
    wav_dir = os.path.dirname(os.path.abspath(args.wav_scp))
    # sibling auto-load (reference scp2nanojsonl.py:318-344,
    # scp2svsjsonl.py:300-312)
    # an EXPLICITLY passed path must exist — silently falling back to the
    # sibling would drop every record of the variant the user asked for
    for flag, val in (("--text_tn", args.text_tn),
                      ("--text_itn", args.text_itn),
                      ("--wav2dur", args.wav2dur)):
        if val and not os.path.exists(val):
            ap.error(f"{flag} {val}: file not found")
    text_tn = args.text_tn or os.path.join(wav_dir, "text_tn")
    text_itn = args.text_itn or os.path.join(wav_dir, "text_itn")
    wav2dur = args.wav2dur or os.path.join(wav_dir, "wav2dur")
    tn_map, itn_map = _load(text_tn), _load(text_itn)
    if not tn_map and not itn_map:
        # Kaldi-dir convention: a plain `text` file is the ITN-side
        # (withitn) transcript source
        itn_map = _load(os.path.join(wav_dir, "text"))
    if not tn_map and not itn_map:
        raise ValueError("need text_tn or text_itn (flag or sibling file)")
    prefix = args.sensevoice_prefix or os.path.join(wav_dir, "sense_voice")
    lang_map = (_load(args.language_file)
                or _load(prefix + "_language") or {})

    if args.format == "nano":
        n = nano_jsonl(
            wav, args.output, text_tn=tn_map, text_itn=itn_map,
            wav2dur=_load(wav2dur), lang_map=lang_map, tokenizer=tok,
            text_language=args.text_language,
            prompt_lang_seed=args.prompt_lang_seed,
            enable_hotwords=args.enable_hotwords,
            hotword_prob=args.hotword_prob, hotword_seed=args.hotword_seed,
            max_workers=args.max_workers,
        )
    else:
        n = svs_jsonl(
            wav, args.output, text_tn=tn_map, text_itn=itn_map,
            wav2dur=_load(wav2dur), lang_map=lang_map,
            emo_map=_load(args.emotion_file) or _load(prefix + "_emotion"),
            evt_map=_load(args.event_file) or _load(prefix + "_event"),
            text_language=args.text_language,
            max_workers=args.max_workers,
        )
    print(f"wrote {n} lines → {args.output}")


if __name__ == "__main__":
    main()
