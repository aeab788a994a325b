"""Mandarin-English code-switch corpus preprocessing (the reference
utils/preprocess.py:1-559 surface, SEAME-style).

Behaviors reproduced: noise-tag canonicalization (``(ppX)``/``<ppX>``/
``ppl|ppc|ppb|ppo|<v-noise>`` → ``<noise>``, ``<unl>``/``< unk >`` →
``<unk>``, repeated-noise collapse — reference :111-165), Mandarin char
spacing in both directions (:78-108), Kaldi file emission
(text/segments/utt2spk/spk2gender — :371-491), Mandarin char vocabulary +
BPE training text extraction (:494-539).
"""

from __future__ import annotations

import os
import re
import unicodedata
from typing import Dict, Iterable, List, Sequence, Tuple

from .kaldi import utt2spk_to_spk2utt, write_scp

_PUNCT_TABLE = {ord(c): " " for c in "!\"#$%&'()*+,-./:;=?@[\\]^_`{|}~“”‘’。，！？、"}


def is_mandarin(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def is_english(ch: str) -> bool:
    return ch.isascii() and ch.isalpha()


def remove_control_chars(text: str) -> str:
    return "".join(c for c in text if unicodedata.category(c)[0] != "C")


def insert_space_between_mandarin(text: str) -> str:
    """Each Mandarin char becomes its own token (reference :91-108)."""
    out = []
    for ch in text:
        if is_mandarin(ch):
            out.append(f" {ch} ")
        else:
            out.append(ch)
    return re.sub(r"\s+", " ", "".join(out)).strip()


def remove_space_between_mandarin(text: str) -> str:
    """Inverse: glue adjacent Mandarin chars back (reference :78-90)."""
    toks = text.strip().split()
    if not toks:
        return ""
    out = toks[0]
    for prev, cur in zip(toks, toks[1:]):
        if is_english(prev[-1]) or is_english(cur[0]):
            out += " "
        out += cur
    return out


def remove_repeated_noise(text: str, pattern: str = "<noise>") -> str:
    toks = text.split()
    out = []
    for t in toks:
        if t == pattern and out and out[-1] == pattern:
            continue
        out.append(t)
    return " ".join(out)


def normalize_text(text: str) -> str:
    """Reference :129-165 pipeline."""
    t = re.sub(r"\((pp\w+)\)", "<noise>", text.lower())
    t = re.sub(r"\<(pp\w+)\>", "<noise>", t)
    t = t.translate(_PUNCT_TABLE)
    t = remove_control_chars(t)
    t = " ".join(
        "<noise>" if w in {"ppl", "ppc", "ppb", "ppo", "<v-noise>"} else w
        for w in t.split()
    )
    t = t.replace("<unl>", "<unk>").replace("< unk >", "<unk>")
    t = re.sub(r"\<((unk)[a-z ]+)\>", "<unk>", t)
    t = insert_space_between_mandarin(t)
    t = re.sub(r"\s+", " ", t).strip()
    return remove_repeated_noise(t)


def parse_transcript_line(line: str) -> Tuple[str, str, float, float, str]:
    """'<utt_id> <start_ms> <end_ms> <lang> <text...>' SEAME convention →
    (utt_id, recording_id, start_s, end_s, text)."""
    parts = line.rstrip("\n").split("\t") if "\t" in line else line.split(None, 4)
    rec_id, start_ms, end_ms = parts[0], parts[1], parts[2]
    text = parts[-1] if len(parts) >= 4 else ""
    start_s, end_s = float(start_ms) / 1000.0, float(end_ms) / 1000.0
    utt_id = f"{rec_id}-{int(float(start_ms)):08d}-{int(float(end_ms)):08d}"
    return utt_id, rec_id, start_s, end_s, text


def write_kaldi_files(
    entries: Sequence[Tuple[str, str, float, float, str]],
    out_dir: str,
    gender_of: Dict[str, str] = None,
) -> int:
    """Emit text/segments/utt2spk/spk2utt/spk2gender (reference :371-491)."""
    os.makedirs(out_dir, exist_ok=True)
    texts, segments, u2s, genders = [], [], [], []
    for utt_id, rec_id, start, end, raw in entries:
        norm = normalize_text(raw)
        if not norm:
            continue
        texts.append((utt_id, norm))
        segments.append((utt_id, f"{rec_id} {start:.3f} {end:.3f}"))
        spk = rec_id.split("_")[0]
        u2s.append((utt_id, spk))
        if gender_of and spk in gender_of:
            genders.append((spk, gender_of[spk]))
    write_scp(os.path.join(out_dir, "text"), texts)
    write_scp(os.path.join(out_dir, "segments"), segments)
    write_scp(os.path.join(out_dir, "utt2spk"), u2s)
    write_scp(os.path.join(out_dir, "spk2utt"), utt2spk_to_spk2utt(u2s))
    if genders:
        write_scp(os.path.join(out_dir, "spk2gender"),
                  sorted(set(genders)))
    return len(texts)


def build_char_vocab(texts: Iterable[str]) -> List[str]:
    """Mandarin char vocabulary (reference :494-539)."""
    chars = set()
    for t in texts:
        for tok in t.split():
            if len(tok) == 1 and is_mandarin(tok):
                chars.add(tok)
    return sorted(chars)


def extract_bpe_train_text(texts: Iterable[str]) -> List[str]:
    """English-only word stream for BPE training (reference :494-539)."""
    out = []
    for t in texts:
        words = [w for w in t.split() if w.isascii() and not w.startswith("<")]
        if words:
            out.append(" ".join(words))
    return out


# ------------------- dataset split machinery (reference :168-370) ----------


def fit_format(digit) -> float:
    """Round a msec stamp to the devset's filename convention
    (reference :271-277)."""
    s = str(float(digit) / 10.0)
    return float(digit) + 1 if int(s[-1]) >= 5 else float(digit)


def _stamp(value: str) -> str:
    """msec stamp → zero-padded centisecond id (reference :229-244)."""
    if len(value) < 5:
        return str(int(round(fit_format(value) / 10, 0))).zfill(5)
    return str(int(round(float(value) / 10, 0)))


def read_list(path: str) -> Tuple[List[str], List[str]]:
    """wav_file.txt rows → (session types, session ids)
    (reference :168-181)."""
    stypes, idxs = [], []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("/")
            stypes.append(parts[-3])
            idxs.append(parts[-2])
    return stypes, idxs


def read_text(path: str, rmspk: bool = False) -> List[str]:
    """devset text → utterance ids (reference :184-199)."""
    idxs = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key = line.split()[0]
            if rmspk:
                key = key.split("-", 1)[-1]
            idxs.append(key.lower())
    return idxs


def read_trans(
    data_dict: Dict[str, Dict],
    path: str,
    phase: str,
    audio_list: Sequence[str],
    audio_pth: str,
) -> None:
    """Parse one SEAME transcript file into data_dict
    (reference :202-268): key = '{session}-{start}-{end}' with the
    devset stamp format; records carry text/speaker/split/audio path."""
    audio_set = set(audio_list)
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if phase.lower() == "phasei":
                parts = line.split("\t")
                if len(parts) == 4:
                    idx, start, end, text = parts
                else:
                    idx = parts[0]
                    print(f"Skip {idx} ... (no transcript)")
                    continue
            elif phase.lower() == "phaseii":
                idx, start, end, _lang, text = line.split("\t")
            else:
                raise ValueError("phase must be PhaseI or PhaseII")
            start_ms, end_ms = start, end
            start_id, end_id = _stamp(start), _stamp(end)
            name = f"{idx}-{start_id}-{end_id}"
            if name.lower() in data_dict:
                raise ValueError(f"repeated idx {name}")
            head = idx.split("_")[0]
            spkr = (head[2:-2] if head[0].isdigit() else head[:5]).lower()
            if idx.split("-")[0] not in audio_set:
                raise ValueError(f"FLAC idx error for {idx}")
            data_dict[name.lower()] = {
                "text": text,
                "start": start_id,
                "end": end_id,
                "speaker": spkr,
                "split": "train",
                "audio_pth": os.path.join(
                    audio_pth, name.split("-")[0] + ".flac"
                ),
                "start_ms": start_ms,
                "end_ms": end_ms,
                "phase": phase,
            }


def check_audio(data_dict: Dict[str, Dict],
                audio_dict: Sequence[str]) -> List[str]:
    """Keys whose audio file is missing (reference :280-285)."""
    audio_set = set(audio_dict)
    return [k for k in data_dict if k.split("-")[0] not in audio_set]


def check_test_split(test: Sequence[str], data_dict: Dict[str, Dict],
                     splitname: str) -> int:
    """Tag dev/test utterances in data_dict by fuzzy (±3 cs) time match
    (reference :288-311). → matched count."""
    space: Dict[str, List[List[float]]] = {}
    idx_space: Dict[str, List[List[str]]] = {}
    for key in data_dict:
        idx, start, end = key.split("-")
        idx_space.setdefault(idx, []).append([start, end])
        space.setdefault(idx, []).append([float(start), float(end)])
    count = 0
    for key in test:
        idx, start, end = key.split("-")
        start, end = float(start), float(end)
        for li, (t0, t1) in enumerate(space.get(idx, [])):
            if abs(start - t0) < 3 and abs(end - t1) < 3:
                count += 1
                s_id, e_id = idx_space[idx][li]
                data_dict[f"{idx}-{s_id}-{e_id}"]["split"] = splitname
                break
    print(f"=> Test set = {count}/{len(test)}")
    return count


def sieve_train(data_dict: Dict[str, Dict],
                train_dict: Sequence[str]) -> None:
    """Tag samples that are neither train-listed nor dev as 'other'
    (reference :314-323)."""
    train_set = set(train_dict)
    for key, rec in data_dict.items():
        if rec["split"] == "train" and key.split("-")[0] in train_set:
            continue
        if rec["split"] in ("devman", "devsge"):
            continue
        rec["split"] = "other"


def split_val(
    data_dict: Dict[str, Dict],
    num_val: int = None,
    seed: int = 0,
) -> Tuple[Dict[str, Dict], List[str], List[str], List[str]]:
    """Carve a validation set out of train (5% default,
    reference :326-345). → (data_dict, train, val, test key lists)."""
    import random as _rd

    test_list, tr_list = [], []
    for key, rec in data_dict.items():
        if rec["split"] in ("devman", "devsge"):
            test_list.append(key)
        elif rec["split"] == "train":
            tr_list.append(key)
    _rd.Random(seed).shuffle(tr_list)
    val_len = num_val if num_val else int(len(tr_list) * 0.05)
    tr_list, val_list = tr_list[:-val_len], tr_list[-val_len:]
    for key in val_list:
        data_dict[key]["split"] = "valid"
    return data_dict, tr_list, val_list, test_list


def count_data(data_dict: Dict[str, Dict]) -> Dict[str, Dict]:
    """Per-split audio hours + speaker counts (reference :348-367)."""
    stats: Dict[str, Dict] = {}
    for rec in data_dict.values():
        s = stats.setdefault(rec["split"], {"seconds": 0.0,
                                            "speakers": set()})
        s["seconds"] += (float(rec["end_ms"]) - float(rec["start_ms"])) / 1000
        s["speakers"].add(rec["speaker"])
    out = {}
    for split, s in stats.items():
        out[split] = {"hours": s["seconds"] / 3600.0,
                      "speakers": len(s["speakers"])}
        print(f"=> {split} set : {out[split]['hours']:.2f} hours / "
              f"{out[split]['speakers']} speakers")
    return out
