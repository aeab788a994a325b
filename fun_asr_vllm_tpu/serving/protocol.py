"""FunASR WebSocket wire protocol shared by server and client.

Captured from the reference client's behavior (reference
ASR_client_api.py:120-199): a JSON handshake, raw int16 PCM chunks, a
final ``{"is_speaking": false}``, and JSON results keyed by `mode` with
`is_final` terminating the stream.
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional


@dataclasses.dataclass
class Handshake:
    mode: str = "offline"  # offline | online | 2pass
    chunk_size: List[int] = dataclasses.field(default_factory=lambda: [5, 10, 5])
    chunk_interval: int = 10
    audio_fs: int = 16000
    wav_name: str = "demo"
    wav_format: str = "pcm"
    is_speaking: bool = True
    hotwords: str = ""
    itn: bool = True
    vad_tail_sil: Optional[int] = None
    vad_max_len: Optional[int] = None

    def to_json(self) -> str:
        d = {
            "mode": self.mode,
            "chunk_size": self.chunk_size,
            "chunk_interval": self.chunk_interval,
            "audio_fs": self.audio_fs,
            "wav_name": self.wav_name,
            "wav_format": self.wav_format,
            "is_speaking": self.is_speaking,
            "hotwords": self.hotwords,
            "itn": self.itn,
        }
        if self.vad_tail_sil is not None:
            d["vad_tail_sil"] = self.vad_tail_sil
        if self.vad_max_len is not None:
            d["vad_max_len"] = self.vad_max_len
        return json.dumps(d, ensure_ascii=False)

    @classmethod
    def from_json(cls, raw: str) -> "Handshake":
        """Parse an untrusted handshake: only declared FIELDS are set
        (a bare hasattr would also match methods — {"to_json": 1}
        would clobber one), scalar fields are coerced to their declared
        types (clients send "800" for vad_tail_sil), and audio_fs is
        clamped positive so later `len(buf)/audio_fs` math can't
        divide by zero."""
        d = json.loads(raw)
        hs = cls()
        coerce = {int: int, bool: bool, str: str, float: float}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            want = f.type if isinstance(f.type, type) else None
            base = {"int": int, "bool": bool, "str": str,
                    "Optional[int]": int}.get(str(f.type), want)
            if v is not None and base in coerce:
                try:
                    v = coerce[base](v)
                except (TypeError, ValueError):
                    continue  # keep the safe default
            setattr(hs, f.name, v)
        if not isinstance(hs.audio_fs, int) or hs.audio_fs <= 0:
            hs.audio_fs = 16000
        if not isinstance(hs.chunk_size, list) or len(hs.chunk_size) < 2:
            hs.chunk_size = [5, 10, 5]
        return hs

    def chunk_ms(self) -> float:
        """Per-chunk stride in ms (reference ASR_client_api.py:135-137)."""
        return 60 * self.chunk_size[1] / self.chunk_interval


def result_message(mode: str, wav_name: str, text: str, is_final: bool) -> str:
    return json.dumps(
        {"mode": mode, "wav_name": wav_name, "text": text, "is_final": is_final},
        ensure_ascii=False,
    )
