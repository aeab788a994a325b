"""Streaming WebSocket ASR client (the reference ASR_client_api.py:1-222
surface): handshake → int16 PCM chunks at real-time-ish stride → final
``{"is_speaking": false}``; accumulates offline/online/2pass results.

Usage:
    python -m fun_asr_vllm_tpu.serving.client --host 127.0.0.1 --port 10095 \
        --audio_in a.wav --mode offline --ssl 0
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import ssl as ssl_mod
from typing import List, Optional

import numpy as np

from .protocol import Handshake

logger = logging.getLogger(__name__)


class ASR_Client:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 10095,
        mode: str = "offline",
        chunk_size: Optional[List[int]] = None,
        chunk_interval: int = 10,
        hotwords: str = "",
        itn: bool = True,
        ssl_enable: bool = False,
        vad_tail_sil: Optional[int] = None,
        vad_max_len: Optional[int] = None,
    ) -> None:
        self.host = host
        self.port = port
        self.mode = mode
        self.chunk_size = chunk_size or [5, 10, 5]
        self.chunk_interval = chunk_interval
        self.hotwords = hotwords
        self.itn = itn
        self.ssl_enable = ssl_enable
        self.vad_tail_sil = vad_tail_sil
        self.vad_max_len = vad_max_len
        self.final_text = ""
        self.streaming_text = ""

    async def transcribe(self, audio_in: str, wav_name: str = None) -> str:
        import websockets

        from ..audio.io import load_audio

        wav = load_audio(audio_in, fs=16000)
        pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()

        if self.ssl_enable:
            ctx = ssl_mod.SSLContext(ssl_mod.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False
            ctx.verify_mode = ssl_mod.CERT_NONE
            uri = f"wss://{self.host}:{self.port}"
        else:
            ctx = None
            uri = f"ws://{self.host}:{self.port}"

        hs = Handshake(
            mode=self.mode, chunk_size=self.chunk_size,
            chunk_interval=self.chunk_interval,
            wav_name=wav_name or audio_in.split("/")[-1],
            hotwords=self.hotwords, itn=self.itn,
            vad_tail_sil=self.vad_tail_sil, vad_max_len=self.vad_max_len,
        )
        async with websockets.connect(
            uri, subprotocols=["binary"], ssl=ctx, max_size=None
        ) as ws:
            await ws.send(hs.to_json())
            # chunk stride: 60 * chunk_size[1] / chunk_interval ms
            # (reference ASR_client_api.py:135-137)
            stride = int(16000 * hs.chunk_ms() / 1000) * 2  # bytes
            for off in range(0, len(pcm), stride):
                await ws.send(pcm[off : off + stride])
                await asyncio.sleep(0.001)
            await ws.send(json.dumps({"is_speaking": False}))

            self.final_text = ""
            self.streaming_text = ""
            async for message in ws:
                meg = json.loads(message)
                mode = meg.get("mode", "")
                text = meg.get("text", "")
                if mode in ("offline", "2pass-offline"):
                    self.final_text += text
                else:
                    self.streaming_text += text
                if meg.get("is_final") or mode in ("offline", "2pass-offline"):
                    break
        return self.final_text or self.streaming_text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10095)
    ap.add_argument("--audio_in", type=str, required=True)
    ap.add_argument("--mode", type=str, default="offline",
                    choices=["offline", "online", "2pass"])
    ap.add_argument("--chunk_size", type=str, default="5,10,5")
    ap.add_argument("--chunk_interval", type=int, default=10)
    ap.add_argument("--hotword", type=str, default="")
    ap.add_argument("--itn", type=int, default=1)
    ap.add_argument("--ssl", type=int, default=0)
    ap.add_argument("--vad_tail_sil", type=int, default=800,
                    help="server cuts the utterance when trailing silence "
                         "exceeds this many ms (reference "
                         "ASR_client_api.py:74-77)")
    ap.add_argument("--vad_max_len", type=int, default=60000,
                    help="server force-cuts a segment at this many ms")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    client = ASR_Client(
        host=args.host, port=args.port, mode=args.mode,
        chunk_size=[int(x) for x in args.chunk_size.split(",")],
        chunk_interval=args.chunk_interval, hotwords=args.hotword,
        itn=bool(args.itn), ssl_enable=bool(args.ssl),
        vad_tail_sil=args.vad_tail_sil, vad_max_len=args.vad_max_len,
    )
    text = asyncio.run(client.transcribe(args.audio_in))
    print(text)


if __name__ == "__main__":
    main()
