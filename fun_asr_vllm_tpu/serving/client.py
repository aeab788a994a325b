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
        audio_sr: int = 16000,
        send_without_sleep: bool = True,
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
        self.audio_sr = audio_sr
        self.send_without_sleep = send_without_sleep
        self.final_text = ""
        self.streaming_text = ""

    async def transcribe(self, audio_in: str, wav_name: str = None) -> str:
        import websockets

        from ..audio.io import load_audio

        # containered files carry their true rate in the header, which
        # load_audio honors; audio_sr labels raw sample arrays AND
        # headerless .pcm/.raw files (the reference applies --audio_fs to
        # pcm file inputs, ASR_client_api.py:121-133)
        headerless = isinstance(audio_in, str) and audio_in.lower().endswith(
            (".pcm", ".raw")
        )
        if self.audio_sr != 16000 and (
            isinstance(audio_in, np.ndarray) or headerless
        ):
            from ..audio.io import resample

            raw = (audio_in if isinstance(audio_in, np.ndarray)
                   else load_audio(audio_in, fs=self.audio_sr))
            wav = resample(np.asarray(raw, np.float32), self.audio_sr, 16000)
        else:
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
            wav_name=wav_name or (audio_in.split("/")[-1]
                                  if isinstance(audio_in, str) else "demo"),
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
            # real-time pacing: sleep one chunk duration between sends
            # when send_without_sleep is off (reference flag :50-52)
            pace = 0.001 if self.send_without_sleep else hs.chunk_ms() / 1000
            for off in range(0, len(pcm), stride):
                await ws.send(pcm[off : off + stride])
                await asyncio.sleep(pace)
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
                # stop on the terminal is_final, or on the single final
                # of plain offline mode; 2pass-offline SEGMENT finals
                # (server-side VAD cuts) accumulate until is_final
                # (reference ASR_client_api.py:193-197)
                if meg.get("is_final") or mode == "offline":
                    break
        return self.final_text or self.streaming_text


def _collect_jobs(audio_in: str) -> List[tuple]:
    """``(wav_name, path)`` jobs: a single audio file, or a Kaldi
    ``wav.scp`` / ``.txt`` list of ``key path`` lines."""
    if audio_in.endswith((".scp", ".txt", ".list")):
        jobs = []
        with open(audio_in) as fin:
            for line in fin:
                parts = line.strip().split(maxsplit=1)
                if len(parts) == 2:
                    jobs.append((parts[0], parts[1]))
                elif parts:
                    jobs.append((parts[0].rsplit("/", 1)[-1], parts[0]))
        return jobs
    return [(audio_in.rsplit("/", 1)[-1], audio_in)]


async def _run_jobs(args, jobs: List[tuple]) -> List[tuple]:
    """Drive the jobs over ``thread_num`` concurrent client streams
    (the reference's --thread_num, ASR_client_api.py:54-56); returns
    ``(wav_name, text)`` in job order."""
    hot = args.hotword
    if hot.endswith(".txt"):
        # hotword file: one word per line (reference :138-145)
        with open(hot) as fin:
            hot = " ".join(line.strip() for line in fin if line.strip())
    results: List[tuple] = [None] * len(jobs)
    queue: asyncio.Queue = asyncio.Queue()
    for i, job in enumerate(jobs):
        queue.put_nowait((i, job))

    async def worker():
        client = ASR_Client(
            host=args.host, port=args.port, mode=args.mode,
            chunk_size=[int(x) for x in args.chunk_size.split(",")],
            chunk_interval=args.chunk_interval, hotwords=hot,
            itn=bool(args.use_itn), ssl_enable=bool(args.ssl),
            vad_tail_sil=args.vad_tail_sil, vad_max_len=args.vad_max_len,
            audio_sr=args.audio_sr,
            send_without_sleep=bool(args.send_without_sleep),
        )
        while True:
            try:
                i, (name, path) = queue.get_nowait()
            except asyncio.QueueEmpty:
                return
            try:
                text = await client.transcribe(path, wav_name=name)
            except Exception as exc:  # keep the batch going
                logger.error("%s failed: %s", name, exc)
                text = ""
            results[i] = (name, text)

    await asyncio.gather(*[worker() for _ in range(max(1, args.thread_num))])
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10095)
    ap.add_argument("--audio_in", type=str, required=True,
                    help="wav file, or a wav.scp/.list of 'key path' lines")
    ap.add_argument("--mode", type=str, default="offline",
                    choices=["offline", "online", "2pass"])
    ap.add_argument("--chunk_size", type=str, default="5,10,5")
    ap.add_argument("--chunk_interval", type=int, default=10)
    ap.add_argument("--hotword", type=str, default="",
                    help="hotword string, or a .txt file of one per line")
    ap.add_argument("--use_itn", "--itn", dest="use_itn", type=int, default=1)
    ap.add_argument("--ssl", type=int, default=0)
    ap.add_argument("--audio_sr", type=int, default=16000,
                    help="sample rate to decode audio_in at before the "
                         "client-side 16 kHz resample (reference :46-48)")
    ap.add_argument("--send_without_sleep", type=int, default=1,
                    help="0 paces chunk sends at real time")
    ap.add_argument("--thread_num", type=int, default=1,
                    help="concurrent client streams")
    ap.add_argument("--words_max_print", type=int, default=10000)
    ap.add_argument("--output_dir", type=str, default=None,
                    help="write '<wav_name>\\t<text>' lines to "
                         "<output_dir>/text")
    ap.add_argument("--vad_tail_sil", type=int, default=800,
                    help="server cuts the utterance when trailing silence "
                         "exceeds this many ms (reference "
                         "ASR_client_api.py:74-77)")
    ap.add_argument("--vad_max_len", type=int, default=60000,
                    help="server force-cuts a segment at this many ms")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    jobs = _collect_jobs(args.audio_in)
    results = asyncio.run(_run_jobs(args, jobs))
    for name, text in results:
        print(f"{name}\t{text[: args.words_max_print]}"
              if len(jobs) > 1 else text[: args.words_max_print])
    if args.output_dir:
        import os

        os.makedirs(args.output_dir, exist_ok=True)
        with open(os.path.join(args.output_dir, "text"), "w") as fout:
            for name, text in results:
                fout.write(f"{name}\t{text}\n")


if __name__ == "__main__":
    main()
