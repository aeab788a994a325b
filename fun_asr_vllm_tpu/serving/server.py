"""FunASR-protocol WebSocket ASR server on the TPU engine.

The serving front-end the reference only ships a client for
(reference ASR_client_api.py; SURVEY.md §3.5: "the TPU build's serving
front-end must speak this exact protocol so the client and asr_check work
unchanged"). Modes:

- offline: buffer PCM until ``is_speaking: false`` → one engine decode →
  final text;
- online: partial decode every `partial_interval_s` of new audio →
  streaming text, final at end-of-speech. Partials run the windowed
  incremental encoder (audio/streaming.py): only the last window_s of
  audio is re-encoded per partial — O(window) instead of the previous
  O(stream) re-encode;
- 2pass: online partials (mode "2pass-online") + an offline-quality final
  (mode "2pass-offline").

Concurrent streams share one FunASRNano + engine through the async
admission front (engine/async_engine.py): each session's decode is
submitted into the continuous-batching stepper, so overlapping requests
share decode bursts instead of serializing — N concurrent streams see
~1× latency, matching vLLM's behavior in the reference stack.

Run: python -m fun_asr_vllm_tpu.serving.server --model_dir <dir> --port 10095
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import re
import threading
from typing import Optional

import numpy as np

from .protocol import Handshake, result_message

logger = logging.getLogger(__name__)


def parse_hotwords(raw: str) -> list:
    """Hotword string → list. The reference CLIENT joins .txt hotword
    files with SPACES (ASR_client_api.py:138-145) while this repo's CLI
    convention is comma-separated (cli/test.py) — accept both."""
    return [h for h in re.split(r"[,\s]+", raw or "") if h.strip()]


def delta_after(prev: str, text: str) -> str:
    """The suffix of `text` an append-assembling protocol consumer
    still needs after having rendered `prev`: plain suffix when `text`
    extends `prev`, otherwise cut at the longest common prefix so the
    already-sent part is never re-sent (reference client appends
    online-mode text, ASR_client_api.py:186-197)."""
    if text.startswith(prev):
        return text[len(prev):]
    common = 0
    for a, b in zip(prev, text):
        if a != b:
            break
        common += 1
    return text[common:]


class ASRServer:
    def __init__(
        self,
        model_dir: str,
        *,
        dtype: str = "bfloat16",
        enable_engine: bool = True,
        max_num_seqs: int = 16,
        max_tokens: int = 500,
        partial_interval_s: float = 0.6,
        max_connections: Optional[int] = None,
    ) -> None:
        from ..models.nano import FunASRNano

        self.model, _ = FunASRNano.from_pretrained(model=model_dir, dtype=dtype)
        self.async_llm = None
        if enable_engine:
            from ..engine import AsyncLLM, LLM, SamplingParams

            m = self.model
            m.vllm = LLM(
                params=m.llm_params, config=m.llm_cfg, tokenizer=m.tokenizer,
                dtype=dtype, max_num_seqs=max_num_seqs,
            )
            m.vllm_sampling_params = SamplingParams(
                top_p=0.001, max_tokens=max_tokens
            )
            self.async_llm = AsyncLLM(m.vllm, m.vllm_sampling_params)
        self._decode_lock = threading.Lock()  # engine-less fallback only
        self.partial_interval_s = partial_interval_s
        self.max_tokens = max_tokens
        # admission control: beyond this many concurrent sessions a new
        # connection gets a terminal error reply + close(1013 try-later)
        # instead of silently queueing behind the engine (KV pressure).
        # Default: 4 streams per engine slot — online sessions are idle
        # most of the time, so modest oversubscription is safe.
        self.max_connections = (max_connections if max_connections
                                else 4 * max_num_seqs)
        # dedicated executor for engine-blocking waits: every decode
        # parks a thread on a Future the stepper resolves, so the pool
        # must cover max_connections — asyncio's default pool
        # (min(32, cpu+4)) silently serializes sessions past its size,
        # defeating the admission-control contract above (round-5
        # review finding; the measured co-batch width was pinned at the
        # default pool size on a 1-CPU host)
        from concurrent.futures import ThreadPoolExecutor

        self._exec = ThreadPoolExecutor(
            max_workers=self.max_connections + 4,
            thread_name_prefix="asr-session")
        self._active_sessions = 0
        self.metrics = {
            "sessions_total": 0, "sessions_rejected": 0,
            "finals_total": 0, "partials_total": 0,
            "vad_segment_finals_total": 0,
        }

    # -------------------------------------------------------------- decode

    def decode_pcm(self, pcm: np.ndarray, hs: Handshake,
                   max_tokens: Optional[int] = None,
                   on_text=None) -> str:
        """int16-scale float [-1,1] mono 16 kHz → transcript.

        `on_text(chunk)` (optional, engine mode only) streams raw
        incrementally detokenized text while the decode is in flight."""
        from ..text.zh_itn import inverse_normalize_text

        if pcm.size < 400:  # below one fbank window
            return ""
        m = self.model
        hotwords = parse_hotwords(hs.hotwords)
        # feature prep is pure jitted compute — safe from any session thread
        instruction = m.build_instruction(hotwords=hotwords, itn=hs.itn)
        prefix_ids, suffix_ids = m.chatml_parts(instruction)
        speech, speech_lengths = m.frontend.extract([pcm])
        enc_out, enc_lens = m.audio_encoder(speech, speech_lengths)
        audio, audio_lens = m.audio_adaptor(enc_out, enc_lens)
        embeds = m.build_prompt_embeds(
            audio, audio_lens, prefix_ids, suffix_ids
        )[0]
        if self.async_llm is not None:
            sp = m.vllm_sampling_params
            if max_tokens is not None:
                from ..engine import SamplingParams

                sp = SamplingParams(top_p=0.001, max_tokens=max_tokens)
            # concurrent sessions batch inside the engine stepper
            if on_text is not None:
                req = self.async_llm.submit(
                    embeds, sp, on_text=on_text
                ).result()
                text = m.tokenizer.decode(
                    req.out_ids, skip_special_tokens=sp.skip_special_tokens
                )
            else:
                text = self.async_llm.decode_text(embeds, sp)
        else:
            import jax.numpy as jnp

            from ..models import qwen3 as qwen3_mod

            with self._decode_lock:
                ids = qwen3_mod.greedy_decode_simple(
                    m.llm_params, m.llm_cfg, jnp.asarray(embeds)[None],
                    max_new_tokens=max_tokens or self.max_tokens,
                )
            text = m.tokenizer.decode(ids.tolist(), skip_special_tokens=True)
        from ..text.normalize import clean_response

        text = clean_response(text).strip()
        if hs.itn:
            text = inverse_normalize_text(text)
        return text

    def partial_token_cap(self, audio_seconds: float) -> int:
        """Partial-decode token budget: grows with the audio so long
        utterances' streaming text doesn't silently stop at a fixed cap,
        bounded by the configured max_tokens."""
        return int(min(self.max_tokens, max(64, audio_seconds * 4)))

    def decode_encoder_frames(self, enc_frames: np.ndarray, hs: Handshake,
                              max_tokens: int = 64) -> str:
        """Adaptor + prompt + decode from pre-encoded frames — the
        streaming partial path (encoder work already done incrementally
        by audio/streaming.StreamingEncoder)."""
        from ..text.zh_itn import inverse_normalize_text

        if enc_frames.shape[0] < 2:
            return ""
        m = self.model
        import jax.numpy as jnp

        hotwords = parse_hotwords(hs.hotwords)
        instruction = m.build_instruction(hotwords=hotwords, itn=hs.itn)
        prefix_ids, suffix_ids = m.chatml_parts(instruction)
        # bucketed frame count: avoid a recompile per growing partial
        f = enc_frames.shape[0]
        fb = -(-f // 512) * 512
        padded = np.zeros((1, fb, enc_frames.shape[1]), np.float32)
        padded[0, :f] = enc_frames
        audio, audio_lens = m.audio_adaptor(
            jnp.asarray(padded), jnp.asarray([f])
        )
        embeds = m.build_prompt_embeds(
            audio, audio_lens, prefix_ids, suffix_ids
        )[0]
        if self.async_llm is not None:
            from ..engine import SamplingParams

            sp = SamplingParams(top_p=0.001, max_tokens=max_tokens)
            text = self.async_llm.decode_text(embeds, sp)
        else:
            from ..models import qwen3 as qwen3_mod

            with self._decode_lock:
                ids = qwen3_mod.greedy_decode_simple(
                    m.llm_params, m.llm_cfg, jnp.asarray(embeds)[None],
                    max_new_tokens=max_tokens,
                )
            text = m.tokenizer.decode(ids.tolist(), skip_special_tokens=True)
        from ..text.normalize import clean_response

        text = clean_response(text).strip()
        if hs.itn:
            text = inverse_normalize_text(text)
        return text

    def make_streaming_encoder(self):
        from ..audio.streaming import StreamingEncoder

        m = self.model
        return StreamingEncoder(m.encoder_params, m.encoder_cfg, m.frontend)

    class _OnlineSession:
        """Per-connection incremental state: windowed encoder + cached
        LLM prompt (engine/engine.PromptSession). Each partial extends
        the cached [prefix ⧺ stable audio tokens] with only the NEW
        stable tokens and prefills just [live-tail tokens ⧺ suffix] —
        chunked prefill instead of re-prefilling the whole prompt."""

        def __init__(self, server: "ASRServer", hs: Handshake):
            self.server = server
            self.hs = hs
            self.enc = server.make_streaming_encoder()
            self.psess = None
            self.fed_tokens = 0  # audio tokens already in the cached prompt
            m = server.model
            hotwords = parse_hotwords(hs.hotwords)
            instruction = m.build_instruction(hotwords=hotwords, itn=hs.itn)
            prefix_ids, suffix_ids = m.chatml_parts(instruction)
            self.prefix = np.asarray(m.embed_ids(prefix_ids))
            self.suffix = np.asarray(m.embed_ids(suffix_ids))

        def reset(self) -> None:
            self.enc.reset()
            self.fed_tokens = 0
            if self.psess is not None:
                with self.server.async_llm.exclusive():
                    self.psess.close()
                self.psess = None

        def partial(self, new_samples: np.ndarray, max_tokens: int = 64
                    ) -> str:
            import jax.numpy as jnp

            from ..engine import SamplingParams
            from ..engine.engine import PromptSession
            from ..text.normalize import clean_response
            from ..text.zh_itn import inverse_normalize_text

            server = self.server
            m = server.model
            frames = self.enc.push(new_samples)  # [F, E]
            if frames.shape[0] < 2:
                return ""
            # bucket the frame count: exact growing shapes would compile
            # a fresh adaptor program every partial
            f = frames.shape[0]
            fb = -(-f // 512) * 512
            padded = np.zeros((1, fb, frames.shape[1]), np.float32)
            padded[0, :f] = frames
            audio, audio_lens = m.audio_adaptor(
                jnp.asarray(padded), jnp.asarray([f])
            )
            audio_np = np.asarray(audio[0, : int(audio_lens[0])], np.float32)
            # tokens computed purely from FROZEN encoder frames are final
            # (adaptor receptive field: token m needs frames ≤ 8m+3)
            stable = min(
                max(0, (self.enc._frozen_upto - 4) // 8), audio_np.shape[0]
            )
            ext_parts = []
            if self.psess is None:
                self.psess = PromptSession(server.async_llm.llm)
                ext_parts.append(self.prefix)
            if stable > self.fed_tokens:
                ext_parts.append(audio_np[self.fed_tokens : stable])
                self.fed_tokens = stable
            ext = np.concatenate(ext_parts) if ext_parts else None
            tail = np.concatenate([audio_np[self.fed_tokens :], self.suffix])
            # BOTH halves ride the shared stepper: N concurrent streams'
            # prompt appends batch into one extend dispatch and their
            # suffix decodes share bursts (~1× latency, not N×)
            req = server.async_llm.submit_partial(
                self.psess, ext, tail,
                SamplingParams(top_p=0.001, max_tokens=max_tokens),
            ).result()
            ids = list(req.out_ids)
            text = m.tokenizer.decode(ids, skip_special_tokens=True)
            text = clean_response(text).strip()
            if self.hs.itn:
                text = inverse_normalize_text(text)
            return text

    # ------------------------------------------------------------- session

    async def handle(self, websocket) -> None:
        if self._active_sessions >= self.max_connections:
            # terminal error reply (is_final ends the reference client's
            # receive loop cleanly) + 1013 "try again later"
            self.metrics["sessions_rejected"] += 1
            await websocket.send(json.dumps({
                "mode": "offline", "wav_name": "", "text": "",
                "is_final": True,
                "error": (f"server at capacity "
                          f"({self.max_connections} sessions)"),
            }, ensure_ascii=False))
            await websocket.close(code=1013, reason="server at capacity")
            return
        self._active_sessions += 1
        self.metrics["sessions_total"] += 1
        try:
            await self._handle_session(websocket)
        finally:
            self._active_sessions -= 1

    async def _handle_session(self, websocket) -> None:
        hs: Optional[Handshake] = None
        buf = np.zeros(0, dtype=np.float32)
        emitted_upto = 0.0  # seconds of audio already partial-decoded
        stream_enc = None   # windowed incremental encoder (online/2pass)
        stream_fed = 0      # samples already pushed into stream_enc
        stream_rs = None    # incremental resampler (non-16 kHz streams)
        buf16 = np.zeros(0, dtype=np.float32)  # its growing 16 kHz output
        raw_fed = 0         # raw samples already fed to stream_rs
        last_partial = ""   # cumulative text already sent as partials
        epd = None          # server-side VAD endpointer (vad_tail_sil)
        epd_fed = 0         # raw samples already fed to the endpointer
        loop = asyncio.get_running_loop()

        async def _finalize(terminal: bool = True):
            """Decode the buffered utterance, send the final, reset the
            per-utterance stream state. Two triggers share this path: the
            client's `is_speaking: false` (terminal — the reply carries
            `is_final: true`, the protocol's end-of-session marker) and a
            server-side VAD endpoint (a SEGMENT final with
            `is_final: false`; protocol consumers APPEND offline-mode
            text, reference ASR_client_api.py:186-190, so a stream cut
            into N segments accumulates N finals client-side)."""
            nonlocal buf, emitted_upto, stream_fed, last_partial
            nonlocal stream_rs, buf16, raw_fed, epd_fed
            pcm16 = buf
            if hs.audio_fs != 16000:
                from ..audio.io import resample

                pcm16 = resample(buf, hs.audio_fs, 16000)
            on_text = None
            if hs.mode == "2pass" and self.async_llm is not None:
                # stream the final's tokens as they decode (incremental
                # detokenization in the engine) — but only the part
                # BEYOND what the partials already streamed: the
                # reference client appends every 2pass-online chunk, so
                # re-streaming the whole final would render the
                # utterance twice in the online buffer
                _sent = {"cum": "", "lp": last_partial}

                def on_text(chunk, _ws=websocket, _hs=hs):
                    prev = _sent["cum"]
                    _sent["cum"] = cum = prev + chunk
                    start = max(len(prev), len(_sent["lp"]))
                    if len(cum) <= start:
                        return
                    asyncio.run_coroutine_threadsafe(
                        _ws.send(result_message(
                            "2pass-online", _hs.wav_name, cum[start:], False,
                        )),
                        loop,
                    )

            text = await loop.run_in_executor(
                self._exec, lambda: self.decode_pcm(pcm16, hs, None,
                                                    on_text=on_text)
            )
            mode = ("2pass-offline" if hs.mode == "2pass" else hs.mode)
            if hs.mode == "online":
                # streaming consumers APPEND online-mode text — the
                # final must be a delta like the partials, including the
                # longest-common-prefix fallback when the full-context
                # re-decode revises earlier text (a bare startswith test
                # would resend the WHOLE transcript on any divergence)
                text = delta_after(last_partial, text)
            await websocket.send(
                result_message(mode, hs.wav_name, text, terminal)
            )
            self.metrics["finals_total"] += 1
            if not terminal:
                self.metrics["vad_segment_finals_total"] += 1
            buf = np.zeros(0, dtype=np.float32)
            emitted_upto = 0.0
            stream_fed = 0
            last_partial = ""
            # non-16 kHz state must restart with the buffer:
            # stale raw_fed/buf16 would replay utterance-1 audio
            # into the next utterance's partials
            stream_rs = None
            buf16 = np.zeros(0, dtype=np.float32)
            raw_fed = 0
            epd_fed = 0
            if epd is not None:
                epd.reset()
            if stream_enc is not None:
                await loop.run_in_executor(self._exec, stream_enc.reset)
            hs.is_speaking = True  # allow another utterance

        try:
            async for message in websocket:
                if isinstance(message, (bytes, bytearray)):
                    pcm = np.frombuffer(bytes(message), dtype="<i2").astype(
                        np.float32
                    ) / 32768.0
                    buf = np.concatenate([buf, pcm])
                    if hs is None:
                        continue
                    if (hs.mode in ("online", "2pass")
                            and (hs.vad_tail_sil or hs.vad_max_len)):
                        # server-side VAD endpointing: cut the utterance
                        # on trailing silence / max length and emit the
                        # final without waiting for is_speaking:false
                        if epd is None:
                            from ..audio.streaming import (
                                StreamingEndpointer,
                            )

                            # explicit 0 means "trigger disabled", not
                            # "use the default" — only absent fields
                            # fall back (ADVICE-style 0-coercion fix)
                            epd = StreamingEndpointer(
                                tail_sil_ms=(hs.vad_tail_sil
                                             if hs.vad_tail_sil is not None
                                             else 800),
                                max_len_ms=(hs.vad_max_len
                                            if hs.vad_max_len is not None
                                            else 60000),
                                fs=hs.audio_fs,
                            )
                        fire = epd.push(buf[epd_fed:])
                        epd_fed = len(buf)
                        if fire:
                            await _finalize(terminal=False)
                            continue
                    if hs.mode in ("online", "2pass"):
                        dur = len(buf) / hs.audio_fs
                        if dur - emitted_upto >= self.partial_interval_s:
                            emitted_upto = dur
                            part = buf
                            if hs.audio_fs != 16000:
                                # partials must see 16 kHz too, same as
                                # the final path. Incremental polyphase:
                                # each tick converts only the NEW raw
                                # samples (O(new), not O(stream) — the
                                # emitted 16 kHz stream is append-only,
                                # so the encoder never resets)
                                from ..audio.streaming import (
                                    StreamingResampler,
                                )

                                if stream_rs is None:
                                    stream_rs = StreamingResampler(
                                        hs.audio_fs, 16000
                                    )
                                buf16 = np.concatenate(
                                    [buf16, stream_rs.push(buf[raw_fed:])]
                                )
                                raw_fed = len(buf)
                                part = buf16
                            if stream_enc is None:
                                stream_enc = (
                                    self._OnlineSession(self, hs)
                                    if self.async_llm is not None
                                    else self.make_streaming_encoder()
                                )

                            cap = self.partial_token_cap(dur)

                            def _partial(part=part, cap=cap):
                                nonlocal stream_fed
                                new = part[stream_fed:]
                                stream_fed = len(part)
                                if self.async_llm is not None:
                                    # chunked prefill: cached prompt grows
                                    # with stable audio tokens; only the
                                    # live tail + suffix prefill per
                                    # partial
                                    return stream_enc.partial(new, cap)
                                frames = stream_enc.push(new)
                                return self.decode_encoder_frames(
                                    frames, hs, cap
                                )

                            text = await loop.run_in_executor(self._exec, _partial)
                            # the protocol's streaming consumers APPEND
                            # partial chunks (reference client
                            # ASR_client_api.py:186-197) — send the DELTA
                            # of the cumulative transcript, not the whole
                            delta = delta_after(last_partial, text)
                            last_partial = text
                            self.metrics["partials_total"] += 1
                            if delta:
                                mode = ("2pass-online" if hs.mode == "2pass"
                                        else "online")
                                await websocket.send(
                                    result_message(mode, hs.wav_name, delta,
                                                   False)
                                )
                    continue
                # JSON control message
                data = json.loads(message)
                if hs is None:
                    hs = Handshake.from_json(message)
                    if hs.audio_fs != 16000:
                        logger.info("resampling %s Hz stream", hs.audio_fs)
                    continue
                if data.get("is_speaking") is False:
                    await _finalize()
        except Exception as e:
            logger.warning("session ended: %s", e, exc_info=True)
        finally:
            # release the session's cached-prompt KV blocks — via the
            # pool: reset() takes the engine lock, which the stepper
            # holds across whole decode bursts; taking it on the event
            # loop thread would stall EVERY session for the burst
            # duration on each disconnect (round-5 review finding)
            if stream_enc is not None and hasattr(stream_enc, "psess"):
                def _release(se=stream_enc):
                    try:
                        se.reset()
                    except Exception:
                        pass
                try:
                    self._exec.submit(_release)
                except RuntimeError:
                    # interpreter/pool shutdown: the engine dies with
                    # the process, nothing left to release
                    pass

    # -------------------------------------------------------------- metrics

    def metrics_text(self) -> str:
        """Prometheus text exposition of server + engine counters."""
        lines = []

        def emit(name, value, mtype="counter"):
            lines.append(f"# TYPE fun_asr_{name} {mtype}")
            lines.append(f"fun_asr_{name} {value}")

        for k, v in self.metrics.items():
            emit(k, v)
        emit("active_sessions", self._active_sessions, "gauge")
        emit("max_connections", self.max_connections, "gauge")
        llm = getattr(self.model, "vllm", None)
        if llm is not None:
            for k, v in llm.stats.items():
                emit(f"engine_{k}",
                     f"{v:.6f}" if isinstance(v, float) else v)
            emit("engine_free_kv_blocks", len(llm._free_blocks), "gauge")
            emit("engine_total_kv_blocks", llm.cache_cfg.num_blocks, "gauge")
        return "\n".join(lines) + "\n"

    async def _serve_metrics(self, host: str, port: int):
        """Minimal HTTP /metrics endpoint (no deps beyond asyncio)."""

        async def on_conn(reader, writer):
            try:
                # read the request line + headers (ignored beyond line 1)
                line = await reader.readline()
                while (await reader.readline()).strip():
                    pass
                body = (self.metrics_text()
                        if b"/metrics" in line or line.startswith(b"GET / ")
                        else "not found\n")
                status = ("200 OK" if body != "not found\n"
                          else "404 Not Found")
                payload = body.encode()
                writer.write(
                    f"HTTP/1.1 {status}\r\n"
                    f"Content-Type: text/plain; version=0.0.4\r\n"
                    f"Content-Length: {len(payload)}\r\n"
                    f"Connection: close\r\n\r\n".encode() + payload)
                await writer.drain()
            finally:
                writer.close()

        srv = await asyncio.start_server(on_conn, host, port)
        logger.info("metrics on http://%s:%d/metrics", host, port)
        return srv

    async def serve(self, host: str = "0.0.0.0", port: int = 10095,
                    metrics_port: Optional[int] = None):
        import websockets

        if metrics_port:
            await self._serve_metrics(host, metrics_port)
        async with websockets.serve(
            self.handle, host, port, subprotocols=["binary"], max_size=None
        ):
            logger.info("ASR server listening on %s:%d", host, port)
            await asyncio.Future()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", type=str, required=True)
    ap.add_argument("--host", type=str, default="0.0.0.0")
    ap.add_argument("--port", type=int, default=10095)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--max_num_seqs", type=int, default=16)
    ap.add_argument("--disable_engine", action="store_true")
    ap.add_argument("--max_connections", type=int, default=None,
                    help="admission cap on concurrent sessions "
                         "(default 4x max_num_seqs); over it, new "
                         "connections get a terminal error + close(1013)")
    ap.add_argument("--metrics_port", type=int, default=None,
                    help="serve Prometheus text metrics on "
                         "http://HOST:PORT/metrics")
    args = ap.parse_args()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    )
    server = ASRServer(
        args.model_dir, dtype=args.dtype,
        enable_engine=not args.disable_engine,
        max_num_seqs=args.max_num_seqs,
        max_connections=args.max_connections,
    )
    asyncio.run(server.serve(args.host, args.port,
                             metrics_port=args.metrics_port))


if __name__ == "__main__":
    main()
