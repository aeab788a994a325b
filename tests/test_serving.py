"""Serving layer tests: protocol conformance + a real WebSocket round trip
(server + unmodified client over localhost, SURVEY.md §4 implication (e))."""

import asyncio
import json
import socket
import threading
import time

import numpy as np
import pytest

from fun_asr_vllm_tpu.serving.protocol import Handshake, result_message


class TestProtocol:
    def test_handshake_roundtrip(self):
        hs = Handshake(mode="2pass", hotwords="北京,上海", itn=False,
                       vad_tail_sil=800)
        parsed = Handshake.from_json(hs.to_json())
        assert parsed.mode == "2pass"
        assert parsed.hotwords == "北京,上海"
        assert parsed.itn is False
        assert parsed.vad_tail_sil == 800

    def test_chunk_stride(self):
        # 60 * chunk_size[1] / chunk_interval ms (reference
        # ASR_client_api.py:135-137)
        hs = Handshake(chunk_size=[5, 10, 5], chunk_interval=10)
        assert hs.chunk_ms() == 60.0

    def test_result_message(self):
        msg = json.loads(result_message("offline", "a.wav", "你好", True))
        assert msg == {"mode": "offline", "wav_name": "a.wav",
                       "text": "你好", "is_final": True}


@pytest.fixture(scope="module")
def server_port(tmp_path_factory):
    """Real ASRServer on a free port, tiny model, engine-less decode."""
    from fun_asr_vllm_tpu.models.nano import make_test_model_dir
    from fun_asr_vllm_tpu.serving.server import ASRServer

    model_dir = make_test_model_dir(
        str(tmp_path_factory.mktemp("srv_model"))
    )
    server = ASRServer(model_dir, dtype="float32", enable_engine=False,
                       max_tokens=4)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.serve("127.0.0.1", port))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # wait for the port to accept
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.1)
    else:
        pytest.fail("server did not start")
    yield port
    loop.call_soon_threadsafe(loop.stop)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    from fun_asr_vllm_tpu.audio.io import write_wav

    d = tmp_path_factory.mktemp("srv_wavs")
    t = np.arange(16000) / 16000
    p = d / "a.wav"
    write_wav(p, (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 16000)
    return str(p)


@pytest.fixture(scope="module")
def engine_server(tmp_path_factory):
    """ASRServer with the continuous-batching engine + async admission."""
    from fun_asr_vllm_tpu.models.nano import make_test_model_dir
    from fun_asr_vllm_tpu.serving.server import ASRServer

    model_dir = make_test_model_dir(
        str(tmp_path_factory.mktemp("srv_model_eng"))
    )
    server = ASRServer(model_dir, dtype="float32", enable_engine=True,
                       max_num_seqs=4, max_tokens=48)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.serve("127.0.0.1", port))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.1)
    else:
        pytest.fail("server did not start")
    yield server, port
    loop.call_soon_threadsafe(loop.stop)


class TestConcurrentSessions:
    def test_two_sessions_share_decode_bursts(self, engine_server, wav_path):
        """Two concurrent websocket sessions must overlap inside the engine
        (shared decode bursts), not serialize behind a lock."""
        from fun_asr_vllm_tpu.serving.client import ASR_Client

        server, port = engine_server

        async def both():
            c1 = ASR_Client(host="127.0.0.1", port=port, mode="offline",
                            itn=False)
            c2 = ASR_Client(host="127.0.0.1", port=port, mode="offline",
                            itn=False)
            return await asyncio.gather(
                c1.transcribe(wav_path), c2.transcribe(wav_path)
            )

        t1, t2 = asyncio.run(both())
        assert isinstance(t1, str) and isinstance(t2, str)
        assert max(server.async_llm.wave_sizes) >= 2, (
            server.async_llm.wave_sizes
        )


class TestRoundTrip:
    def test_offline(self, server_port, wav_path):
        from fun_asr_vllm_tpu.serving.client import ASR_Client

        client = ASR_Client(host="127.0.0.1", port=server_port,
                            mode="offline", itn=False)
        text = asyncio.run(client.transcribe(wav_path))
        assert isinstance(text, str)  # random weights → arbitrary text
        assert client.final_text == text

    def test_2pass_streams_partials(self, server_port, wav_path):
        from fun_asr_vllm_tpu.serving.client import ASR_Client

        client = ASR_Client(host="127.0.0.1", port=server_port,
                            mode="2pass", itn=False)
        final = asyncio.run(client.transcribe(wav_path))
        assert isinstance(final, str)

    def test_checker_against_live_server(self, server_port, wav_path):
        from fun_asr_vllm_tpu.serving.checker import ASR_Checker, determine_lang

        assert determine_lang("今天天气不错") == "zh"
        checker = ASR_Checker(zh_host="127.0.0.1", zh_port=server_port,
                              wer_threshold=0.3)
        passed, wer, transcript = checker.check("今天天气不错", wav_path)
        # random weights: transcript is garbage → must FAIL the gate
        assert passed is False
        assert wer >= 0.3


class TestOnlineChunkedPrefill:
    def test_2pass_partials_on_engine_server(self, engine_server, wav_path):
        """Online partials on the engine server run the chunked-prefill
        session (cached prompt + windowed encoder) and still produce
        partial messages plus a final."""
        from fun_asr_vllm_tpu.serving.client import ASR_Client

        server, port = engine_server

        client = ASR_Client(host="127.0.0.1", port=port, mode="2pass",
                            itn=False)
        final = asyncio.run(client.transcribe(wav_path))
        assert isinstance(final, str)
        # the cached-prompt session must have released all its blocks
        # (the release runs in the handler's finally on connection close —
        # poll briefly rather than racing it)
        llm = server.async_llm.llm
        for _ in range(50):
            if len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1:
                break
            time.sleep(0.1)
        assert len(llm._free_blocks) == llm.cache_cfg.num_blocks - 1


class TestOnlineDeltaPartials:
    def test_appended_partials_match_final_transcript(self, engine_server):
        """Online-mode messages carry DELTAS (the reference client
        APPENDS streaming text, ASR_client_api.py:186-197): the
        client-side assembly of all partials + the final must contain
        no duplicated cumulative blocks."""
        import asyncio as aio
        import json as js

        import websockets

        server, port = engine_server
        rng = np.random.default_rng(3)
        pcm = (rng.normal(scale=0.1, size=24000) * 32767).astype("<i2")

        async def run():
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", subprotocols=["binary"]
            ) as ws:
                await ws.send(js.dumps({
                    "mode": "online", "chunk_size": [5, 10, 5],
                    "chunk_interval": 10, "wav_name": "d",
                    "is_speaking": True, "itn": False,
                }))
                for i in range(0, len(pcm), 8000):
                    await ws.send(pcm[i : i + 8000].tobytes())
                    await aio.sleep(0.05)
                await ws.send(js.dumps({"is_speaking": False}))
                parts = []
                while True:
                    msg = js.loads(await aio.wait_for(ws.recv(), 120))
                    assert msg["mode"] == "online"
                    parts.append(msg["text"])
                    if msg.get("is_final"):
                        return parts

        parts = asyncio.new_event_loop().run_until_complete(run())
        assembled = "".join(parts)
        # deltas: no partial may re-contain the previously assembled text
        prefix = ""
        for p in parts[:-1]:
            if prefix and p:
                assert not p.startswith(prefix), (prefix, p)
            prefix += p
        # the assembly equals the server's final cumulative transcript
        # only when no revision happened; at minimum it must not blow up
        # to a duplicated concatenation
        assert len(assembled) <= 2 * max(len(prefix), 1) + 64


class TestNon16kOnlineStream:
    def test_8khz_online_stream_round_trips(self, engine_server):
        """A non-16 kHz online stream resamples INCREMENTALLY
        (StreamingResampler) — partials keep flowing and the session
        never resets mid-stream (VERDICT r2 item 4)."""
        import asyncio as aio
        import json as js

        import websockets

        server, port = engine_server
        rng = np.random.default_rng(5)
        t = np.arange(16000) / 8000.0  # 2 s at 8 kHz
        wave = 0.2 * np.sin(2 * np.pi * 200 * t) + 0.02 * rng.normal(
            size=t.shape
        )
        pcm = (wave * 32767).astype("<i2")

        async def run():
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", subprotocols=["binary"]
            ) as ws:
                await ws.send(js.dumps({
                    "mode": "2pass", "chunk_size": [5, 10, 5],
                    "chunk_interval": 10, "wav_name": "n16k",
                    "is_speaking": True, "itn": False,
                    "audio_fs": 8000,
                }))
                for i in range(0, len(pcm), 4000):
                    await ws.send(pcm[i : i + 4000].tobytes())
                    await aio.sleep(0.05)
                await ws.send(js.dumps({"is_speaking": False}))
                finals = []
                while True:
                    msg = js.loads(await aio.wait_for(ws.recv(), 120))
                    if msg.get("is_final"):
                        finals.append(msg["text"])
                        return finals

        finals = asyncio.new_event_loop().run_until_complete(run())
        assert len(finals) == 1 and isinstance(finals[0], str)

    def test_8khz_second_utterance_state_resets(self, engine_server,
                                                monkeypatch):
        """After a final, the resampler state (buf16/raw_fed/stream_rs)
        must restart with the buffer — stale state replayed utterance 1's
        audio into utterance 2's partials and dropped utterance 2's own
        samples. Observable: the 16 kHz sample counts fed to the online
        session after the first final must total utterance 2's length,
        not utterance 1's."""
        import asyncio as aio
        import json as js

        import websockets

        from fun_asr_vllm_tpu.serving.server import ASRServer

        server, port = engine_server
        calls: list = []
        orig = ASRServer._OnlineSession.partial

        def spy(self, new_samples, max_tokens=64):
            calls.append(len(new_samples))
            return orig(self, new_samples, max_tokens)

        monkeypatch.setattr(ASRServer._OnlineSession, "partial", spy)

        rng = np.random.default_rng(9)

        def pcm_8k(seconds):
            t = np.arange(int(8000 * seconds)) / 8000.0
            w = 0.2 * np.sin(2 * np.pi * 200 * t) + 0.02 * rng.normal(
                size=t.shape
            )
            return (w * 32767).astype("<i2")

        async def run():
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", subprotocols=["binary"]
            ) as ws:
                await ws.send(js.dumps({
                    "mode": "2pass", "chunk_size": [5, 10, 5],
                    "chunk_interval": 10, "wav_name": "two_utts",
                    "is_speaking": True, "itn": False,
                    "audio_fs": 8000,
                }))

                async def send_utt(pcm):
                    for i in range(0, len(pcm), 4000):
                        await ws.send(pcm[i : i + 4000].tobytes())
                        await aio.sleep(0.05)
                    await ws.send(js.dumps({"is_speaking": False}))
                    while True:
                        msg = js.loads(await aio.wait_for(ws.recv(), 120))
                        if msg.get("is_final"):
                            return

                await send_utt(pcm_8k(2.0))   # utterance A: 32000 @16 kHz
                mark = len(calls)
                await send_utt(pcm_8k(1.0))   # utterance B: 16000 @16 kHz
                return mark

        mark = asyncio.new_event_loop().run_until_complete(run())
        b_pushes = calls[mark:]
        assert b_pushes, "utterance B produced no partial ticks"
        fed_b = sum(b_pushes)
        # B is 1 s = 16000 samples at 16 kHz (partial ticks may miss the
        # last chunk, never exceed it); the bug fed A's full 32000
        assert fed_b <= 17000, (
            f"utterance B partials fed {fed_b} samples — stale resampler "
            f"state replayed utterance A ({b_pushes})"
        )


class TestDisconnectCleanup:
    def test_abrupt_disconnect_frees_session_blocks(self, engine_server):
        """A client that vanishes mid-2pass (no is_speaking:false, no
        close frame semantics — just a dropped socket) must not leak the
        session's cached-prompt KV blocks: the handler's finally closes
        the PromptSession. A long-lived production server would otherwise
        exhaust the pool one dead stream at a time."""
        import asyncio as aio
        import json as js

        import websockets

        server, port = engine_server
        llm = server.async_llm.llm
        rng = np.random.default_rng(9)
        t = np.arange(32000) / 16000.0  # 2 s
        wave = 0.2 * np.sin(2 * np.pi * 300 * t) + 0.02 * rng.normal(
            size=t.shape
        )
        pcm = (wave * 32767).astype("<i2")
        free_before = len(llm._free_blocks)

        async def run():
            ws = await websockets.connect(
                f"ws://127.0.0.1:{port}", subprotocols=["binary"]
            )
            await ws.send(js.dumps({
                "mode": "2pass", "chunk_size": [5, 10, 5],
                "chunk_interval": 10, "wav_name": "drop",
                "is_speaking": True, "itn": False,
            }))
            for i in range(0, len(pcm), 8000):
                await ws.send(pcm[i : i + 8000].tobytes())
                await aio.sleep(0.05)
            # at least one partial = the session holds KV blocks now
            await aio.wait_for(ws.recv(), 120)
            # drop the TCP transport WITHOUT the websocket close
            # handshake — the server's recv loop must take the
            # exception path, not a graceful StopAsyncIteration
            ws.transport.abort()

        asyncio.new_event_loop().run_until_complete(run())
        deadline = time.time() + 60
        while time.time() < deadline:
            if len(llm._free_blocks) >= free_before:
                break
            time.sleep(0.25)
        assert len(llm._free_blocks) >= free_before, (
            f"leaked {free_before - len(llm._free_blocks)} KV blocks"
        )


class TestClientCLIJobs:
    def test_collect_jobs_scp(self, tmp_path, wav_path):
        from fun_asr_vllm_tpu.serving.client import _collect_jobs

        scp = tmp_path / "wav.scp"
        scp.write_text(f"utt1 {wav_path}\nutt2 {wav_path}\n")
        assert _collect_jobs(str(scp)) == [
            ("utt1", wav_path), ("utt2", wav_path)]
        assert _collect_jobs(wav_path) == [("a.wav", wav_path)]

    def test_thread_num_streams_over_scp(self, tmp_path, server_port,
                                         wav_path):
        """--thread_num N drives the scp's jobs over N concurrent client
        streams (reference ASR_client_api.py:54-56); every job completes
        and order is preserved."""
        import argparse

        from fun_asr_vllm_tpu.serving.client import _collect_jobs, _run_jobs

        scp = tmp_path / "wav.scp"
        scp.write_text("".join(
            f"utt{i} {wav_path}\n" for i in range(5)))
        args = argparse.Namespace(
            host="127.0.0.1", port=server_port, mode="offline",
            chunk_size="5,10,5", chunk_interval=10, hotword="",
            use_itn=0, ssl=0, audio_sr=16000, send_without_sleep=1,
            thread_num=3, vad_tail_sil=None, vad_max_len=None,
        )
        results = asyncio.run(_run_jobs(args, _collect_jobs(str(scp))))
        assert [name for name, _ in results] == [
            f"utt{i}" for i in range(5)]
        assert all(isinstance(t, str) for _, t in results)

    def test_raw_array_audio_sr_resamples(self, server_port):
        """ndarray input at a non-16k audio_sr is resampled client-side
        before chunking (reference :121-133)."""
        from fun_asr_vllm_tpu.serving.client import ASR_Client

        t = np.arange(8000) / 8000
        wav8k = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        client = ASR_Client(host="127.0.0.1", port=server_port,
                            mode="offline", itn=False, audio_sr=8000)
        text = asyncio.run(client.transcribe(wav8k, wav_name="raw8k"))
        assert isinstance(text, str)

    def test_headerless_pcm_audio_sr_resamples(self, server_port, tmp_path):
        """A .pcm file (no container header) at a non-16k audio_sr is
        resampled client-side — the reference applies --audio_sr to file
        inputs too (ASR_client_api.py:121-133)."""
        from unittest import mock

        from fun_asr_vllm_tpu.serving.client import ASR_Client

        t = np.arange(8000) / 8000
        wav8k = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        pcm_path = tmp_path / "call_8k.pcm"
        pcm_path.write_bytes(
            (np.clip(wav8k, -1, 1) * 32767).astype("<i2").tobytes())
        client = ASR_Client(host="127.0.0.1", port=server_port,
                            mode="offline", itn=False, audio_sr=8000)
        with mock.patch("fun_asr_vllm_tpu.audio.io.resample",
                        wraps=__import__("fun_asr_vllm_tpu.audio.io",
                                         fromlist=["resample"]).resample
                        ) as rs:
            text = asyncio.run(client.transcribe(str(pcm_path)))
        assert isinstance(text, str)
        assert any(c.args[1:] == (8000, 16000) or
                   (c.kwargs.get("orig_sr"), c.kwargs.get("target_sr"))
                   == (8000, 16000) for c in rs.call_args_list), \
            "client did not resample the 8 kHz pcm file to 16 kHz"


class TestVadEndpointing:
    def test_vad_tail_sil_cuts_without_client_final(self, engine_server):
        """A 2pass stream whose handshake carries vad_tail_sil gets a
        server-side SEGMENT final (is_final=false — protocol consumers
        append offline-mode text) when trailing silence exceeds it — the
        reference stack's VAD segmentation contract
        (ASR_client_api.py:74-81) — and the terminal reply to the
        client's is_speaking:false still carries is_final=true."""
        import asyncio as aio
        import json as js

        import websockets

        server, port = engine_server
        fs = 16000
        t = np.arange(fs) / fs
        speech = (0.25 * np.sin(2 * np.pi * 320 * t)).astype(np.float32)
        sil = np.zeros(fs, np.float32)  # 1 s >> tail_sil 400 ms

        def pcm(x):
            return (x * 32767).astype("<i2").tobytes()

        async def run():
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", subprotocols=["binary"]
            ) as ws:
                await ws.send(js.dumps({
                    "mode": "2pass", "chunk_size": [5, 10, 5],
                    "chunk_interval": 10, "wav_name": "vadcut",
                    "is_speaking": True, "itn": False,
                    "vad_tail_sil": 400, "vad_max_len": 60000,
                }))
                finals = []

                async def drain_until_offline():
                    while True:
                        msg = js.loads(await aio.wait_for(ws.recv(), 120))
                        if msg.get("mode") == "2pass-offline":
                            finals.append(msg)
                            return

                # utterance 1: speech then silence — NO is_speaking:false
                for x in (speech, sil):
                    for i in range(0, len(x), 3200):
                        await ws.send(pcm(x[i : i + 3200]))
                        await aio.sleep(0.02)
                await drain_until_offline()
                # utterance 2 on the SAME stream, closed by the client
                for i in range(0, len(speech), 3200):
                    await ws.send(pcm(speech[i : i + 3200]))
                    await aio.sleep(0.02)
                await ws.send(js.dumps({"is_speaking": False}))
                await drain_until_offline()
                return finals

        finals = asyncio.new_event_loop().run_until_complete(run())
        assert len(finals) == 2
        assert all(f["mode"] == "2pass-offline" for f in finals)
        # the VAD cut is a segment final; the client-closed utterance
        # carries the protocol's terminal marker
        assert finals[0]["is_final"] is False
        assert finals[1]["is_final"] is True

    def test_no_vad_fields_means_no_server_cut(self, engine_server):
        """Without vad_tail_sil/vad_max_len in the handshake the server
        must never cut on its own — long silence stays buffered until
        the client's is_speaking:false (backward-compatible default)."""
        import asyncio as aio
        import json as js

        import websockets

        server, port = engine_server
        fs = 16000
        t = np.arange(fs) / fs
        speech = (0.25 * np.sin(2 * np.pi * 320 * t)).astype(np.float32)
        sil = np.zeros(2 * fs, np.float32)

        def pcm_bytes(x):
            return (x * 32767).astype("<i2").tobytes()

        async def run():
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", subprotocols=["binary"]
            ) as ws:
                await ws.send(js.dumps({
                    "mode": "2pass", "chunk_size": [5, 10, 5],
                    "chunk_interval": 10, "wav_name": "nocut",
                    "is_speaking": True, "itn": False,
                }))
                for x in (speech, sil):
                    for i in range(0, len(x), 3200):
                        await ws.send(pcm_bytes(x[i : i + 3200]))
                        await aio.sleep(0.01)
                # actively assert NO server-side final arrives while the
                # stream idles (partials are fine) — the old version
                # only counted finals after is_speaking:false, which
                # passed even with an early cut
                try:
                    while True:
                        msg = js.loads(await aio.wait_for(ws.recv(), 2.5))
                        assert msg.get("mode") != "2pass-offline", (
                            f"server cut without vad fields: {msg}")
                except aio.TimeoutError:
                    pass  # quiet — as required
                await ws.send(js.dumps({"is_speaking": False}))
                while True:
                    msg = js.loads(await aio.wait_for(ws.recv(), 120))
                    if msg.get("mode") == "2pass-offline":
                        assert msg.get("is_final") is True
                        return 1

        assert asyncio.new_event_loop().run_until_complete(run()) == 1


class TestAdmissionAndMetrics:
    def test_capacity_rejection_and_metrics_endpoint(self, tmp_path_factory):
        """A server at max_connections rejects a new handshake with a
        terminal error reply + close(1013), and /metrics serves
        Prometheus text with session/engine counters."""
        import json as js
        import urllib.request

        from fun_asr_vllm_tpu.models.nano import make_test_model_dir
        from fun_asr_vllm_tpu.serving.server import ASRServer

        model_dir = make_test_model_dir(
            str(tmp_path_factory.mktemp("srv_model_cap")))
        server = ASRServer(model_dir, dtype="float32", enable_engine=False,
                           max_tokens=4, max_connections=1)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            mport = s.getsockname()[1]

        loop = asyncio.new_event_loop()

        def run_srv():
            asyncio.set_event_loop(loop)
            loop.run_until_complete(
                server.serve("127.0.0.1", port, metrics_port=mport))

        threading.Thread(target=run_srv, daemon=True).start()
        for _ in range(100):
            try:
                with socket.create_connection(("127.0.0.1", port),
                                              timeout=0.2):
                    break
            except OSError:
                time.sleep(0.1)
        else:
            pytest.fail("server did not start")

        async def run():
            import websockets

            uri = f"ws://127.0.0.1:{port}"
            async with websockets.connect(uri, subprotocols=["binary"]) as a:
                # first session occupies the single slot (no traffic yet)
                await asyncio.sleep(0.2)
                async with websockets.connect(
                        uri, subprotocols=["binary"]) as b:
                    msg = js.loads(await asyncio.wait_for(b.recv(), 10))
                    assert msg["is_final"] is True
                    assert "capacity" in msg.get("error", "")
                del a
            return True

        assert asyncio.new_event_loop().run_until_complete(run())
        txt = urllib.request.urlopen(
            f"http://127.0.0.1:{mport}/metrics", timeout=10
        ).read().decode()
        assert "fun_asr_sessions_total 1" in txt
        assert "fun_asr_sessions_rejected 1" in txt
        assert "fun_asr_active_sessions" in txt
        # engine-less server: no engine_* lines required, but gauge types
        assert "# TYPE fun_asr_active_sessions gauge" in txt
        # 404 path
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{mport}/nope",
                                   timeout=10)
            pytest.fail("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        loop.call_soon_threadsafe(loop.stop)


class TestServingLoadTool:
    def test_bench_serving_smoke(self):
        """tools/bench_serving.py runs end-to-end (2 realtime streams,
        tiny model) and reports sane percentiles + engine sharing."""
        import json as js
        import os
        import subprocess
        import sys

        r = subprocess.run(
            [sys.executable, "tools/bench_serving.py", "--streams", "2",
             "--seconds", "3", "--realtime"],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            # conftest's JAX_PLATFORMS=cpu is ignored by the axon
            # sitecustomize in CHILD processes (it pins jax_platforms at
            # interpreter boot) — FUN_ASR_PLATFORM is the env the package
            # itself honors. Without it this CPU suite silently ran its
            # one subprocess on the shared TPU relay, whose stalls/faults
            # made the test flake (round-5: 385 s pass → 600 s timeout on
            # a relay-sick evening, identical code).
            env={**os.environ, "FUN_ASR_PLATFORM": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-500:]
        out = js.loads(r.stdout.strip().splitlines()[-1])
        assert out["streams"] == 2
        assert out["final_p50_ms"] is not None
        assert out["partials_computed"] >= 2
        assert out["throughput_x_realtime"] > 0


class TestRound5ReviewFixes:
    """Round-5 serving review findings (see commit message): protocol
    hardening, hotword format bridge, append-protocol delta helper."""

    def test_handshake_rejects_method_clobber_and_bad_types(self):
        from fun_asr_vllm_tpu.serving.protocol import Handshake

        raw = json.dumps({"mode": "2pass", "to_json": 1, "chunk_ms": 0,
                          "vad_tail_sil": "800", "audio_fs": 0,
                          "chunk_size": "bad"})
        hs = Handshake.from_json(raw)
        assert callable(hs.to_json) and callable(hs.chunk_ms)
        assert hs.vad_tail_sil == 800 and isinstance(hs.vad_tail_sil, int)
        assert hs.audio_fs == 16000  # zero clamped: no div-by-zero later
        assert hs.chunk_size == [5, 10, 5]
        assert hs.chunk_ms() == 60.0

    def test_parse_hotwords_accepts_reference_space_join(self):
        """The reference client joins .txt hotword files with SPACES
        (ASR_client_api.py:138-145); the repo CLI convention is commas.
        The server must split both."""
        from fun_asr_vllm_tpu.serving.server import parse_hotwords

        assert parse_hotwords("foo bar baz") == ["foo", "bar", "baz"]
        assert parse_hotwords("foo,bar, baz") == ["foo", "bar", "baz"]
        assert parse_hotwords("") == []
        assert parse_hotwords(None) == []

    def test_delta_after_lcp(self):
        from fun_asr_vllm_tpu.serving.server import delta_after

        assert delta_after("", "abc") == "abc"
        assert delta_after("abc", "abcdef") == "def"
        # revision: resend only from the divergence point, never the
        # whole transcript (the online-final bug this fixed)
        assert delta_after("abcX", "abcdY") == "dY"
        assert delta_after("abc", "abc") == ""
