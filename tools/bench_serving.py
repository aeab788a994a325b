"""Concurrent-stream load test against the live WebSocket server.

Starts an in-process ASRServer (engine + async shared-burst stepper) and
drives N concurrent 2pass streams with synthetic speech through the real
client, measuring what a deployment cares about:

- partial latency: audio-chunk send → partial text received
- final latency: is_speaking=false → terminal result
- aggregate throughput: audio-seconds ingested per wall second
- engine sharing: wave sizes (how many streams actually co-batch)

Usage:
    python tools/bench_serving.py [--streams 4] [--seconds 8]
        [--model_dir DIR]        # default: fabricated tiny model —
                                 # measures protocol/scheduling latency,
                                 # NOT flagship model compute
        [--realtime]             # pace chunks at real time (default
                                 # firehose)

Prints one JSON line with the percentiles.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import socket
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_speech(seconds: float, seed: int, fs: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    env = 0.3 + 0.7 * np.abs(np.sin(2 * np.pi * 1.1 * t))
    return (rng.normal(size=t.shape) * 0.1 * env).astype(np.float32)


async def drive_stream(port: int, wav: np.ndarray, chunk_ms: float,
                       realtime: bool, name: str,
                       final_timeout: float = 300.0):
    """One 2pass session; returns (partial_latencies, final_latency,
    n_partials)."""
    import websockets

    from fun_asr_vllm_tpu.serving.protocol import Handshake

    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
    stride = int(16000 * chunk_ms / 1000) * 2
    hs = Handshake(mode="2pass", wav_name=name, itn=False)
    partial_lat, final_lat = [], None
    last_sent = time.perf_counter()
    # assigned again right before {"is_speaking": false}; initialized here
    # so an EARLY is_final (admission reject, server error path) measures
    # from the last chunk instead of raising NameError in receiver()
    t_final_sent = last_sent
    async with websockets.connect(f"ws://127.0.0.1:{port}",
                                  subprotocols=["binary"],
                                  max_size=None) as ws:
        await ws.send(hs.to_json())

        recv_done = asyncio.Event()

        async def receiver():
            nonlocal final_lat
            async for msg in ws:
                m = json.loads(msg)
                now = time.perf_counter()
                if m.get("mode", "").endswith("online"):
                    partial_lat.append(now - last_sent)
                if m.get("is_final"):
                    final_lat = now - t_final_sent
                    recv_done.set()
                    return

        rx = asyncio.create_task(receiver())
        for off in range(0, len(pcm), stride):
            await ws.send(pcm[off: off + stride])
            last_sent = time.perf_counter()
            await asyncio.sleep(chunk_ms / 1000 if realtime else 0.001)
        t_final_sent = time.perf_counter()
        await ws.send(json.dumps({"is_speaking": False}))
        await asyncio.wait_for(recv_done.wait(), timeout=final_timeout)
        rx.cancel()
    return partial_lat, final_lat, len(partial_lat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--streams_sweep", type=str, default=None,
                    help="comma-separated concurrency levels (e.g. "
                         "'1,4,8,16'): one timed run + one JSON line per "
                         "level against ONE server — the p50/p95 latency "
                         "vs concurrency curve the SLO is stated from")
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--chunk_ms", type=float, default=600.0)
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--flagship", action="store_true",
                    help="fabricate a random-weight model at the REAL "
                         "Fun-ASR-Nano shapes (50-block SANM encoder + "
                         "Qwen3-0.6B) so latency reflects flagship "
                         "compute, not tiny-model scheduling overhead")
    ap.add_argument("--realtime", action="store_true")
    ap.add_argument("--max_num_seqs", type=int, default=8)
    ap.add_argument("--max_tokens", type=int, default=None,
                    help="decode budget per final (default 32 tiny / 48 "
                         "flagship — random weights never emit EOS, so "
                         "an uncapped budget would decode to max_model_len)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from fun_asr_vllm_tpu.serving.server import ASRServer

    model_dir = args.model_dir
    tiny = model_dir is None and not args.flagship
    if model_dir is None:
        from fun_asr_vllm_tpu.models.nano import make_test_model_dir

        model_dir = make_test_model_dir(
            os.path.join(tempfile.mkdtemp(), "m"), flagship=args.flagship)
    max_tokens = args.max_tokens or (32 if tiny else 48)
    server = ASRServer(model_dir, dtype="float32" if tiny else "bfloat16",
                       enable_engine=True, max_num_seqs=args.max_num_seqs,
                       max_tokens=max_tokens)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        mport = s.getsockname()[1]
    loop = asyncio.new_event_loop()
    threading.Thread(
        target=lambda: (asyncio.set_event_loop(loop),
                        loop.run_until_complete(
                            server.serve("127.0.0.1", port,
                                         metrics_port=mport))),
        daemon=True).start()
    for _ in range(200):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.1)

    def run_level(n_streams, final_timeout=300.0):
        async def run_all():
            jobs = [drive_stream(port, synth_speech(args.seconds, i),
                                 args.chunk_ms, args.realtime, f"s{i}",
                                 final_timeout=final_timeout)
                    for i in range(n_streams)]
            return await asyncio.gather(*jobs)

        partials_before = server.metrics["partials_total"]
        t0 = time.perf_counter()
        results = asyncio.new_event_loop().run_until_complete(run_all())
        wall = time.perf_counter() - t0
        partials_computed = (server.metrics["partials_total"]
                             - partials_before)

        lats = sorted(l for p, _, _ in results for l in p)
        finals = sorted(f for _, f, _ in results if f is not None)
        pct = lambda a, q: (a[min(len(a) - 1, int(q * len(a)))]
                            if a else None)
        audio_s = n_streams * args.seconds
        return {
            "metric": "serving_2pass_load",
            "streams": n_streams,
            "audio_seconds": audio_s,
            "wall_s": round(wall, 3),
            "throughput_x_realtime": round(audio_s / wall, 2),
            "partial_p50_ms": (round(pct(lats, 0.5) * 1e3, 1)
                               if lats else None),
            "partial_p95_ms": (round(pct(lats, 0.95) * 1e3, 1)
                               if lats else None),
            "final_p50_ms": (round(pct(finals, 0.5) * 1e3, 1)
                             if finals else None),
            "final_p95_ms": (round(pct(finals, 0.95) * 1e3, 1)
                             if finals else None),
            # partials RECEIVED (empty deltas are protocol-suppressed, so
            # random weights can legitimately receive fewer than computed)
            "n_partials": len(lats),
            "partials_computed": partials_computed,
            "max_wave": (max(server.async_llm.wave_sizes)
                         if server.async_llm and server.async_llm.wave_sizes
                         else None),
            "tiny_model": tiny,
            "max_tokens": max_tokens,
        }

    levels = ([int(x) for x in args.streams_sweep.split(",")]
              if args.streams_sweep else [args.streams])
    # warmup at the largest level (compiles every wave shape; flagship
    # compiles on a cold relay cache can take many minutes — generous
    # per-final timeout here, the TIMED levels keep the strict one)
    run_level(max(levels), final_timeout=2400.0)
    for n in levels:
        if server.async_llm is not None:
            server.async_llm.wave_sizes.clear()
        print(json.dumps(run_level(n)), flush=True)


if __name__ == "__main__":
    main()
