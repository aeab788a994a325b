"""Async admission front for the continuous-batching engine.

The reference serves concurrent streams by handing every request to vLLM's
engine loop, which batches whatever is in flight (SURVEY.md §2.3
intra-engine concurrency row). This is the TPU analogue: callers from any
thread `submit()` prompt embeddings and get a Future; one stepper thread
owns the engine, admitting newly arrived requests into free decode slots
between bursts, so requests that overlap in time share decode steps —
N concurrent streams see ~1× latency instead of N×.

Greedy-only (the reference's `top_p=0.001` setting is greedy); sampling
requests should use the synchronous `LLM.generate` instead.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import List, Optional

from .engine import LLM, _Request, _as_numpy_2d
from .sampling import SamplingParams


class IncrementalDetokenizer:
    """Streaming token→text: emits only COMPLETE new text per call,
    holding back trailing tokens that still form a partial multi-byte /
    multi-token grapheme (the vLLM incremental-detokenization pattern).
    """

    REPLACEMENT = "�"

    def __init__(self, tokenizer, skip_special_tokens: bool = True) -> None:
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.ids: List[int] = []
        self._emitted = ""

    def add(self, new_ids) -> str:
        """Append token ids → newly completed text (may be empty)."""
        self.ids.extend(int(t) for t in new_ids)
        text = self.tokenizer.decode(
            self.ids, skip_special_tokens=self.skip_special_tokens
        )
        # hold back an unfinished UTF-8 sequence at the tail
        while text.endswith(self.REPLACEMENT):
            text = text[:-1]
        if not text.startswith(self._emitted):
            # tokenizer rewrote earlier text (rare merge) — re-emit all
            self._emitted = ""
        new = text[len(self._emitted):]
        self._emitted = text
        return new

    @property
    def text(self) -> str:
        return self._emitted


class AsyncLLM:
    """Thread-safe async front over an `LLM` engine.

    The engine instance is owned exclusively by the internal stepper
    thread after construction — do not call `llm.generate*` concurrently.
    """

    def __init__(self, llm: LLM, default_sampling: Optional[SamplingParams] = None,
                 suffix_arm_timeout_s: float = 30.0):
        self.llm = llm
        self._default_sampling = default_sampling or SamplingParams(
            top_p=0.001, max_tokens=500
        )
        # a PromptSession partial that cannot get a slot/KV blocks is
        # requeued; past this deadline it FAILS LOUDLY instead (the
        # pre-batching decode_with_suffix behavior) — without it,
        # exhausted-block servers hang every stream's .result() forever
        self.suffix_arm_timeout_s = suffix_arm_timeout_s
        self._waiting: deque = deque()          # thread-safe append/popleft
        self._suffix_jobs: deque = deque()      # PromptSession partials
        self._inflight: List[_Request] = []     # every unresolved request
        self._futures = {}                      # rid -> Future, guarded by _cv
        self._streams = {}                      # rid -> (cb, detok, [fed])
        self._cv = threading.Condition()
        self._engine_lock = threading.RLock()  # engine-state mutual excl.
        self._shutdown = False
        # observability: number of live slots at each decode burst — tests
        # assert concurrent sessions actually share bursts
        # recent burst widths (observability + tests); bounded — a
        # long-lived server steps bursts continuously
        self.wave_sizes: "deque[int]" = deque(maxlen=1024)
        # sizes of batched session-extend dispatches (tests assert
        # concurrent streams' appends actually share a program)
        self.extend_batch_sizes: "deque[int]" = deque(maxlen=1024)
        self._thread = threading.Thread(
            target=self._loop, name="asr-engine-stepper", daemon=True
        )
        self._thread.start()

    def submit(
        self,
        prompt_embeds,
        sampling_params: Optional[SamplingParams] = None,
        on_text=None,
    ) -> Future:
        """Enqueue one request → Future resolving to the output token ids.

        `on_text(new_text)` (optional) streams incrementally detokenized
        text from the stepper thread after every decode burst —
        multi-byte-safe via IncrementalDetokenizer."""
        sp = sampling_params or self._default_sampling
        if not sp.is_greedy:
            raise ValueError("AsyncLLM is greedy-only; use LLM.generate")
        llm = self.llm
        stop_ids = llm.eos_ids | set(sp.stop_token_ids or ())
        with self._cv:
            if self._shutdown:
                raise RuntimeError("AsyncLLM is shut down")
            req = _Request(
                llm._next_rid, _as_numpy_2d(prompt_embeds), sp.max_tokens,
                stop_ids=stop_ids,
            )
            llm._next_rid += 1
            fut: Future = Future()
            self._futures[req.rid] = fut
            if on_text is not None and llm.tokenizer is not None:
                self._streams[req.rid] = (
                    on_text,
                    IncrementalDetokenizer(
                        llm.tokenizer,
                        skip_special_tokens=sp.skip_special_tokens,
                    ),
                    [0],  # tokens already fed to the detokenizer
                )
            self._inflight.append(req)
            self._waiting.append(req)
            self._cv.notify()
        return fut

    def submit_suffix(
        self,
        session,
        suffix_embeds,
        sampling_params: Optional[SamplingParams] = None,
    ) -> Future:
        """Enqueue a PromptSession partial: the stepper prefills
        [suffix] after the session's cached prompt and decodes the
        continuation in the SHARED bursts (session.arm_suffix_request),
        so N streams' partials overlap instead of serializing under the
        engine lock. Future resolves to the finished _Request.

        The caller must not extend/close `session` until the future
        resolves (per-connection partials are naturally sequential)."""
        return self.submit_partial(session, None, suffix_embeds,
                                   sampling_params)

    def submit_partial(
        self,
        session,
        extend_embeds,
        suffix_embeds,
        sampling_params: Optional[SamplingParams] = None,
    ) -> Future:
        """One online-serving tick: append `extend_embeds` (new stable
        prompt content, may be None/empty) to the session's cached
        prompt, then prefill [suffix] and decode — both halves batched
        across concurrent streams by the stepper (engine.extend_batch +
        engine.arm_suffix_batch), so N streams pay ~one extend dispatch
        + one suffix prefill + shared bursts per tick instead of N of
        each. Future resolves to the finished _Request.

        The caller must not touch `session` until the future resolves
        (per-connection partials are naturally sequential)."""
        sp = sampling_params or self._default_sampling
        if not sp.is_greedy:
            raise ValueError("AsyncLLM is greedy-only; use LLM.generate")
        ext = None
        if extend_embeds is not None:
            ext = _as_numpy_2d(extend_embeds)
            if ext.shape[0] == 0:
                ext = None
        fut: Future = Future()
        with self._cv:
            if self._shutdown:
                raise RuntimeError("AsyncLLM is shut down")
            self._suffix_jobs.append(
                [session, ext, _as_numpy_2d(suffix_embeds), sp, fut,
                 time.monotonic() + self.suffix_arm_timeout_s]
            )
            self._cv.notify()
        return fut

    def decode_text(self, prompt_embeds, sampling_params=None) -> str:
        """Blocking convenience: submit + wait + detokenize."""
        req = self.submit(prompt_embeds, sampling_params).result()
        sp = sampling_params or self._default_sampling
        return self.llm.tokenizer.decode(
            req.out_ids, skip_special_tokens=sp.skip_special_tokens
        )

    def shutdown(self) -> None:
        with self._cv:
            self._shutdown = True
            self._cv.notify()
        self._thread.join(timeout=10)

    # ------------------------------------------------------------- stepper

    def _loop(self) -> None:
        llm = self.llm
        llm._cur_sampling = self._default_sampling
        while True:
            with self._cv:
                while (not self._waiting and not self._inflight
                       and not self._suffix_jobs and not self._shutdown):
                    self._cv.wait()
                if (self._shutdown and not self._waiting
                        and not self._inflight and not self._suffix_jobs):
                    return
            try:
                self._step()
                with self._cv:
                    stalled = ((self._waiting or self._suffix_jobs)
                               and all(r is None for r in llm._slots))
                if stalled:
                    # the step admitted nothing and nothing is live (KV
                    # blocks exhausted, e.g. held by PromptSessions): a
                    # tight retry would peg a core and starve the lock
                    # holders whose progress frees blocks
                    time.sleep(0.005)
            except Exception as e:  # fail every in-flight future, keep serving
                with self._cv:
                    futs = list(self._futures.values())
                    futs += [j[4] for j in self._suffix_jobs]
                    self._futures.clear()
                    self._waiting.clear()
                    self._inflight.clear()
                    self._suffix_jobs.clear()
                    self._streams.clear()
                for r in list(llm._slots):
                    if r is not None:
                        llm._free(r)
                for f in futs:
                    if not f.done():
                        f.set_exception(e)

    def exclusive(self):
        """Context manager giving a caller exclusive engine access
        between stepper iterations (PromptSession ops etc.)."""
        return self._engine_lock

    def _step(self) -> None:
        with self._engine_lock:
            self._step_locked()

    def _step_locked(self) -> None:
        llm = self.llm
        self._arm_suffix_jobs()
        if self._waiting:
            llm._admit(self._waiting)
        live = [r for r in llm._slots if r is not None]
        if live:
            k = llm.decode_burst_size
            llm._grow_blocks_if_needed(horizon=k)
            self.wave_sizes.append(len(live))
            llm._decode_burst(k)
        self._emit_stream_text()
        self._resolve_done()

    def _arm_suffix_jobs(self) -> None:
        """Turn queued PromptSession partials into live decode slots —
        ALL jobs' prompt appends apply in one batched extend dispatch
        (engine.extend_batch), then ALL armable jobs' suffixes prefill
        in one batched dispatch (engine.arm_suffix_batch) and decode in
        the shared bursts."""
        from .engine import arm_suffix_batch, extend_batch

        llm = self.llm
        jobs = []
        with self._cv:
            while self._suffix_jobs:
                job = self._suffix_jobs.popleft()
                if job[4].cancelled():
                    continue
                jobs.append(job)
        if not jobs:
            return
        exts = [(j[0], j[1]) for j in jobs if j[1] is not None]
        if exts:
            try:
                extend_batch(llm, exts)
                self.extend_batch_sizes.append(len(exts))
                for j in jobs:  # applied — a requeue must not re-extend
                    j[1] = None
            except Exception:
                # one stream's append failed the whole batch dispatch —
                # retry individually so only the offending streams'
                # futures fail (extend_batch never advances cached_len
                # on failure, so per-job retries are safe)
                from .engine import KVBlocksExhausted

                now = time.monotonic()
                survivors, requeue = [], []
                for j in jobs:
                    if j[1] is None:
                        survivors.append(j)
                        continue
                    try:
                        extend_batch(llm, [(j[0], j[1])])
                        j[1] = None
                        survivors.append(j)
                    except KVBlocksExhausted as e2:
                        # transient — same requeue-until-deadline policy
                        # as the arm half, so momentary pressure doesn't
                        # kill a live stream that a completing request
                        # would unblock
                        if now > j[5]:
                            if not j[4].done():
                                j[4].set_exception(e2)
                        else:
                            requeue.append(j)
                    except Exception as e2:
                        if not j[4].done():
                            j[4].set_exception(e2)
                if requeue:
                    with self._cv:
                        self._suffix_jobs.extend(requeue)
                jobs = survivors
                if not jobs:
                    return
        try:
            reqs = arm_suffix_batch(
                llm, [(s, suf, sp) for s, _, suf, sp, *_ in jobs]
            )
        except Exception:
            # one stream's plan/dispatch failed the whole batch (e.g. a
            # continuation over max_blocks_per_seq raises in the plan
            # phase) — arm individually so only the offender's future
            # fails; arm_suffix_batch rolls back fully on exception, so
            # per-job retries are safe
            reqs = []
            for j in jobs:
                try:
                    reqs.extend(
                        arm_suffix_batch(llm, [(j[0], j[2], j[3])]))
                except Exception as e2:
                    if not j[4].done():
                        j[4].set_exception(e2)
                    reqs.append(False)  # consumed; do not requeue
            jobs_reqs = [(j, r) for j, r in zip(jobs, reqs) if r is not False]
            jobs = [j for j, _ in jobs_reqs]
            reqs = [r for _, r in jobs_reqs]
            if not jobs:
                return
        any_done = False
        now = time.monotonic()
        expired = []
        with self._cv:
            for job, req in zip(jobs, reqs):
                if req is None:  # no slot/blocks now
                    if now > job[5]:
                        expired.append(job)  # fail outside the lock
                    else:
                        self._suffix_jobs.append(job)  # requeue FIFO
                    continue
                self._futures[req.rid] = job[4]
                self._inflight.append(req)
                any_done = any_done or req.done
        for job in expired:
            if not job[4].done():
                job[4].set_exception(RuntimeError(
                    "PromptSession partial could not get a decode slot / "
                    f"KV blocks within {self.suffix_arm_timeout_s:.0f}s — "
                    "engine exhausted (raise num_kv_blocks/max_num_seqs "
                    "or close idle sessions)"
                ))
        if any_done:  # a first token was eos
            self._resolve_done()

    def _emit_stream_text(self) -> None:
        for req in list(self._inflight):
            entry = self._streams.get(req.rid)
            if entry is None:
                continue
            cb, detok, fed = entry
            n = len(req.out_ids)
            if n > fed[0]:
                new = detok.add(req.out_ids[fed[0]:n])
                fed[0] = n
                if new:
                    try:
                        cb(new)
                    except Exception:
                        pass
            if req.done:
                self._streams.pop(req.rid, None)

    def _resolve_done(self) -> None:
        with self._cv:
            still, done = [], []
            for req in self._inflight:
                (done if req.done else still).append(req)
            self._inflight = still
            futs = [(self._futures.pop(r.rid, None), r) for r in done]
        for fut, req in futs:
            if fut is not None and not fut.done():
                fut.set_result(req)
