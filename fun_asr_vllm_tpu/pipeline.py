"""Shared batch ASR pipeline: the reference's benchmark hot loop as a
reusable component (reference infer.py:441-501 ≡ infer_kaldidata.py:707-776,
de-duplicated here).

Per batch: fbank → encoder → adaptor → per-utt
[prefix ⧺ speech ⧺ suffix] prompt embeddings → engine generate.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .engine import LLM, SamplingParams
from .models.nano import FunASRNano

logger = logging.getLogger(__name__)

_UPLOAD_MODES = ("packed", "f32")


def _check_upload_mode(upload: str) -> None:
    """One predicate for every entry point so the wire-format convention
    can't drift between paths (packed = uint32 int16-pairs, f32 = raw)."""
    if upload not in _UPLOAD_MODES:
        raise ValueError(
            f"upload must be one of {_UPLOAD_MODES}, got {upload!r}"
        )


class BatchPipeline:
    def __init__(
        self,
        model_dir: str,
        *,
        dtype: str = "bfloat16",
        enable_engine: bool = True,
        max_num_seqs: int = 16,
        max_model_len: int = 1536,
        instruction: Optional[str] = None,
        itn: bool = True,
        language: Optional[str] = None,
        top_p: float = 0.001,
        max_tokens: int = 500,
        gpu_memory_utilization: float = 0.4,  # accepted for CLI parity
        mesh=None,
        quantize=None,
        # packed (ragged) prefill: token-exact vs padded (fuzz-tested),
        # -16% device time; the engine's packed gate falls back to the
        # padded program when constraints don't hold (mesh/lfr/non-greedy)
        packed: bool = True,
        kv_cache_dtype=None,
        vllm_model_dir: Optional[str] = None,
    ) -> None:
        self.model, self.kwargs = FunASRNano.from_pretrained(
            model=model_dir, dtype=dtype, llm_dir=vllm_model_dir
        )
        m = self.model
        if mesh is not None:
            m.shard_for_mesh(mesh)
        if enable_engine:
            m.vllm = LLM(
                params=m.llm_params, config=m.llm_cfg, tokenizer=m.tokenizer,
                dtype=dtype, max_num_seqs=max_num_seqs,
                max_model_len=max_model_len,
                gpu_memory_utilization=gpu_memory_utilization,
                mesh=mesh, quantize=quantize, packed_prefill=packed,
                kv_cache_dtype=kv_cache_dtype,
            )
            m.vllm_sampling_params = SamplingParams(
                top_p=top_p, max_tokens=max_tokens
            )
        self.sampling = SamplingParams(top_p=top_p, max_tokens=max_tokens)
        instruction = instruction or m.build_instruction(
            language=language, itn=itn
        )
        self.prefix_ids, self.suffix_ids = m.chatml_parts(instruction)
        # precompute prefix/suffix embeddings once (reference infer.py:394-404)
        self._prefix = np.asarray(m.embed_ids(self.prefix_ids))
        self._suffix = np.asarray(m.embed_ids(self.suffix_ids))
        import jax.numpy as jnp

        self._prefix_dev = jnp.asarray(self._prefix)
        self._suffix_dev = jnp.asarray(self._suffix)
        self.timings: Dict[str, float] = {"fbank": 0.0, "encode": 0.0,
                                          "generate": 0.0}

    def _prep_upload(self, wavs: Sequence[np.ndarray], upload: str = "packed"):
        """Host prep + forced upload for one batch → (device pcm,
        frame_counts, frame_plan|None). `packed` ships uint32 int16-pairs
        (half the wire bytes, lossless) and unpacks on device; device_put
        is lazy on RPC transports, so blocking here (from a prefetch
        thread) is what actually overlaps the transfer with compute.

        When the engine runs the ragged pipeline (packed_prefill) at
        lfr=1 and the batch fits one wave, samples are packed at the
        FramePack layout instead — fbank runs without padding and the
        wire carries only valid samples."""
        import jax
        from .audio.frontend import unpack_pairs_f32

        _check_upload_mode(upload)
        m = self.model
        fe = m.frontend
        llm = m.vllm
        wavs = list(wavs)
        sp = m.vllm_sampling_params or self.sampling
        if (llm is not None and getattr(llm, "packed_prefill", False)
                and llm.mesh is None and fe.lfr_m == 1 and fe.lfr_n == 1
                and m.adaptor_cfg.use_low_frame_rate
                and len(wavs) <= llm.max_num_seqs
                and sp.is_greedy):  # plan only feeds the single-shot path
            from .engine.packed import plan_frame_pack

            frames = np.asarray([fe.frame_count(len(w)) for w in wavs],
                                np.int32)
            plan = plan_frame_pack(frames, 0)
            packed = fe.batchify_sample_packed(wavs, plan.starts, plan.tt)
            dev = jax.device_put(packed)
            dev.block_until_ready()
            return dev, frames, plan
        if upload == "packed":
            packed, frames = fe.batchify_packed(wavs)
            n = fe.padded_samples(max(len(w) for w in wavs))
            dev = unpack_pairs_f32(jax.device_put(packed), n)
        else:
            pcm, frames = fe.batchify(wavs)
            dev = jax.device_put(pcm)
        dev.block_until_ready()
        return dev, frames, None

    def transcribe_many(self, batches, *, upload: str = "packed"):
        """Iterator of wav-batches → yields one list of texts per batch.

        The NEXT batch's host work (the caller's lazy audio loading via
        the iterator, batchify, upload, device unpack) runs in a worker
        thread while the current batch computes — the DataLoader-
        prefetch + async-H2D analogue of the reference hot loop
        (infer.py:406-421). Falls back to `transcribe_batch` per batch
        when the engine fast path is off."""
        m = self.model
        if m.vllm is None:
            for wavs in batches:
                yield self.transcribe_batch(wavs)
            return
        from concurrent.futures import ThreadPoolExecutor

        it = iter(batches)

        def task():
            try:
                wavs = next(it)
            except StopIteration:
                return None
            return self._prep_upload(wavs, upload)

        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(task)
            while True:
                res = fut.result()
                if res is None:
                    return
                dev, frames, plan = res
                fut = ex.submit(task)  # prep the next batch now
                t0 = time.perf_counter()
                outs = m.vllm.generate_fused(
                    dev, frames,
                    m.encoder_params, m.encoder_cfg,
                    m.adaptor_params, m.adaptor_cfg, m.frontend,
                    self._prefix_dev, self._suffix_dev,
                    m.vllm_sampling_params or self.sampling,
                    frame_plan=plan,
                )
                self.timings["generate"] += time.perf_counter() - t0
                yield [o.outputs[0].text for o in outs]

    def transcribe_all(self, batches, *, upload: str = "packed"):
        """All batches in as FEW device round trips as possible: the
        engine scans the fused program over wave-stacked inputs
        (engine.generate_fused_multi, {8,4,2,1}-wave dispatch groups),
        so an N-wave eval pays ~log(N) dispatch→fetch round trips
        instead of N. Worth it only on attaches where fetch RTT is idle
        wire time — on execution-serialized relays the per-wave path
        wins (measured; BENCH_NOTES "multi-wave single-dispatch A/B").
        Token-identical to transcribe_many (tested). Falls back to
        transcribe_many when the multi path doesn't apply (engine off,
        mesh, non-greedy). Returns one list of texts per input batch."""
        import jax

        _check_upload_mode(upload)
        m = self.model
        llm = m.vllm
        sp = m.vllm_sampling_params or self.sampling
        batches = [list(b) for b in batches]
        # the multi-wave program is the PACKED fused program end to end;
        # its frame layout hard-codes the 8x-downsample adaptor
        # (use_low_frame_rate), so any other adaptor config takes the
        # per-wave path where generate_fused's packed gate falls back to
        # the padded program (reference model.py:112-124 contract: the
        # engine must accept whatever adaptor the model dir declares)
        if (llm is None or not getattr(llm, "packed_prefill", False)
                or llm.mesh is not None or not sp.is_greedy
                or not m.adaptor_cfg.use_low_frame_rate
                or not batches):
            return list(self.transcribe_many(batches, upload=upload))
        fe = m.frontend
        bsz = min(max(len(b) for b in batches), llm.max_num_seqs)
        if bsz == 0:  # every batch empty — transcribe_many contract
            return [[] for _ in batches]
        # uniform wave size: split big batches, pad the tail of each
        # with short dummy utterances (outputs dropped)
        wave_wavs, owners = [], []  # owners[w] = (batch idx, real count)
        for bi, wavs in enumerate(batches):
            for s in range(0, len(wavs), bsz):
                chunk = wavs[s:s + bsz]
                real = len(chunk)
                chunk = chunk + [np.zeros(1600, np.float32)] * (bsz - real)
                wave_wavs.append(chunk)
                owners.append((bi, real))
        sample_packed = (fe.lfr_m == 1 and fe.lfr_n == 1
                         and m.adaptor_cfg.use_low_frame_rate)
        frames_w = [np.asarray([fe.frame_count(len(w)) for w in wavs],
                               np.int32) for wavs in wave_wavs]
        waves = []
        if sample_packed:
            from .engine.packed import plan_frame_pack

            tt = max(plan_frame_pack(fr, 0).tt for fr in frames_w)
            for wavs, fr in zip(wave_wavs, frames_w):
                plan = plan_frame_pack(fr, 0, bucket=tt)
                packed = fe.batchify_sample_packed(wavs, plan.starts,
                                                   plan.tt)
                waves.append((jax.device_put(packed), fr, plan))
        else:
            n = max(fe.padded_samples(max(len(w) for w in wavs))
                    for wavs in wave_wavs)
            # honor upload="packed" (the default): uint32 int16-pairs on
            # the wire (half the bytes — this path exists for high-RTT
            # attaches where transfer time is real), unpacked to f32 by
            # a device op before the fused program
            pack_wire = upload == "packed"
            from .audio.frontend import pack_pairs, unpack_pairs_f32

            for wavs, fr in zip(wave_wavs, frames_w):
                batch, _ = fe.batchify(wavs)
                batch = np.pad(batch, ((0, 0), (0, n - batch.shape[1])))
                if pack_wire:
                    # pack_pairs zero-pads an odd n on the wire only; the
                    # unpack slices back to the frame-bucket-aligned n
                    dev = unpack_pairs_f32(
                        jax.device_put(pack_pairs(batch)), n)
                else:
                    dev = jax.device_put(batch)
                waves.append((dev, fr, None))
        t0 = time.perf_counter()
        res = llm.generate_fused_multi(
            waves, m.encoder_params, m.encoder_cfg,
            m.adaptor_params, m.adaptor_cfg, fe,
            self._prefix_dev, self._suffix_dev, sp,
        )
        self.timings["generate"] += time.perf_counter() - t0
        texts: List[List[str]] = [[] for _ in batches]
        for (bi, real), outs in zip(owners, res):
            texts[bi].extend(o.outputs[0].text for o in outs[:real])
        return texts

    def transcribe_batch(self, wavs: Sequence[np.ndarray]) -> List[str]:
        m = self.model
        fe = m.frontend
        # LFR + CMVN run in-graph inside the fused program, so the fast
        # path handles every frontend config
        can_fuse = m.vllm is not None
        if can_fuse:
            # single-dispatch path: fbank→encoder→adaptor→prompt→prefill
            t0 = time.perf_counter()
            batch, frame_counts = fe.batchify(list(wavs))
            t1 = t2 = time.perf_counter()
            outs = m.vllm.generate_fused(
                batch, frame_counts,
                m.encoder_params, m.encoder_cfg,
                m.adaptor_params, m.adaptor_cfg, fe,
                self._prefix_dev, self._suffix_dev,
                m.vllm_sampling_params or self.sampling,
            )
            texts = [o.outputs[0].text for o in outs]
            t3 = time.perf_counter()
            self.timings["fbank"] += t1 - t0
            self.timings["encode"] += t2 - t1
            self.timings["generate"] += t3 - t2
            return texts
        t0 = time.perf_counter()
        speech, speech_lengths = m.frontend.extract(list(wavs))
        t1 = time.perf_counter()
        enc_out, enc_lens = m.audio_encoder(speech, speech_lengths)
        audio, audio_lens = m.audio_adaptor(enc_out, enc_lens)
        t2 = time.perf_counter()
        # engine-less (enable_engine=False) fallback: per-utterance
        # greedy decode — when the engine exists the fused branch above
        # always returns first
        audio_np = np.asarray(audio, dtype=np.float32)
        lens_np = np.asarray(audio_lens)
        embeds = [
            np.concatenate(
                [self._prefix, audio_np[i, : int(lens_np[i])],
                 self._suffix]
            )
            for i in range(len(wavs))
        ]
        from .models import qwen3 as qwen3_mod
        import jax.numpy as jnp

        if len(embeds) > 1:
            # batched right-padded HF-generate analogue (reference
            # infer.py:477-491: pad_sequence + attention_mask) — carries
            # the reference's padded-batch decode geometry, including its
            # short-sequence quality cost (README.md:94's 8.53% CER row)
            lens = np.asarray([e.shape[0] for e in embeds], np.int32)
            tmax = int(lens.max())
            padded = np.zeros((len(embeds), tmax, embeds[0].shape[1]),
                              np.float32)
            for i, e in enumerate(embeds):
                padded[i, : e.shape[0]] = e
            ids_list = qwen3_mod.greedy_decode_padded(
                m.llm_params, m.llm_cfg, jnp.asarray(padded),
                lens, max_new_tokens=self.sampling.max_tokens,
            )
            texts = [
                m.tokenizer.decode(ids.tolist(), skip_special_tokens=True)
                for ids in ids_list
            ]
        else:
            texts = []
            for e in embeds:
                ids = qwen3_mod.greedy_decode_simple(
                    m.llm_params, m.llm_cfg, jnp.asarray(e)[None],
                    max_new_tokens=self.sampling.max_tokens,
                )
                texts.append(
                    m.tokenizer.decode(ids.tolist(), skip_special_tokens=True)
                )
        t3 = time.perf_counter()
        self.timings["fbank"] += t1 - t0
        self.timings["encode"] += t2 - t1
        self.timings["generate"] += t3 - t2
        return texts
