"""Continuous-batching LLM engine with a vLLM-shaped `generate` surface.

Replaces `vllm.LLM(model, enable_prompt_embeds=True, ...)` +
`llm.generate([{"prompt_embeds": T×D}], SamplingParams(...))`
(reference model.py:645-653, infer.py:381-389, 468-475) with a TPU-native
engine:

- requests enter a FIFO queue; up to `max_num_seqs` run concurrently in
  fixed decode slots (continuous batching — a finished request's slot is
  refilled immediately, so long transcripts never stall the batch the way
  the reference's HF right-padded fallback does, reference infer.py:477-491);
- prompt embeddings are prefilled one sequence at a time at bucketed
  lengths (compile-once per bucket), writing the paged KV cache;
- every decode step advances all slots with one jitted program
  (engine/kv_cache.py) — the CUDA-graph analogue;
- sampling is greedy for the reference's `top_p=0.001` setting, with
  full temperature/top-p/top-k supported on-device.

Host scheduling is deliberately thin Python; all compute is jitted XLA.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections import deque
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen3 as qwen3_mod
from ..models.qwen3 import Qwen3Config
from .kv_cache import (
    _HOIST_GATHER_BYTES_CAP,
    CacheConfig,
    cache_pin_format,
    init_cache,
    step_fns,
)
from .sampling import (SamplingParams, sample_tokens,
                       sample_tokens_per_row)

logger = logging.getLogger(__name__)


class KVBlocksExhausted(RuntimeError):
    """Transient: the free-block pool is empty right now. Retryable once
    other requests complete — distinct from permanent sizing errors
    (ValueError), which callers must surface immediately."""


PREFILL_BUCKETS = (32, 64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)


def _bucket_len(t: int) -> int:
    for b in PREFILL_BUCKETS:
        if t <= b:
            return b
    return ((t + 255) // 256) * 256


@partial(jax.jit, static_argnames=("t_bucket",))
def build_prompt_embeds_device(
    prefix: jax.Array,      # [P, H]
    suffix: jax.Array,      # [Q, H]
    audio: jax.Array,       # [B, Ta, H]
    audio_lens: jax.Array,  # [B]
    t_bucket: int,
) -> Tuple[jax.Array, jax.Array]:
    """[prefix ⧺ audio[:len] ⧺ suffix] per row, assembled in-graph →
    ([B, t_bucket, H], total_lens [B]).

    The reference materializes these on the host per utterance
    (infer.py:462-466); building on device avoids shipping the audio
    embeddings host→device→host through the TPU transport."""
    b, ta, h = audio.shape
    p, q = prefix.shape[0], suffix.shape[0]
    idx = jnp.arange(t_bucket)[None, :]  # [1, TB]
    lens = audio_lens[:, None]  # [B, 1]

    prefix_g = jnp.broadcast_to(
        prefix[jnp.clip(idx[0], 0, p - 1)][None], (b, t_bucket, h)
    )
    a_idx = jnp.clip(idx - p, 0, ta - 1)  # [B?, TB] broadcasting below
    a_idx = jnp.broadcast_to(a_idx, (b, t_bucket))
    audio_g = jnp.take_along_axis(audio, a_idx[:, :, None], axis=1)
    s_idx = jnp.clip(idx - p - lens, 0, q - 1)  # [B, TB]
    suffix_g = suffix[s_idx]  # [B, TB, H]

    in_prefix = (idx < p)[:, :, None]
    in_audio = ((idx >= p) & (idx < p + lens))[:, :, None]
    in_suffix = ((idx >= p + lens) & (idx < p + lens + q))[:, :, None]
    out = jnp.where(
        in_prefix, prefix_g,
        jnp.where(in_audio, audio_g, jnp.where(in_suffix, suffix_g, 0.0)),
    )
    return out, p + audio_lens + q


def _auto_num_blocks(cfg, block_size: int, dtype: str, util: float,
                     kv_quant: bool) -> Optional[int]:
    """KV pool size that fills `util` of device memory, vLLM-style.

    Uses the runtime's memory introspection (weights are already
    resident, so bytes_in_use reflects them); returns None when the
    backend doesn't report stats (CPU, the axon relay) — callers keep
    their static floor. Leaves a 512 MB workspace margin for XLA
    temporaries on top of the utilization fraction."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats or "bytes_limit" not in stats:
        return None
    budget = int(stats["bytes_limit"] * util) - stats.get("bytes_in_use", 0)
    budget -= 512 * 1024 * 1024
    if budget <= 0:
        return None
    elem = 4 if dtype == "float32" else 2  # cache element bytes
    per_tok = cfg.num_key_value_heads * cfg.head_dim
    if kv_quant:
        # int8 q (Nkv*D bytes) + one f32 scale PER (token, head):
        # s is [L, NB, Nkv, BS, 1] f32 (kv_cache.init_cache).
        per_block_bytes = (cfg.num_hidden_layers * block_size
                           * (per_tok + cfg.num_key_value_heads * 4))
    else:
        per_block_bytes = cfg.num_hidden_layers * block_size * per_tok * elem
    per_block_bytes *= 2  # k and v
    return max(0, budget // per_block_bytes)


def _fused_block_need(cache_cfg, n: int, extra: int, plens) -> int:
    """KV blocks _admit_direct will request for a wave of `n` prompts."""
    bs = cache_cfg.block_size
    return sum(
        min(-(-(int(p) + 1 + extra) // bs), cache_cfg.max_blocks_per_seq)
        for p in plens[:n]
    )


class FusedWaveHandle:
    """An in-flight `generate_fused(..., async_result=True)` wave.

    The fused program is DISPATCHED; the host has not fetched its tokens.
    `result()` fetches + finishes the wave (and every older in-flight
    wave first — slots/blocks bookkeeping is FIFO) and returns the
    `List[RequestOutput]`. Overlapping waves need `pipeline_depth >= 2`
    on the LLM so each wave owns disjoint slots/blocks; with depth 1 the
    next generate_fused call auto-finishes this one before admitting."""

    def __init__(self, llm: "LLM", reqs, tokens, k: int, sp):
        self._llm = llm
        self._reqs = reqs
        self._tokens = tokens  # device array — fetch deferred
        self._k = k
        self._sp = sp
        self._finished = False

    def _finish(self) -> None:
        if self._finished:
            return
        self._finished = True
        self._llm._fused_inflight.remove(self)
        self._llm._finish_fused_wave(self._reqs, self._tokens, self._k,
                                     self._sp)
        self._tokens = None

    def result(self) -> "List[RequestOutput]":
        llm = self._llm
        while not self._finished:
            llm._fused_inflight[0]._finish()  # FIFO, self included
        return llm._collect(self._reqs, self._sp)


@dataclasses.dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: List[int]
    finish_reason: str = "stop"


@dataclasses.dataclass
class RequestOutput:
    request_id: int
    outputs: List[CompletionOutput]
    prompt_len: int = 0
    metrics: Optional[Dict] = None


class _Request:
    __slots__ = (
        "rid", "embeds", "prompt_len", "max_tokens", "out_ids", "slot",
        "blocks", "done", "t_enqueue", "t_first_token", "stop_ids", "sp",
        "n_session_blocks",
    )

    def __init__(self, rid: int, embeds: np.ndarray, max_tokens: int,
                 stop_ids=None, sp=None):
        self.rid = rid
        self.embeds = embeds
        self.prompt_len = embeds.shape[0]
        self.max_tokens = max_tokens
        self.out_ids: List[int] = []
        self.slot = -1
        self.blocks: List[int] = []
        self.done = False
        self.t_enqueue = time.perf_counter()
        self.t_first_token = 0.0
        self.stop_ids = stop_ids  # per-request override (async admission)
        self.sp = sp  # per-request SamplingParams (None → engine current)
        # leading req.blocks owned by a PromptSession (shared read-only,
        # NOT freed with the request) — suffix-continuation requests only
        self.n_session_blocks = 0


def _as_numpy_2d(x: Any) -> np.ndarray:
    """Accept numpy/jax/torch [T, D] prompt embeddings."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach()
        if str(getattr(x, "dtype", "")) == "torch.bfloat16":
            x = x.float()
        x = x.cpu().numpy()
    arr = np.asarray(x, dtype=np.float32)
    if arr.ndim != 2:
        raise ValueError(f"prompt_embeds must be [T, D], got {arr.shape}")
    return arr


class LLM:
    """vLLM-call-compatible engine front (reference model.py:645-653).

    Accepts either a HF model dir (`model=`) or preloaded
    (`params=`, `config=`) for tests. Extra vLLM kwargs
    (gpu_memory_utilization, compilation_config, tensor_parallel_size, ...)
    are accepted for CLI compatibility and mapped or ignored.
    """

    def __init__(
        self,
        model: Optional[str] = None,
        *,
        params: Optional[Dict] = None,
        config: Optional[Qwen3Config] = None,
        tokenizer: Any = None,
        enable_prompt_embeds: bool = True,
        dtype: str = "bfloat16",
        max_num_seqs: int = 16,
        max_model_len: int = 2048,
        num_blocks: Optional[int] = None,
        block_size: Optional[int] = None,  # None = auto by window length
        gpu_memory_utilization: float = 0.4,  # sizes the KV pool when the
        # backend reports memory stats (vLLM semantics); static floor
        # otherwise (relay/CPU report nothing)
        tensor_parallel_size: int = 1,
        compilation_config: Any = None,
        mesh: Any = None,
        use_pallas: Optional[bool] = None,
        use_pallas_burst: bool = False,
        early_exit_bursts: bool = True,
        decode_burst_size: int = 8,
        single_shot_burst_cap: int = 32,
        pipeline_depth: int = 1,
        quantize: Optional[str] = None,
        packed_prefill: bool = False,
        kv_cache_dtype: Optional[str] = None,
        pin_cache_layout: Optional[bool] = None,
        **_ignored,
    ) -> None:
        # ragged mode: generate_fused packs all valid frames/tokens along
        # one axis (engine/packed.py) instead of padding to the wave max.
        # Greedy single-shot waves only; mesh waves use the padded path.
        self.packed_prefill = packed_prefill
        self.decode_burst_size = max(1, decode_burst_size)
        # the fused single-shot program sizes its in-graph burst to cover
        # sampling_params.max_tokens (snapped to 8 to bound compile
        # variants) up to this cap: one wave = one dispatch + one fetch.
        # Beyond the cap, continuation bursts take over.
        self.single_shot_burst_cap = max(self.decode_burst_size,
                                         single_shot_burst_cap)
        # pipeline_depth=2 provisions slot/block pools for two waves so
        # generate_fused can dispatch wave i+1 before fetching wave i's
        # tokens (hides the host round trip + postproc behind device
        # compute); waves stay max_num_seqs wide
        self.pipeline_depth = max(1, pipeline_depth)
        jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                  "float16": jnp.bfloat16}[dtype]
        if params is None:
            from ..models.convert import qwen3_from_pretrained

            params, config = qwen3_from_pretrained(model, dtype=jdtype)
            if tokenizer is None:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(model)
        if config is None:
            raise ValueError("need `config` when passing preloaded params")
        if quantize == "int8":
            # weight-only int8: halves decode's HBM weight reads (the
            # measured bottleneck, BENCH_NOTES). Opt-in — quantization
            # perturbs logits, so CER impact must be validated per model.
            # Composes with mesh: shard_params places quantized leaves.
            params = qwen3_mod.quantize_params_int8(params)
        elif quantize == "int4":
            # group-wise (128) weight-only int4: 4× fewer weight bytes
            # than bf16 on the decode path. More aggressive than int8 —
            # same opt-in caveat, stronger CER validation required.
            params = qwen3_mod.quantize_params_int4(params)
        elif quantize:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.params = params
        self.cfg = config
        self.tokenizer = tokenizer
        self.max_num_seqs = max_num_seqs
        self.mesh = mesh

        if block_size is None:
            # long-context windows decode through the chunked streaming
            # kernel / per-layer gather routes, where bigger pages
            # measure ~6-9% faster at ctx 1900 (tools/bench_longctx.py
            # ladder); short windows keep 16-token pages for allocation
            # granularity (a 64-token page wastes ~30% on short prompts)
            block_size = 64 if max_model_len >= 2048 else 16
        self.n_slots = max_num_seqs * self.pipeline_depth
        mb = -(-max_model_len // block_size)
        if num_blocks is None:
            # floor: enough pages for all slots at max length, + slack +
            # the garbage block
            num_blocks = self.n_slots * mb + mb + 1
            # vLLM semantics: grow the pool to fill gpu_memory_utilization
            # of the device's memory when the runtime reports it (weights
            # are already resident, so bytes_in_use accounts for them —
            # the profile-then-size recipe). Relay/CPU backends report
            # nothing and keep the floor. Extra pages serve long-lived
            # PromptSession prompt caches (online serving), not wider
            # decode tables.
            auto = _auto_num_blocks(
                config, block_size, dtype, gpu_memory_utilization,
                kv_cache_dtype == "int8",
            )
            if auto is not None and auto > num_blocks:
                num_blocks = auto
        if kv_cache_dtype not in (None, "auto", "int8"):
            raise ValueError(f"unknown kv_cache_dtype {kv_cache_dtype!r}")
        kv_quant = kv_cache_dtype == "int8"
        self.cache_cfg = CacheConfig(
            num_blocks=num_blocks, block_size=block_size,
            max_blocks_per_seq=mb, dtype=jdtype, kv_quant=kv_quant,
        )
        self.k_cache, self.v_cache = init_cache(config, self.cache_cfg)
        self._dp = 1
        if mesh is not None:
            # tensor parallelism: Megatron shardings on the decoder params,
            # KV heads over `tp` so paged attention stays shard-local
            # (vLLM's tensor_parallel_size analogue, reference
            # infer_kaldidata.py:657); prefill batches are additionally
            # data-parallel over `dp` (see _dp_shard)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import qwen3_param_sharding, shard_params

            if config.num_key_value_heads % mesh.shape["tp"] != 0:
                raise ValueError(
                    f"num_key_value_heads {config.num_key_value_heads} not "
                    f"divisible by tp {mesh.shape['tp']}"
                )
            self.params = shard_params(
                mesh, self.params, qwen3_param_sharding(mesh)
            )
            # head-major pages [L, NB, Nkv, BS, D]: KV heads (dim 2) over tp
            kv_sharding = NamedSharding(mesh, P(None, None, "tp", None, None))
            self.k_cache = jax.device_put(self.k_cache, kv_sharding)
            self.v_cache = jax.device_put(self.v_cache, kv_sharding)
            self._dp = mesh.shape["dp"]

        # Pallas decode kernels need lane-aligned tiles: head_dim multiple
        # of 128 and a reasonable head-count tile. Tiny test models fall
        # back to the XLA gather paths.
        _dev = jax.devices()[0]
        _on_tpu = _dev.platform == "tpu" or "TPU" in getattr(
            _dev, "device_kind", ""
        )
        _kernel_shapes_ok = (
            _on_tpu
            and config.head_dim % 128 == 0
            and config.num_attention_heads >= 8
        )
        if use_pallas is None:
            use_pallas = _kernel_shapes_ok
        self.use_pallas = use_pallas
        # A/B at flagship shapes (BENCH_NOTES round 2): the XLA live-width
        # gather beats the per-(seq,page) Pallas kernel inside the burst
        # (267-280 vs 251-259 RTFx), so the burst default is XLA; the
        # kernel remains the winner for single-step decode_step
        self.use_pallas_burst = use_pallas_burst
        # long-context burst route: past ~1.5k-token windows the chunked
        # streaming kernel beats the per-layer XLA gather (29 → 22
        # ms/step at ctx 1900, BENCH_NOTES round 3); _burst_core applies
        # the window-size threshold itself. TPU single-chip with
        # kernel-friendly shapes only (the v2 kernel shares v1's
        # lane-alignment preconditions). An explicit use_pallas=False
        # opt-out disables this route too — it must be possible to run
        # with no Pallas kernels at all.
        self._chunked_burst = (
            mesh is None and _kernel_shapes_ok and self.use_pallas
        )

        # Cache device-layout pin (kv_cache.CACHE_TOKEN_MAJOR_M2M): commit
        # the pages token-major-within-page and pin every cache-touching
        # program's cache outputs to the same Format — removes the
        # whole-cache relayout copies XLA otherwise inserts at every
        # dispatch entry/exit (~2.2 ms/burst measured, BENCH_NOTES r5).
        if pin_cache_layout is None:
            itemsize = jnp.zeros((), jdtype).dtype.itemsize
            hoist_full = (2 * config.num_hidden_layers * self.n_slots
                          * self.cache_cfg.max_model_len
                          * config.num_key_value_heads * config.head_dim
                          * itemsize)
            pin_cache_layout = (
                _on_tpu and mesh is None and not kv_quant
                and not self.use_pallas_burst
                # never auto-pin a config whose bursts can route the v2
                # chunked Pallas kernel (hoist cap exceedable): Mosaic
                # wants default operand layouts, so the pin would ADD a
                # whole-cache relayout on a path that has none today
                and not (self._chunked_burst
                         and hoist_full > _HOIST_GATHER_BYTES_CAP)
            )
        self.pin_cache_layout = bool(pin_cache_layout)
        # single-step decode (the non-greedy sampling path, _decode_once)
        # defaults to the v1 Pallas kernel — but Mosaic wants default
        # operand layouts, so under the pin that kernel would re-layout
        # the whole cache INSIDE every step. Route XLA decode_step when
        # pinned (the pin's burst/prefill wins don't depend on it).
        self._decode_once_pallas = self.use_pallas and not self.pin_cache_layout
        if self.pin_cache_layout:
            if kv_quant:
                raise ValueError(
                    "pin_cache_layout composes with bf16 pages only "
                    "(int8 page/scale layout preference is unmeasured)")
            if mesh is not None:
                raise ValueError(
                    "pin_cache_layout is single-chip only (sharded caches "
                    "keep XLA-chosen layouts)")
            _fmt = cache_pin_format(self.k_cache)
            self.k_cache = jax.device_put(self.k_cache, _fmt)
            self.v_cache = jax.device_put(self.v_cache, _fmt)
            self._step_fns = step_fns(_fmt)
        else:
            self._step_fns = step_fns()

        self.eos_ids = {config.eos_token_id, config.pad_token_id}
        if tokenizer is not None and getattr(tokenizer, "eos_token_id", None):
            self.eos_ids.add(tokenizer.eos_token_id)
        # in-graph all-EOS early exit for decode bursts: stop the step
        # loop once every live slot emitted a GLOBAL eos (per-request
        # extra stop ids are handled on the host, conservatively)
        self.early_exit_bursts = early_exit_bursts
        self._eos_arr = jnp.asarray(sorted(self.eos_ids), jnp.int32)

        s, mbps = self.n_slots, self.cache_cfg.max_blocks_per_seq
        self._slots: List[Optional[_Request]] = [None] * s
        # async generate_fused waves whose token fetch is deferred (FIFO)
        self._fused_inflight: List[FusedWaveHandle] = []
        self._free_blocks = deque(range(1, num_blocks))  # block 0 = garbage
        self._block_tables = np.zeros((s, mbps), dtype=np.int32)
        self._positions = np.zeros((s,), dtype=np.int32)
        self._seq_lens = np.zeros((s,), dtype=np.int32)
        self._last_tokens = np.zeros((s,), dtype=np.int32)
        self._active = np.zeros((s,), dtype=bool)
        self._rng = jax.random.PRNGKey(0)
        self._all_greedy = True  # whether every live request is greedy
        self._next_rid = 0
        self.stats = {"prefill_tokens": 0, "decode_tokens": 0, "steps": 0,
                      "t_dispatch": 0.0, "t_fetch": 0.0}

    def reset_stats(self) -> None:
        for k in self.stats:
            self.stats[k] = 0

    # ---------------- scheduling internals ----------------

    def _dp_shard(self, arr) -> jax.Array:
        """Place a [B, ...] batch input over the mesh dp axis (replicated
        when there is no mesh or B doesn't divide)."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        arr = np.asarray(arr) if not isinstance(arr, jax.Array) else arr
        spec = (P("dp", *([None] * (arr.ndim - 1)))
                if self._dp > 1 and arr.shape[0] % self._dp == 0 else P())
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _alloc_blocks(self, n: int) -> Optional[List[int]]:
        if len(self._free_blocks) < n:
            return None
        return [self._free_blocks.popleft() for _ in range(n)]

    def _free(self, req: _Request) -> None:
        self._free_blocks.extend(req.blocks[req.n_session_blocks:])
        req.blocks = []
        s = req.slot
        if s >= 0:
            self._slots[s] = None
            self._active[s] = False
            self._block_tables[s, :] = 0
            req.slot = -1

    def _take_admissible(self, waiting) -> List[_Request]:
        """Pop every request that can get a slot + blocks right now."""
        admitted: List[_Request] = []
        while waiting:
            req = waiting[0]
            if req.done:
                waiting.popleft()
                continue
            try:
                slot = self._slots.index(None)
            except ValueError:
                break
            bs = self.cache_cfg.block_size
            limit = self.cache_cfg.max_model_len - 1
            if req.prompt_len > limit:
                # keep len(req.blocks) ≤ max_blocks_per_seq so the block
                # table row can always hold the sequence (same clamp as
                # _admit_direct); leave room for ≥1 generated token
                logger.warning(
                    "prompt length %d exceeds max_model_len %d — truncating",
                    req.prompt_len, self.cache_cfg.max_model_len,
                )
                req.embeds = req.embeds[:limit]
                req.prompt_len = limit
            if req.prompt_len + req.max_tokens > self.cache_cfg.max_model_len:
                req.max_tokens = max(
                    1, self.cache_cfg.max_model_len - req.prompt_len
                )
            blocks = self._alloc_blocks(-(-(req.prompt_len + 1) // bs))
            if blocks is None:
                break
            req.slot = slot
            req.blocks = blocks
            self._slots[slot] = req
            waiting.popleft()
            admitted.append(req)
        return admitted

    def _admit(self, waiting) -> bool:
        """Group-admit waiting requests: one batched prefill per (B, T)
        bucket (the reference captures CUDA graphs for sizes 1..B,
        infer_kaldidata.py:648-656 — here jit's cache keys on the padded
        batch/length buckets)."""
        admitted = self._take_admissible(waiting)
        if not admitted:
            return False
        mbps = self.cache_cfg.max_blocks_per_seq
        # group by prompt-length bucket
        groups: Dict[int, List[_Request]] = {}
        for req in admitted:
            groups.setdefault(_bucket_len(req.prompt_len), []).append(req)
        for tb, reqs in groups.items():
            bb = 1
            while bb < len(reqs):
                bb *= 2
            bb = min(bb, max(self.max_num_seqs, 1))
            for i in range(0, len(reqs), bb):
                chunk = reqs[i : i + bb]
                embeds = np.zeros((bb, tb, self.cfg.hidden_size), np.float32)
                lengths = np.ones((bb,), np.int32)  # dummy rows: len 1
                tables = np.zeros((bb, mbps), np.int32)
                for j, req in enumerate(chunk):
                    embeds[j, : req.prompt_len] = req.embeds
                    lengths[j] = req.prompt_len
                    tables[j, : len(req.blocks)] = req.blocks
                (logits, first_ids), self.k_cache, self.v_cache = self._step_fns.prefill_step(
                    self.params, self.cfg, self.k_cache, self.v_cache,
                    self._dp_shard(embeds), jnp.asarray(lengths),
                    jnp.asarray(tables),
                )
                if self._all_greedy:
                    firsts = np.asarray(first_ids)
                else:
                    row_sps = [
                        (chunk[j].sp or self._cur_sampling)
                        if j < len(chunk) else self._cur_sampling
                        for j in range(bb)
                    ]
                    firsts = self._sample_rows(logits, row_sps)
                now = time.perf_counter()
                for j, req in enumerate(chunk):
                    t = req.prompt_len
                    self.stats["prefill_tokens"] += t
                    req.t_first_token = now
                    slot = req.slot
                    self._block_tables[slot, :] = 0
                    self._block_tables[slot, : len(req.blocks)] = req.blocks
                    self._positions[slot] = t  # position of the NEXT token
                    self._seq_lens[slot] = t + 1
                    self._last_tokens[slot] = firsts[j]
                    self._active[slot] = True
                    self._handle_token(req, int(firsts[j]))
        return True

    def _sample(self, logits: jax.Array) -> np.ndarray:
        """Sample the decode step's [S, V] logits, slot-aligned: each
        live slot uses its request's own SamplingParams."""
        sps = [
            (r.sp or self._cur_sampling) if r is not None
            else self._cur_sampling
            for r in self._slots[: logits.shape[0]]
        ]
        return self._sample_rows(logits, sps)

    def _sample_rows(self, logits: jax.Array, sps) -> np.ndarray:
        """Row-aligned sampling: sps[j] governs logits row j. Uniform
        batches keep the per-config bucketed kernel; mixed batches run
        the compile-once vectorized per-row kernel."""
        if all(s.is_greedy for s in sps):
            return np.asarray(jnp.argmax(logits, axis=-1), dtype=np.int32)
        self._rng, sub = jax.random.split(self._rng)
        uniq = {(s.temperature, s.top_p, s.top_k) for s in sps}
        if len(uniq) == 1:
            t, tp, tk = next(iter(uniq))
            return np.asarray(sample_tokens(logits, sub, t, tp, tk))
        temps = jnp.asarray([s.temperature for s in sps], jnp.float32)
        tps = jnp.asarray([s.top_p for s in sps], jnp.float32)
        tks = jnp.asarray([s.top_k for s in sps], jnp.int32)
        return np.asarray(
            sample_tokens_per_row(logits, sub, temps, tps, tks)
        )

    def _handle_token(self, req: _Request, token: int) -> None:
        if req.stop_ids is not None:
            stop_ids = req.stop_ids
        else:
            stop_ids = self.eos_ids | set(
                self._cur_sampling.stop_token_ids or ()
            )
        stopped = token in stop_ids
        if not stopped:
            req.out_ids.append(token)
        if stopped or len(req.out_ids) >= req.max_tokens:
            req.done = True
            self._free(req)

    def _grow_blocks_if_needed(self, horizon: int = 1) -> None:
        bs = self.cache_cfg.block_size
        mbps = self.cache_cfg.max_blocks_per_seq
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            # positions [pos, pos+horizon) will be written this burst
            need = min(
                (int(self._positions[slot]) + horizon - 1) // bs + 1, mbps
            )
            while len(req.blocks) < need:
                blocks = self._alloc_blocks(1)
                if blocks is None:
                    raise RuntimeError(
                        "KV cache out of blocks — raise num_blocks/"
                        "max_model_len headroom"
                    )
                req.blocks.extend(blocks)
                self._block_tables[slot, len(req.blocks) - 1] = blocks[0]

    def _burst_table_width(self, k: int) -> int:
        """Block-table width covering every live sequence + the burst,
        snapped to 8-block buckets so jit caches a handful of widths.
        The decode gather reads the full table width per step, so shrinking
        it to the live maximum cuts HBM traffic on short sequences."""
        mbps = self.cache_cfg.max_blocks_per_seq
        bs = self.cache_cfg.block_size
        live = max(
            (int(self._seq_lens[r.slot]) for r in self._slots if r is not None),
            default=1,
        )
        need = -(-(live + k + 1) // bs)
        return min(mbps, -(-need // 8) * 8)

    def _decode_burst(self, k: int = 8) -> None:
        """k fused greedy steps in one dispatch (kv_cache.decode_steps)."""
        snapshot = list(self._slots)
        mbu = self._burst_table_width(k)
        t0 = time.perf_counter()
        tokens, self.k_cache, self.v_cache = self._step_fns.decode_steps(
            self.params, self.cfg, self.k_cache, self.v_cache,
            jnp.asarray(self._last_tokens), jnp.asarray(self._positions),
            jnp.asarray(self._block_tables[:, :mbu]),
            jnp.asarray(self._seq_lens),
            jnp.asarray(self._active), num_steps=k,
            use_pallas=self.use_pallas_burst,
            eos_ids=self._eos_arr if self.early_exit_bursts else None,
            early_exit=self.early_exit_bursts,
            chunked_kernel=self._chunked_burst,
        )
        t1 = time.perf_counter()
        self.stats["t_dispatch"] += t1 - t0
        tokens = np.asarray(tokens)  # [k, S]
        self.stats["t_fetch"] += time.perf_counter() - t1
        self.stats["steps"] += k
        for step in range(k):
            for slot, req in enumerate(snapshot):
                if req is None or req.done or not self._active[slot]:
                    # inactive: admitted for a later pipelined wave,
                    # not yet armed — its burst lanes are garbage
                    continue
                self.stats["decode_tokens"] += 1
                self._positions[slot] += 1
                self._seq_lens[slot] += 1
                self._last_tokens[slot] = tokens[step, slot]
                self._handle_token(req, int(tokens[step, slot]))

    def _decode_once(self) -> None:
        logits, self.k_cache, self.v_cache = self._step_fns.decode_step(
            self.params, self.cfg, self.k_cache, self.v_cache,
            jnp.asarray(self._last_tokens), jnp.asarray(self._positions),
            jnp.asarray(self._block_tables), jnp.asarray(self._seq_lens),
            jnp.asarray(self._active), use_pallas=self._decode_once_pallas,
            mesh=self.mesh,
        )
        tokens = self._sample(logits)
        self.stats["steps"] += 1
        for slot, req in enumerate(self._slots):
            if req is None or not self._active[slot]:
                continue
            self.stats["decode_tokens"] += 1
            self._positions[slot] += 1
            self._seq_lens[slot] += 1
            self._last_tokens[slot] = tokens[slot]
            self._handle_token(req, int(tokens[slot]))

    # ---------------- public API ----------------

    def generate(
        self,
        prompts: Union[Dict, Sequence],
        sampling_params: Union[SamplingParams, Sequence[SamplingParams],
                               None] = None,
        use_tqdm: bool = False,
        **_ignored,
    ) -> List[RequestOutput]:
        """vLLM-shaped generate: each prompt is ``{"prompt_embeds": [T,D]}``
        (or a raw [T,D] array). Returns outputs in submission order.

        `sampling_params` may be a list (one per prompt, the vLLM
        contract): per-request max_tokens / stop_token_ids AND
        distribution settings (temperature/top_p/top_k) are honored —
        mixed batches sample every slot with its own configuration in one
        vectorized step (sampling.sample_tokens_per_row); all-greedy
        batches keep the fused in-graph burst fast path."""
        if isinstance(prompts, dict) or (
            hasattr(prompts, "ndim") and getattr(prompts, "ndim", 0) == 2
        ):
            prompts = [prompts]
        if isinstance(sampling_params, (list, tuple)):
            sps = list(sampling_params)
            if len(sps) != len(prompts):
                raise ValueError(
                    f"{len(sps)} sampling_params for {len(prompts)} prompts"
                )
            sp = sps[0]
        else:
            sp = sampling_params or SamplingParams()
            sps = [sp] * len(prompts)
        self._cur_sampling = sp
        self._all_greedy = all(s.is_greedy for s in sps)

        reqs: List[_Request] = []
        for p, rsp in zip(prompts, sps):
            embeds = p["prompt_embeds"] if isinstance(p, dict) else p
            req = _Request(
                self._next_rid, _as_numpy_2d(embeds), rsp.max_tokens,
                stop_ids=(self.eos_ids | set(rsp.stop_token_ids or ())
                          if rsp is not sp or rsp.stop_token_ids else None),
                sp=rsp,
            )
            self._next_rid += 1
            reqs.append(req)

        waiting = deque(reqs)
        return self._run(reqs, waiting, sp, use_tqdm)

    def _new_request(self, prompt_len: int, sp: SamplingParams) -> _Request:
        """Build a _Request with no slot/blocks yet (slot=-1, blocks=[]).

        The single construction point for every fast path — _admit_direct
        assigns slot/blocks afterwards; generate_fused_multi keeps the
        slotless form (its KV pages belong to per-group anchor requests)."""
        req = _Request.__new__(_Request)
        req.rid = self._next_rid
        self._next_rid += 1
        req.embeds = None
        req.prompt_len = int(prompt_len)
        req.max_tokens = min(
            sp.max_tokens,
            max(1, self.cache_cfg.max_model_len - req.prompt_len),
        )
        req.out_ids = []
        req.done = False
        req.t_enqueue = time.perf_counter()
        req.t_first_token = 0.0
        # pinned per request: an async wave may finish AFTER a later
        # generate_fused call overwrote self._cur_sampling
        req.stop_ids = self.eos_ids | set(sp.stop_token_ids or ())
        req.sp = None
        req.n_session_blocks = 0
        req.slot = -1
        req.blocks = []
        return req

    def _admit_direct(self, prompt_lens: np.ndarray, sp: SamplingParams,
                      extra: int = 0):
        """Allocate slots/blocks for a wave of known prompt lengths →
        (reqs, block tables [n, MB]). `extra` pre-allocates decode
        positions (single-shot programs write K steps ahead). Shared by
        the device fast paths."""
        bs = self.cache_cfg.block_size
        mbps = self.cache_cfg.max_blocks_per_seq
        reqs: List[_Request] = []
        tables = np.zeros((len(prompt_lens), mbps), np.int32)
        for j, plen in enumerate(prompt_lens):
            req = self._new_request(int(plen), sp)
            slot = self._slots.index(None)
            need = min(-(-(req.prompt_len + 1 + extra) // bs),
                       self.cache_cfg.max_blocks_per_seq)
            blocks = self._alloc_blocks(need)
            if blocks is None:
                raise RuntimeError("KV cache out of blocks")
            req.slot = slot
            req.blocks = blocks
            self._slots[slot] = req
            tables[j, : len(blocks)] = blocks
            reqs.append(req)
        return reqs, tables

    def _post_prefill(self, reqs: List[_Request], logits: jax.Array,
                      first_ids=None) -> None:
        """Sample first tokens and arm the decode slots after a prefill."""
        # fast-path waves are uniform-sp; rows align to `reqs`, not slots
        firsts = (np.asarray(first_ids)
                  if first_ids is not None and self._cur_sampling.is_greedy
                  else self._sample_rows(
                      logits, [self._cur_sampling] * logits.shape[0]))
        now = time.perf_counter()
        for j, req in enumerate(reqs):
            t = req.prompt_len
            self.stats["prefill_tokens"] += t
            req.t_first_token = now
            slot = req.slot
            self._block_tables[slot, :] = 0
            self._block_tables[slot, : len(req.blocks)] = req.blocks
            self._positions[slot] = t
            self._seq_lens[slot] = t + 1
            self._last_tokens[slot] = firsts[j]
            self._active[slot] = True
            self._handle_token(req, int(firsts[j]))

    def generate_from_audio(
        self,
        audio_embeds: jax.Array,   # [B, Ta, H] on device
        audio_lens: jax.Array,     # [B]
        prefix_embeds: jax.Array,  # [P, H]
        suffix_embeds: jax.Array,  # [Q, H]
        sampling_params: Optional[SamplingParams] = None,
        use_tqdm: bool = False,
    ) -> List[RequestOutput]:
        """Device-resident fast path: prompt embeddings are assembled
        in-graph from adaptor output + fixed ChatML prefix/suffix and fed
        straight into prefill — the audio tokens never cross the host
        boundary. Processes in waves of max_num_seqs."""
        sp = sampling_params or SamplingParams()
        self._cur_sampling = sp
        self._all_greedy = sp.is_greedy
        lens_np = np.asarray(audio_lens, dtype=np.int64)
        b = int(audio_embeds.shape[0])
        p, q = prefix_embeds.shape[0], suffix_embeds.shape[0]
        all_reqs: List[_Request] = []
        for start in range(0, b, self.max_num_seqs):
            stop = min(start + self.max_num_seqs, b)
            tb = _bucket_len(p + int(lens_np[start:stop].max()) + q)
            embeds, total_lens = build_prompt_embeds_device(
                prefix_embeds, suffix_embeds, audio_embeds[start:stop],
                jnp.asarray(audio_lens[start:stop]), t_bucket=tb,
            )
            total_np = np.asarray(total_lens, dtype=np.int64)
            reqs, tables = self._admit_direct(total_np, sp)
            (logits, first_ids), self.k_cache, self.v_cache = self._step_fns.prefill_step(
                self.params, self.cfg, self.k_cache, self.v_cache,
                embeds, jnp.asarray(total_np.astype(np.int32)),
                jnp.asarray(tables),
            )
            self._post_prefill(reqs, logits, first_ids)
            self._run(reqs, deque(), sp, use_tqdm=False)
            all_reqs.extend(reqs)
        return self._collect(all_reqs, sp)

    def generate_fused(
        self,
        speech: np.ndarray,        # [B, N_pad] float32, int16 scale
        wav_frames: np.ndarray,    # [B] fbank frame counts
        enc_params, enc_cfg, ad_params, ad_cfg,
        frontend,                   # WavFrontend (fbank static config)
        prefix_embeds: jax.Array,  # [P, H]
        suffix_embeds: jax.Array,  # [Q, H]
        sampling_params: Optional[SamplingParams] = None,
        frame_plan=None,  # FramePack for sample-level ragged uploads
        async_result: bool = False,
    ) -> List[RequestOutput]:
        """Whole-batch fast path: ONE dispatch runs fbank → encoder →
        adaptor → prompt assembly → prefill (engine/fused.py), then fused
        decode bursts. Prompt lengths come from the deterministic frame
        math so block allocation happens before the dispatch.

        With `frame_plan` (packed_prefill only, one wave, lfr off),
        `speech` is ONE sample-level packed row laid out in the plan's
        frame geometry (frontend.batchify_sample_packed) — fbank runs
        without padding and the upload carries only valid samples.

        With `async_result=True` (single wave, greedy) the call returns a
        `FusedWaveHandle` right after the dispatch, WITHOUT fetching the
        tokens: the caller can dispatch the next wave before `.result()`,
        hiding the fetch round trip behind device compute. Overlap needs
        `pipeline_depth >= 2` (disjoint slot/block pools per wave); with
        depth 1 the next call auto-finishes the outstanding handle."""
        from ..models.adaptor import downsampled_length

        sp = sampling_params or SamplingParams()
        self._cur_sampling = sp
        self._all_greedy = sp.is_greedy
        p, q = prefix_embeds.shape[0], suffix_embeds.shape[0]
        # with a sample-packed row, speech is [1, NS] — the true batch
        # size is the number of frame counts
        b = len(wav_frames)
        # size the in-program burst to COVER the token budget (snapped to
        # 8 to bound recompiles and keep sublane-friendly ring shapes),
        # capped at single_shot_burst_cap: a burst that falls short of
        # max_tokens forces a full continuation burst + an extra host
        # round trip for a handful of tokens (measured: 16-step burst +
        # RTT to produce 2-3 remaining tokens). Early-exit bursts make
        # the overshoot cheap with real weights.
        # the prefill emits the first token, so the burst needs
        # max_tokens - 1 further steps
        k = max(8, -(-min(sp.max_tokens - 1, self.single_shot_burst_cap)
                     // 8) * 8)
        single_shot = sp.is_greedy
        all_reqs: List[_Request] = []
        fe_kw = dict(
            frame_length=frontend._frame_len_samp,
            frame_shift=frontend._frame_shift_samp,
            n_mels=frontend.n_mels, window_type=frontend.window,
            fs=frontend.fs, lfr_m=frontend.lfr_m, lfr_n=frontend.lfr_n,
            cmvn=frontend.cmvn_dev(),
        )
        # LFR stacking shortens the feature sequence (frontend.extract
        # semantics): the encoder sees ceil(frames / lfr_n) frames
        lfr_n = frontend.lfr_n
        # validate EVERY prompt before any wave dispatches — a mid-loop
        # failure would leak already-admitted waves' slots/blocks and
        # drop completed waves' results
        all_plens = [
            p + downsampled_length(-(-int(f) // lfr_n)) + q
            for f in wav_frames
        ]
        if max(all_plens) + 1 > self.cache_cfg.max_model_len:
            # explicit rejection beats silently clamping audio tokens
            # (vLLM also rejects prompts over max_model_len)
            raise ValueError(
                f"prompt length {max(all_plens)} (+1 decode slot) exceeds "
                f"max_model_len {self.cache_cfg.max_model_len} — raise "
                "max_model_len or shorten/segment the audio"
            )
        # packed mode assumptions: single chip, 8× downsampling adaptor
        packed_ok = (self.packed_prefill and self.mesh is None
                     and ad_cfg.use_low_frame_rate)
        sample_packed = (frame_plan is not None and packed_ok
                         and lfr_n == 1 and frontend.lfr_m == 1
                         and b <= self.max_num_seqs and sp.is_greedy)
        if frame_plan is not None and not sample_packed:
            # a [1, NS] packed row misparses as a padded batch on any
            # other path — refuse loudly rather than decode garbage
            raise ValueError(
                "frame_plan requires packed_prefill, greedy sampling, "
                "lfr off and a single wave (batch <= max_num_seqs)"
            )
        if async_result and (b > self.max_num_seqs or not single_shot):
            raise ValueError(
                "async_result requires a single wave (batch <= "
                "max_num_seqs) and greedy sampling (the single-shot "
                "fused program)"
            )
        pending = None  # (reqs, tokens device array) awaiting host fetch
        for start in range(0, b, self.max_num_seqs):
            stop = min(start + self.max_num_seqs, b)
            # an older async wave may still hold its slots — finish it
            # (FIFO) when this wave wouldn't fit; with pipeline_depth >= 2
            # the pools are sized so overlapping waves coexist
            while self._fused_inflight and (
                self._slots.count(None) < stop - start
                or len(self._free_blocks) < _fused_block_need(
                    self.cache_cfg, stop - start, k if single_shot else 0,
                    all_plens[start:stop])
            ):
                self._fused_inflight[0]._finish()
            frames = np.asarray(
                [-(-int(f) // lfr_n) for f in wav_frames[start:stop]],
                np.int32,
            )
            if lfr_n != 1 or frontend.lfr_m != 1:
                # LFR tail groups must replicate each row's last VALID
                # frame, not the batch padding (frontend._lfr_jax)
                fe_kw["pre_lfr_frames"] = jnp.asarray(
                    np.asarray(wav_frames[start:stop], np.int32)
                )
            prompt_lens = np.array(
                [p + downsampled_length(int(f)) + q for f in frames], np.int64
            )
            tb = _bucket_len(int(prompt_lens.max()))
            reqs, tables = self._admit_direct(
                prompt_lens, sp, extra=k if single_shot else 0
            )
            if single_shot:
                # ONE dispatch: encode + prefill + K greedy decode steps;
                # the block table is sliced to the live width (the decode
                # gather reads the full table per step)
                bs_blk = self.cache_cfg.block_size
                need = -(-(int(prompt_lens.max()) + k + 1) // bs_blk)
                mbu = min(self.cache_cfg.max_blocks_per_seq,
                          -(-need // 8) * 8)
                t0 = time.perf_counter()
                if packed_ok:
                    from .packed import (
                        PROMPT_ONESHOT_MAX_ROWS,
                        plan_frame_pack,
                        plan_prompt_pack,
                    )

                    if sample_packed:
                        fp = frame_plan
                        speech_arg = speech  # [1, NS(/2)] packed row
                    else:
                        n_samples = speech.shape[1]
                        if speech.dtype == np.uint32:
                            # bit-packed int16 pairs: half the columns
                            n_samples *= 2
                        t_pad_feat = frontend.frame_count(n_samples)
                        if lfr_n != 1:
                            t_pad_feat = -(-t_pad_feat // lfr_n)
                        fp = plan_frame_pack(frames, t_pad_feat)
                        speech_arg = speech[start:stop]
                    ppk = plan_prompt_pack(
                        p, q, fp.tok_starts, fp.tok_counts, tables, bs_blk
                    )
                    tokens, self.k_cache, self.v_cache = (
                        self._step_fns.fused_encode_prefill_decode_packed(
                            enc_params, ad_params, self.params,
                            enc_cfg, ad_cfg, self.cfg,
                            self.k_cache, self.v_cache,
                            speech_arg,
                            jnp.asarray(fp.src_idx),
                            jnp.asarray(fp.seg_ids),
                            jnp.asarray(fp.pos_ids),
                            jnp.asarray(fp.m1), jnp.asarray(fp.m2),
                            jnp.asarray(ppk.emb_src),
                            jnp.asarray(ppk.seg_ids),
                            jnp.asarray(ppk.pos_ids),
                            jnp.asarray(ppk.write_blocks),
                            jnp.asarray(ppk.write_offsets),
                            jnp.asarray(ppk.last_idx),
                            prefix_embeds, suffix_embeds,
                            jnp.asarray(prompt_lens.astype(np.int32)),
                            jnp.asarray(tables[:, :mbu]),
                            num_steps=k, use_pallas=self.use_pallas_burst,
                            chunked_kernel=self._chunked_burst,
                            eos_ids=(self._eos_arr if self.early_exit_bursts
                                     else None),
                            early_exit=self.early_exit_bursts,
                            frame_k_window=fp.k_window,
                            frame_k_window_rows=fp.k_window_rows,
                            prompt_k_window=ppk.k_window,
                            # one-shot for narrow windows (short-utterance
                            # mixes: 55.9 vs 84.2 ms prefill28), online
                            # for wide ones (long prompts: 322 vs 518 ms)
                            # — measured crossover in packed.py's
                            # PROMPT_ONESHOT_MAX_ROWS note
                            prompt_k_window_rows=(
                                ppk.k_window_rows
                                if ppk.k_window_rows
                                <= PROMPT_ONESHOT_MAX_ROWS else 0),
                            sample_packed=sample_packed,
                            **fe_kw,
                        )
                    )
                else:
                    tokens, self.k_cache, self.v_cache = self._step_fns.fused_encode_prefill_decode(
                        enc_params, ad_params, self.params,
                        enc_cfg, ad_cfg, self.cfg,
                        self.k_cache, self.v_cache,
                        self._dp_shard(speech[start:stop]), jnp.asarray(frames),
                        prefix_embeds, suffix_embeds,
                        jnp.asarray(prompt_lens.astype(np.int32)),
                        jnp.asarray(tables[:, :mbu]),
                        t_bucket=tb, num_steps=k, use_pallas=self.use_pallas_burst,
                        chunked_kernel=self._chunked_burst,
                        eos_ids=(self._eos_arr if self.early_exit_bursts
                                 else None),
                        early_exit=self.early_exit_bursts,
                        **fe_kw,
                    )
                self.stats["t_dispatch"] += time.perf_counter() - t0
                if async_result:
                    # single wave (validated above): hand the un-fetched
                    # tokens back so the caller can dispatch the next
                    # wave before paying this one's fetch
                    h = FusedWaveHandle(self, reqs, tokens, k, sp)
                    self._fused_inflight.append(h)
                    return h
                # the dispatch above is async — with pipeline_depth ≥ 2
                # (disjoint slots/blocks for two waves) process the
                # PREVIOUS wave's tokens while this one computes
                if pending is not None:
                    prev_reqs, prev_tokens = pending
                    self._finish_fused_wave(prev_reqs, prev_tokens, k, sp)
                    all_reqs.extend(prev_reqs)
                    pending = None
                if self.pipeline_depth >= 2 and stop < b:
                    pending = (reqs, tokens)
                else:
                    self._finish_fused_wave(reqs, tokens, k, sp)
                    all_reqs.extend(reqs)
            else:
                (logits, first_ids), self.k_cache, self.v_cache = (
                    self._step_fns.fused_encode_prefill(
                        enc_params, ad_params, self.params,
                        enc_cfg, ad_cfg, self.cfg,
                        self.k_cache, self.v_cache,
                        self._dp_shard(speech[start:stop]), jnp.asarray(frames),
                        prefix_embeds, suffix_embeds,
                        jnp.asarray(prompt_lens.astype(np.int32)),
                        jnp.asarray(tables),
                        t_bucket=tb, **fe_kw,
                    )
                )
                self._post_prefill(reqs, logits, first_ids)
                self._run(reqs, deque(), sp, use_tqdm=False)
                all_reqs.extend(reqs)
        if pending is not None:
            prev_reqs, prev_tokens = pending
            self._finish_fused_wave(prev_reqs, prev_tokens, k, sp)
            all_reqs.extend(prev_reqs)
        return self._collect(all_reqs, sp)

    def generate_fused_multi(
        self,
        waves,                     # list of (speech_dev, wav_frames, plan)
        enc_params, enc_cfg, ad_params, ad_cfg,
        frontend,
        prefix_embeds: jax.Array,  # [P, H]
        suffix_embeds: jax.Array,  # [Q, H]
        sampling_params=None,  # SamplingParams or one per wave
    ) -> List[List[RequestOutput]]:
        """Whole-dataset fast path: MANY waves per dispatch.

        On RPC-attached TPUs each dispatch→fetch round trip costs
        ~0.1-0.2 s; a per-wave loop pays it per batch. This path scans
        the packed fused program over wave-stacked inputs on device
        (engine/packed.py `fused_encode_prefill_decode_packed_multi`),
        grouping waves into {8, 4, 2, 1}-sized dispatches to bound
        compile variants — the whole eval becomes a handful of round
        trips. Wave i+1's prefill REUSES wave i's KV pages, so the
        in-shot burst is sized to cover sampling_params.max_tokens
        outright (early-exit keeps the tail cheap) — continuation
        bursts are impossible once pages are overwritten.

        Requirements (ValueError otherwise): packed_prefill engine on a
        single chip, greedy sampling, every wave the same batch size
        (pad the tail wave with dummy short utterances and drop their
        outputs), and either every wave carries a `frame_plan` built at
        a COMMON tt (sample-level packed rows, lfr off) or none does
        (padded [B, N] uploads sharing one N).

        → one List[RequestOutput] per wave, in submission order."""
        from .packed import (
            PROMPT_ONESHOT_MAX_ROWS,
            plan_frame_pack,
            plan_prompt_pack,
        )
        from ..models.adaptor import downsampled_length

        if not waves:
            return []
        if isinstance(sampling_params, (list, tuple)):
            if len(sampling_params) != len(waves):
                raise ValueError("need one SamplingParams per wave")
            sps = list(sampling_params)
        else:
            sps = [sampling_params or SamplingParams()] * len(waves)
        if not all(s.is_greedy for s in sps):
            raise ValueError("generate_fused_multi is greedy-only (the "
                             "single-shot fused program)")
        if self.mesh is not None or not self.packed_prefill:
            raise ValueError("generate_fused_multi needs packed_prefill "
                             "on a single chip")
        if not ad_cfg.use_low_frame_rate:
            # the packed frame layout hard-codes the 8x-downsample token
            # placement (packed.plan_frame_pack tok_starts = start//8);
            # callers must take the per-wave generate_fused path, whose
            # packed gate falls back to the padded program
            raise ValueError(
                "generate_fused_multi requires an use_low_frame_rate "
                "adaptor — use generate_fused per wave for this config"
            )
        sp = sps[0]
        self._cur_sampling = sp
        self._all_greedy = True
        p, q = prefix_embeds.shape[0], suffix_embeds.shape[0]
        lfr_n, lfr_m = frontend.lfr_n, frontend.lfr_m
        bsz = len(waves[0][1])
        if any(len(w[1]) != bsz for w in waves) or bsz > self.max_num_seqs:
            raise ValueError("all waves must share one batch size ≤ "
                             "max_num_seqs (pad the tail wave)")
        plans = [w[2] for w in waves]
        sample_packed = plans[0] is not None
        if any((pl is not None) != sample_packed for pl in plans):
            raise ValueError("frame plans must be all-or-none across waves")
        if sample_packed and (lfr_n != 1 or lfr_m != 1):
            raise ValueError("sample-packed waves require lfr off")
        if sample_packed and len({pl.tt for pl in plans}) > 1:
            raise ValueError("frame plans must share a common tt "
                             "(plan_frame_pack(bucket=max_tt))")
        # the burst must COVER each wave's max_tokens: later waves
        # overwrite the KV pages, so there is no continuation path (the
        # prefill emits token 0). Per-wave bursts are sized per dispatch
        # GROUP (groups are duration-adjacent under sorted scheduling,
        # so a long wave doesn't inflate every group's burst)
        k_w = [max(8, -(-(s.max_tokens - 1) // 8) * 8) for s in sps]
        k = max(k_w)
        fe_kw = dict(
            frame_length=frontend._frame_len_samp,
            frame_shift=frontend._frame_shift_samp,
            n_mels=frontend.n_mels, window_type=frontend.window,
            fs=frontend.fs, lfr_m=lfr_m, lfr_n=lfr_n,
            cmvn=frontend.cmvn_dev(),
        )
        # frame math → per-wave prompt lengths; validate before admitting
        frames_w, plens_w = [], []
        for speech, wav_frames, plan in waves:
            fr = np.asarray([-(-int(f) // lfr_n) for f in wav_frames],
                            np.int32)
            frames_w.append(fr)
            plens_w.append(np.asarray(
                [p + downsampled_length(int(f)) + q for f in fr], np.int64))
        max_plens = np.max(np.stack(plens_w), axis=0)
        if int(max_plens.max()) + 1 + k > self.cache_cfg.max_model_len:
            raise ValueError(
                f"prompt {int(max_plens.max())} + burst {k} + 1 exceeds "
                f"max_model_len {self.cache_cfg.max_model_len} — raise "
                "max_model_len or lower max_tokens")
        # an outstanding async wave still owns slots/pages — finish it
        while self._fused_inflight:
            self._fused_inflight[0]._finish()
        # ONE page allocation serves every wave (device-sequential reuse);
        # per-slot tables sized for the largest prompt at that slot
        anchor_reqs, tables = self._admit_direct(max_plens, sp, extra=k)
        bs_blk = self.cache_cfg.block_size
        need = -(-(int(max_plens.max()) + k + 1) // bs_blk)
        mbu = min(self.cache_cfg.max_blocks_per_seq, -(-need // 8) * 8)
        tables_dev = jnp.asarray(tables[:, :mbu])
        try:
            if not sample_packed:
                ns = {w[0].shape[-1] for w in waves}
                if len(ns) > 1:
                    raise ValueError("padded waves must share one padded "
                                     "sample count (repad to the max)")
            # common packed-layout buckets across ALL waves
            if sample_packed:
                fps = plans
            else:
                n_samples = waves[0][0].shape[-1]
                if waves[0][0].dtype == jnp.uint32:
                    n_samples *= 2
                t_pad_feat = frontend.frame_count(n_samples)
                if lfr_n != 1:
                    t_pad_feat = -(-t_pad_feat // lfr_n)
                fps = [plan_frame_pack(fr, t_pad_feat) for fr in frames_w]
                tt = max(fp.tt for fp in fps)
                fps = [fp if fp.tt == tt
                       else plan_frame_pack(fr, t_pad_feat, bucket=tt)
                       for fp, fr in zip(fps, frames_w)]
            ppks = [plan_prompt_pack(p, q, fp.tok_starts, fp.tok_counts,
                                     tables, bs_blk) for fp in fps]
            ttp = max(pk.ttp for pk in ppks)
            ppks = [pk if pk.ttp == ttp
                    else plan_prompt_pack(p, q, fp.tok_starts,
                                          fp.tok_counts, tables, bs_blk,
                                          bucket=ttp)
                    for pk, fp in zip(ppks, fps)]
            fkw = max(fp.k_window for fp in fps)
            fkwr = max(fp.k_window_rows for fp in fps)
            pkw = max(pk.k_window for pk in ppks)
            # narrow windows: one-shot kernel; wide: online (measured
            # crossover — packed.py PROMPT_ONESHOT_MAX_ROWS note)
            pkwr = max(pk.k_window_rows for pk in ppks)
            if pkwr > PROMPT_ONESHOT_MAX_ROWS:
                pkwr = 0

            # group waves into descending power-of-two dispatches so jit
            # compiles at most log2 scan lengths per geometry
            order = list(range(len(waves)))
            groups, i = [], 0
            while i < len(order):
                g = 8
                while g > len(order) - i:
                    g //= 2
                groups.append(order[i:i + g])
                i += g
            handles = []  # (wave indices, k_g, device tokens)
            t0 = time.perf_counter()
            for g in groups:
                k_g = max(k_w[i] for i in g)
                stk = lambda f: jnp.asarray(np.stack([f(i) for i in g]))
                speech_g = jnp.stack([
                    waves[i][0][0] if sample_packed else waves[i][0]
                    for i in g])
                kwargs = {}
                if lfr_n != 1 or lfr_m != 1:
                    kwargs["pre_lfr_frames"] = stk(
                        lambda i: np.asarray(waves[i][1], np.int32))
                tokens, self.k_cache, self.v_cache = (
                    self._step_fns.fused_encode_prefill_decode_packed_multi(
                        enc_params, ad_params, self.params,
                        enc_cfg, ad_cfg, self.cfg,
                        self.k_cache, self.v_cache,
                        speech_g,
                        stk(lambda i: fps[i].src_idx),
                        stk(lambda i: fps[i].seg_ids),
                        stk(lambda i: fps[i].pos_ids),
                        stk(lambda i: fps[i].m1),
                        stk(lambda i: fps[i].m2),
                        stk(lambda i: ppks[i].emb_src),
                        stk(lambda i: ppks[i].seg_ids),
                        stk(lambda i: ppks[i].pos_ids),
                        stk(lambda i: ppks[i].write_blocks),
                        stk(lambda i: ppks[i].write_offsets),
                        stk(lambda i: ppks[i].last_idx),
                        prefix_embeds, suffix_embeds,
                        stk(lambda i: plens_w[i].astype(np.int32)),
                        tables_dev,
                        num_steps=k_g, use_pallas=self.use_pallas_burst,
                        chunked_kernel=self._chunked_burst,
                        eos_ids=(self._eos_arr if self.early_exit_bursts
                                 else None),
                        early_exit=self.early_exit_bursts,
                        frame_k_window=fkw, frame_k_window_rows=fkwr,
                        prompt_k_window=pkw, prompt_k_window_rows=pkwr,
                        sample_packed=sample_packed,
                        **fe_kw, **kwargs,
                    )
                )
                handles.append((g, k_g, tokens))
            self.stats["t_dispatch"] += time.perf_counter() - t0
            # ONE fetch per group (the RTT count is per GROUP, not per
            # wave)
            results: List[Optional[List[RequestOutput]]] = (
                [None] * len(waves))
            for g, k_g, tokens in handles:
                t0 = time.perf_counter()
                toks_np = np.asarray(tokens)  # [Wg, k_g+1, B]
                now = time.perf_counter()
                self.stats["t_fetch"] += now - t0
                for row, wi in enumerate(g):
                    sp_w = sps[wi]
                    self.stats["steps"] += k_g
                    reqs = []
                    for j in range(bsz):
                        req = self._new_request(int(plens_w[wi][j]), sp_w)
                        req.t_enqueue = now
                        req.t_first_token = now
                        self.stats["prefill_tokens"] += req.prompt_len
                        for step in range(toks_np.shape[1]):
                            if req.done:
                                break
                            if step > 0:
                                self.stats["decode_tokens"] += 1
                            self._handle_token(
                                req, int(toks_np[row, step, j]))
                        reqs.append(req)
                    results[wi] = self._collect(reqs, sp_w)
        finally:
            for r in anchor_reqs:
                if r.blocks:
                    self._free(r)
        return results

    def _finish_fused_wave(self, reqs, tokens, k: int, sp) -> None:
        """Fetch a fused wave's tokens, arm its slots, run continuations."""
        t0 = time.perf_counter()
        tokens = np.asarray(tokens)  # [K+1, B] — blocks until ready
        now = time.perf_counter()
        self.stats["t_fetch"] += now - t0
        self.stats["steps"] += k
        for j, req in enumerate(reqs):
            slot = req.slot
            self.stats["prefill_tokens"] += req.prompt_len
            req.t_first_token = now
            self._block_tables[slot, :] = 0
            self._block_tables[slot, : len(req.blocks)] = req.blocks
            self._positions[slot] = req.prompt_len
            self._seq_lens[slot] = req.prompt_len + 1
            self._active[slot] = True
        for step in range(k + 1):
            for j, req in enumerate(reqs):
                if req.done:
                    continue
                slot = req.slot
                if step > 0:
                    self.stats["decode_tokens"] += 1
                    self._positions[slot] += 1
                    self._seq_lens[slot] += 1
                self._last_tokens[slot] = tokens[step, j]
                self._handle_token(req, int(tokens[step, j]))
        self._run(reqs, deque(), sp, use_tqdm=False)

    def _run(self, reqs, waiting, sp, use_tqdm: bool):
        iterator = None
        if use_tqdm:
            try:
                from tqdm import tqdm

                iterator = tqdm(total=len(reqs), desc="generate")
            except ImportError:
                pass
        done_count = 0
        while done_count < len(reqs):
            self._admit(waiting)
            if any(r is not None for r in self._slots):
                if self._all_greedy:
                    # burst size snapped to 8 and capped at
                    # decode_burst_size (≤ decode_burst_size/8 compiled
                    # variants): a continuation for 2-3 remaining tokens
                    # shouldn't run a full fixed-K burst
                    rem = max(
                        (r.max_tokens - len(r.out_ids)
                         for r in self._slots if r is not None and not r.done),
                        default=self.decode_burst_size,
                    )
                    k = max(8, min(self.decode_burst_size,
                                   -(-rem // 8) * 8))
                    self._grow_blocks_if_needed(horizon=k)
                    self._decode_burst(k)
                else:
                    self._grow_blocks_if_needed()
                    self._decode_once()
            new_done = sum(r.done for r in reqs)
            if iterator is not None and new_done > done_count:
                iterator.update(new_done - done_count)
            done_count = new_done
        if iterator is not None:
            iterator.close()
        return self._collect(reqs, sp)

    def _collect(self, reqs, sp) -> List[RequestOutput]:
        outs = []
        now = time.perf_counter()
        for req in reqs:
            text = ""
            if self.tokenizer is not None:
                text = self.tokenizer.decode(
                    req.out_ids, skip_special_tokens=sp.skip_special_tokens
                )
            outs.append(
                RequestOutput(
                    request_id=req.rid,
                    outputs=[CompletionOutput(0, text, list(req.out_ids))],
                    prompt_len=req.prompt_len,
                    metrics={
                        # vLLM-style request metrics (seconds)
                        "time_to_first_token": (
                            req.t_first_token - req.t_enqueue
                            if req.t_first_token else None
                        ),
                        "latency": now - req.t_enqueue,
                        "num_generated_tokens": len(req.out_ids),
                    },
                )
            )
        return outs


@partial(jax.jit, donate_argnames=("cache",))
def _copy_blocks(cache, srcs: jax.Array, dsts: jax.Array):
    """Copy KV pages in one dispatch across all layers (boundary-block
    isolation for batched suffix arming). Handles int8-paged pytree
    caches; single copies pass singleton index arrays."""
    if isinstance(cache, dict):
        return {k: v.at[:, dsts].set(v[:, srcs]) for k, v in cache.items()}
    return cache.at[:, dsts].set(cache[:, srcs])


class PromptSession:
    """Append-only cached prompt over the engine's paged KV cache
    (chunked/incremental prefill — the vLLM prefix-caching analogue).

    Use case: online serving, where the prompt is
    [prefix ⧺ growing audio tokens ⧺ suffix] and every partial decode
    previously re-prefilled the whole prompt. A session extends the
    cached [prefix ⧺ audio] region with only the NEW tokens
    (kv_cache.extend_step), then `decode_with_suffix` prefills just the
    suffix into scratch blocks and decodes — the session's cached blocks
    are never written (the partially-filled boundary block is copied
    into scratch first).

    NOT thread-safe with the engine's other entry points; callers
    serialize (AsyncLLM.exclusive() when a stepper owns the engine).
    """

    def __init__(self, llm: "LLM") -> None:
        self.llm = llm
        self.blocks: List[int] = []
        self.cached_len = 0

    # -------------------------------------------------------------- internals

    def _ensure_blocks(self, upto_tokens: int) -> None:
        bs = self.llm.cache_cfg.block_size
        need = -(-upto_tokens // bs)
        while len(self.blocks) < need:
            got = self.llm._alloc_blocks(1)
            if got is None:
                raise KVBlocksExhausted(
                    "KV cache out of blocks (PromptSession)")
            self.blocks.extend(got)

    # ----------------------------------------------------------------- API

    def extend(self, embeds: np.ndarray) -> None:
        """Append token embeddings [T, H] to the cached prompt."""
        extend_batch(self.llm, [(self, embeds)])

    def decode_with_suffix(
        self,
        suffix_embeds: np.ndarray,
        sampling_params: Optional[SamplingParams] = None,
    ) -> List[int]:
        """Prefill [suffix] after the cached prompt into scratch blocks,
        decode up to max_tokens, free the scratch — the cached prompt
        survives unchanged for the next partial.

        Synchronous single-job convenience: arms via the same
        `arm_suffix_batch` machinery the AsyncLLM stepper batches over
        (one copy of the scratch/boundary block accounting), then drives
        the engine's decode bursts locally until done."""
        llm = self.llm
        sp = sampling_params or SamplingParams()
        req = self.arm_suffix_request(suffix_embeds, sp)
        if req is None:
            raise RuntimeError("KV cache out of blocks (PromptSession)")
        try:
            while not req.done:
                if sp.is_greedy:
                    k = min(llm.decode_burst_size,
                            max(1, req.max_tokens - len(req.out_ids)))
                    k = max(1, -(-k // 8) * 8)
                    llm._grow_blocks_if_needed(horizon=k)
                    llm._decode_burst(k)
                else:
                    # bursts are greedy in-graph; sampled decoding steps
                    # one at a time through the per-slot sampler
                    llm._grow_blocks_if_needed(horizon=1)
                    llm._decode_once()
            return list(req.out_ids)
        finally:
            if not req.done:  # exception path; done already freed
                llm._free(req)

    def _prepare_suffix(self, suffix_embeds, sp):
        """Phase 1 of a suffix-slot arm: allocate slot + scratch blocks
        and build the per-row plan. Returns None when no slot/blocks are
        free (caller retries later). Boundary page copies are deferred to
        the caller so a batch performs them in one dispatch."""
        llm = self.llm
        try:
            slot = llm._slots.index(None)
        except ValueError:
            return None
        suffix = _as_numpy_2d(suffix_embeds)
        q = suffix.shape[0]
        bs = llm.cache_cfg.block_size
        # + burst overshoot headroom: fixed-K bursts write up to K-1
        # positions past the last accepted token
        total = (self.cached_len + q + sp.max_tokens + 1
                 + llm.decode_burst_size)
        mbps = llm.cache_cfg.max_blocks_per_seq
        if -(-total // bs) > mbps:
            # permanent for this stream — block-table rows are mbps wide,
            # so a silent truncation would write suffix KV into the wrong
            # pages and corrupt the session. Retrying cannot help; raise.
            raise ValueError(
                f"suffix continuation needs {-(-total // bs)} blocks "
                f"(cached {self.cached_len} + suffix {q} + max_tokens "
                f"{sp.max_tokens} + burst headroom) but max_blocks_per_seq "
                f"is {mbps}; raise max_model_len or finalize the stream"
            )

        scratch: List[int] = []
        blocks = list(self.blocks)
        n_session = len(blocks)
        copy_pair = None
        boundary = self.cached_len % bs
        if boundary and blocks:
            got = llm._alloc_blocks(1)
            if got is None:
                return None
            scratch.extend(got)
            copy_pair = (blocks[-1], scratch[-1])
            blocks[-1] = scratch[-1]
            n_session -= 1
        need_extra = -(-total // bs) - len(blocks)
        if need_extra > 0:
            got = llm._alloc_blocks(need_extra)
            if got is None:
                llm._free_blocks.extend(scratch)
                return None
            scratch.extend(got)
            blocks.extend(got)

        # reserve the slot immediately so later rows in the same batch
        # see it taken (a placeholder; overwritten at finish)
        llm._slots[slot] = True
        return {
            "session": self, "sp": sp, "suffix": suffix, "q": q,
            "slot": slot, "blocks": blocks, "n_session": n_session,
            "scratch": scratch, "copy_pair": copy_pair, "total": total,
            "cached_len": self.cached_len,
        }

    def arm_suffix_request(
        self,
        suffix_embeds: np.ndarray,
        sampling_params: Optional[SamplingParams] = None,
    ) -> Optional[_Request]:
        """Single-job convenience over `arm_suffix_batch`."""
        reqs = arm_suffix_batch(
            self.llm,
            [(self, suffix_embeds, sampling_params or SamplingParams())],
        )
        return reqs[0]

    def close(self) -> None:
        self.llm._free_blocks.extend(self.blocks)
        self.blocks = []
        self.cached_len = 0


def extend_batch(llm: "LLM", jobs) -> None:
    """Append new prompt content to N PromptSessions in ONE batched
    chunked-prefill dispatch (the extend half of packed online mode,
    ROADMAP Capabilities 3): concurrent streams' audio-token appends
    share an `extend_step` program the way `arm_suffix_batch` shares
    the suffix prefill — N streams pay one dispatch per tick, not N.

    `jobs` is a list of (session, embeds [T, H]); zero-length appends
    are skipped. All-or-nothing: on dispatch failure no session's
    `cached_len` advances (a retry rewrites the same positions, so the
    cache cannot be corrupted). Caller owns engine serialization."""
    live = []
    for session, embeds in jobs:
        e = _as_numpy_2d(embeds)
        t = e.shape[0]
        if t == 0:
            continue
        session._ensure_blocks(session.cached_len + t)
        live.append((session, e, t))
    if not live:
        return
    b = 1
    while b < len(live):
        b *= 2
    tb = _bucket_len(max(t for _, _, t in live))
    bs = llm.cache_cfg.block_size
    w = max(
        max(1, -(-(s.cached_len + t) // bs)) for s, _, t in live
    )
    w = -(-w // 8) * 8  # snap widths so jit caches a handful of shapes
    embeds_arr = np.zeros((b, tb, llm.cfg.hidden_size), np.float32)
    cached_lens = np.zeros((b,), np.int32)
    new_lens = np.zeros((b,), np.int32)
    tables = np.zeros((b, w), np.int32)  # dummy rows → garbage block 0
    for j, (s, e, t) in enumerate(live):
        embeds_arr[j, :t] = e
        cached_lens[j] = s.cached_len
        new_lens[j] = t
        wj = min(len(s.blocks), w)
        tables[j, :wj] = s.blocks[:wj]
    (_logits, _ids), llm.k_cache, llm.v_cache = llm._step_fns.extend_step(
        llm.params, llm.cfg, llm.k_cache, llm.v_cache,
        jnp.asarray(embeds_arr), jnp.asarray(cached_lens),
        jnp.asarray(new_lens), jnp.asarray(tables),
    )
    for s, _, t in live:
        s.cached_len += t


def arm_suffix_batch(llm: "LLM", jobs) -> List[Optional[_Request]]:
    """Arm N PromptSession suffix continuations with ONE batched chunked
    prefill (the packed-online-mode dispatch sharing, ROADMAP
    Capabilities 3): every armable job's [suffix] prefills in a single
    extend_step over [B, T_bucket] and decodes in the engine's SHARED
    bursts — N streams' partials cost one prefill dispatch + ~1× decode
    latency instead of N of each.

    `jobs` is a list of (session, suffix_embeds, sampling_params).
    Returns one _Request (or None = retry later) per job, in order; a
    job that cannot allocate returns None without blocking later jobs'
    results (their plans keep FIFO slot order). Caller owns engine
    serialization (the AsyncLLM stepper thread)."""
    plans: List[Optional[Dict]] = []
    live: List[Dict] = []
    try:
        # the plan phase is inside the try: a plan reserves a slot with a
        # bool placeholder (llm._slots[slot] = True), so an exception in a
        # LATER job's plan must also roll back the earlier reservations —
        # a leaked placeholder would crash the stepper on the next step
        for session, suffix_embeds, sp in jobs:
            plan = session._prepare_suffix(suffix_embeds,
                                           sp or SamplingParams())
            plans.append(plan)
            if plan is not None:
                live.append(plan)
        if not live:
            return [None] * len(plans)
        # boundary page copies for the whole batch in one dispatch each
        pairs = [p["copy_pair"] for p in live if p["copy_pair"] is not None]
        if pairs:
            srcs = jnp.asarray([a for a, _ in pairs], jnp.int32)
            dsts = jnp.asarray([b for _, b in pairs], jnp.int32)
            llm.k_cache = _copy_blocks(llm.k_cache, srcs, dsts)
            llm.v_cache = _copy_blocks(llm.v_cache, srcs, dsts)

        # one batched chunked prefill over all jobs (padded rows; dummy
        # rows write to garbage block 0)
        b = 1
        while b < len(live):
            b *= 2
        tb = _bucket_len(max(p["q"] for p in live))
        bs = llm.cache_cfg.block_size
        mbps = llm.cache_cfg.max_blocks_per_seq
        w = max(-(-p["total"] // bs) for p in live)
        w = min(mbps, -(-w // 8) * 8)
        embeds = np.zeros((b, tb, llm.cfg.hidden_size), np.float32)
        cached_lens = np.zeros((b,), np.int32)
        new_lens = np.zeros((b,), np.int32)
        tables = np.zeros((b, w), np.int32)
        for j, p in enumerate(live):
            embeds[j, : p["q"]] = p["suffix"]
            cached_lens[j] = p["cached_len"]
            new_lens[j] = p["q"]
            # always fits: _prepare_suffix raises when ceil(total/bs) >
            # max_blocks_per_seq, and w >= ceil(max total/bs)
            tables[j, : len(p["blocks"])] = p["blocks"]
        (logits, first_ids), llm.k_cache, llm.v_cache = llm._step_fns.extend_step(
            llm.params, llm.cfg, llm.k_cache, llm.v_cache,
            jnp.asarray(embeds), jnp.asarray(cached_lens),
            jnp.asarray(new_lens), jnp.asarray(tables),
        )
        sps_live = [p["sp"] for p in live]
        if all(s.is_greedy for s in sps_live):
            firsts = np.asarray(first_ids)
        else:
            # honor non-greedy SamplingParams for the FIRST continuation
            # token too — later tokens already sample via req.sp in the
            # decode path, and a silent greedy first token would be an
            # inconsistent hybrid distribution
            firsts = llm._sample_rows(logits[: len(live)], sps_live)
    except Exception:
        # roll back every reserved slot + scratch block; sessions' own
        # cached blocks are untouched
        for p in live:
            llm._free_blocks.extend(p["scratch"])
            if llm._slots[p["slot"]] is True:
                llm._slots[p["slot"]] = None
        raise

    now = time.perf_counter()
    out: List[Optional[_Request]] = []
    j = 0
    for plan in plans:
        if plan is None:
            out.append(None)
            continue
        p, sp, slot = plan, plan["sp"], plan["slot"]
        req = _Request.__new__(_Request)
        req.rid = llm._next_rid
        llm._next_rid += 1
        req.embeds = None
        req.prompt_len = p["cached_len"] + p["q"]
        req.max_tokens = sp.max_tokens
        req.out_ids = []
        req.done = False
        req.t_enqueue = now
        req.t_first_token = now
        req.stop_ids = llm.eos_ids | set(sp.stop_token_ids or ())
        req.sp = sp
        req.n_session_blocks = p["n_session"]
        req.slot = slot
        req.blocks = p["blocks"]
        llm._slots[slot] = req
        llm._block_tables[slot, :] = 0
        # fits by the _prepare_suffix max_blocks_per_seq guard
        llm._block_tables[slot, : len(p["blocks"])] = p["blocks"]
        llm._positions[slot] = req.prompt_len
        llm._seq_lens[slot] = req.prompt_len + 1
        first = int(firsts[j])
        j += 1
        llm._last_tokens[slot] = first
        llm._active[slot] = True
        llm._handle_token(req, first)
        out.append(req)
    return out
