"""Qwen3 decoder-only LM in functional JAX.

TPU-native replacement for the HF `Qwen3ForCausalLM` the reference loads as
its speech-LLM decoder (reference model.py:74-75, Qwen3-0.6B per README.md:3)
and for the vLLM engine's model executor. Architecture: RMSNorm (pre-norm),
GQA with per-head q/k RMSNorm, rotary embeddings over the full head_dim,
SwiGLU MLP, optional tied embeddings.

Design:
- parameters are a pytree of stacked per-layer arrays (leading L dim) so the
  whole decoder runs as one `lax.scan` — one compiled layer body instead of
  28 unrolled layers (faster compiles, identical math);
- attention is pluggable: prefill uses the XLA/Pallas causal kernel and
  *returns the new K/V per layer* for the paged cache; decode passes an
  `attn_fn` that reads the paged cache (engine/kv_cache.py);
- bf16 weights, f32 norms/softmax/logits.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import gqa_attention


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 1024
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 40960
    use_flash: bool = False  # Pallas flash attention for prefill (TPU)
    remat: bool = False  # rematerialize each layer in backward (training
    # memory <-> FLOPs trade; the reference's activation_checkpoint,
    # model.py:104-105)
    dtype: Any = jnp.bfloat16

    # tokens the reference decodes with (ChatML; reference infer.py:395-396)
    eos_token_id: int = 151645  # <|im_end|>
    pad_token_id: int = 151643  # <|endoftext|>

    @classmethod
    def from_hf_dict(cls, d: Dict, dtype=jnp.bfloat16) -> "Qwen3Config":
        return cls(
            vocab_size=d.get("vocab_size", 151936),
            hidden_size=d.get("hidden_size", 1024),
            num_hidden_layers=d.get("num_hidden_layers", 28),
            num_attention_heads=d.get("num_attention_heads", 16),
            num_key_value_heads=d.get("num_key_value_heads", 8),
            head_dim=d.get(
                "head_dim",
                d.get("hidden_size", 1024) // d.get("num_attention_heads", 16),
            ),
            intermediate_size=d.get("intermediate_size", 3072),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 1_000_000.0),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            max_position_embeddings=d.get("max_position_embeddings", 40960),
            eos_token_id=(
                d["eos_token_id"][0]
                if isinstance(d.get("eos_token_id"), list)
                else d.get("eos_token_id", 151645)
            ),
            dtype=dtype,
        )

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.bfloat16) -> "Qwen3Config":
        with open(os.path.join(model_dir, "config.json")) as f:
            return cls.from_hf_dict(json.load(f), dtype=dtype)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """positions [...,] → (cos, sin) each [..., head_dim//2], float32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Rotate-half RoPE. x [..., N, D]; cos/sin broadcast [..., 1, D/2]."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = xf1 * cos - xf2 * sin
    out2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def init_params(cfg: Qwen3Config, key: jax.Array) -> Dict:
    """Random-init parameter tree (stacked layers); used for tests/benches
    when no checkpoint is available."""
    L, H, D = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    Nq, Nkv, I = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.intermediate_size
    ks = jax.random.split(key, 10)

    def w(k, shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5 if len(shape) > 1 else 0.02)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    params = {
        "embed": w(ks[0], (cfg.vocab_size, H), 0.02),
        "final_norm": jnp.ones((H,), jnp.float32),
        "layers": {
            "input_ln": jnp.ones((L, H), jnp.float32),
            "post_ln": jnp.ones((L, H), jnp.float32),
            # q/k/v fused into one projection (and gate/up below): decode at
            # small batch is launch-bound — fewer, larger matmuls
            "wqkv": w(ks[1], (L, H, (Nq + 2 * Nkv) * D)),
            "wo": w(ks[4], (L, Nq * D, H)),
            "q_norm": jnp.ones((L, D), jnp.float32),
            "k_norm": jnp.ones((L, D), jnp.float32),
            "w_gateup": w(ks[5], (L, H, 2 * I)),
            "w_down": w(ks[7], (L, I, H)),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(ks[8], (H, cfg.vocab_size), 0.02)
    return params


def embed_tokens(params: Dict, input_ids: jax.Array) -> jax.Array:
    """Token ids → embeddings (the `get_input_embeddings()` analogue,
    reference model.py:506, infer.py:403-404)."""
    emb = params["embed"]
    if isinstance(emb, dict):  # int8 per-row quantized table
        rows = jnp.take(emb["q"], input_ids, axis=0)
        scales = jnp.take(emb["scale"], input_ids, axis=0)
        return rows.astype(scales.dtype) * scales
    return jnp.take(emb, input_ids, axis=0)


def layer_wqkv(lp: Dict) -> jax.Array:
    """The fused qkv projection weight [H, (Nq+2Nkv)·D]."""
    return lp["wqkv"]


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w, transparently handling weight-only quantized leaves.

    int8 ({"q": int8 [in, out], "scale": f32 [1, out]}): the int8→bf16
    convert fuses into the dot on TPU, so HBM weight traffic halves —
    the decode step is weight-read-bound (BENCH_NOTES round 2).

    int4 ({"q4": uint8 [G, gs/2, out], "scale4": f32 [G, 1, out]}):
    group-wise symmetric 4-bit (AWQ/GPTQ-style group_size on the input
    dim — per-channel alone is too coarse at 4 bits), nibble-packed two
    input rows per byte (XLA's native S4 dtype cannot cross the jit
    boundary on the axon TPU runtime — device_put recurses on the
    packed layout — so the packing is done by hand). Computed as G
    partial dots with the group's scale applied to the PARTIAL SUMS,
    i.e. Σ_g (x_g @ q_g)·s_g == x @ dequant(w); the nibble unpack is a
    VPU shift pair that XLA fuses into the dot's operand read."""
    if isinstance(w, dict):
        if "q4" in w:
            return _int4_dot(x, w).astype(x.dtype)
        y = x @ w["q"].astype(x.dtype)
        return y * w["scale"].astype(x.dtype)
    return x @ w


def quantize_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8 quantization of [..., in, out]."""
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2,
                    keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return {"q": q, "scale": scale}


def quantize_params_int8(params: Dict) -> Dict:
    """Weight-only int8 for every big matmul (wqkv/wo/w_gateup/w_down,
    lm_head, and the embedding table per-row). Norm scales stay f32."""
    layers = dict(params["layers"])
    for k in ("wqkv", "wo", "w_gateup", "w_down"):
        layers[k] = quantize_int8(layers[k])
    out = dict(params)
    out["layers"] = layers
    emb = params["embed"].astype(jnp.float32)
    row_scale = jnp.maximum(
        jnp.max(jnp.abs(emb), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    out["embed"] = {
        "q": jnp.clip(jnp.round(emb / row_scale), -127, 127).astype(jnp.int8),
        "scale": row_scale,
    }
    if "lm_head" in params:
        out["lm_head"] = quantize_int8(params["lm_head"])
    return out


def _unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """uint8 [..., gs/2, out] → (even, odd) int8 nibbles, sign-extended.

    Byte layout: low nibble = input row 2i, high nibble = row 2i+1.
    Both shifts are int8 VPU ops (<<4 then arithmetic >>4 sign-extends
    the low nibble; arithmetic >>4 alone extracts the high one)."""
    b = packed.astype(jnp.int8)
    even = jnp.right_shift(jnp.left_shift(b, 4), 4)
    odd = jnp.right_shift(b, 4)
    return even, odd


def _int4_dot(x: jax.Array, w: Dict[str, jax.Array]) -> jax.Array:
    """x [..., in] @ nibble-packed int4 weight → f32 [..., out].

    Splits x's input rows into (even, odd) pairs matching the nibble
    packing, runs two grouped dots, and applies the per-(group, out)
    scale to the partial sums: Σ_g (x_g @ q_g)·s_g == x @ dequant(w)."""
    q, scale = w["q4"], w["scale4"]
    g, gs2, out = q.shape[-3:]
    even, odd = _unpack_int4(q)
    # [..., in] → [..., G, gs/2, 2]: [..., g, i, 0] is input row 2i
    xg = x.reshape(*x.shape[:-1], g, gs2, 2)
    dot = partial(jnp.einsum, "...gi,gio->...go",
                  preferred_element_type=jnp.float32)
    y = dot(xg[..., 0], even.astype(x.dtype)) + dot(
        xg[..., 1], odd.astype(x.dtype))
    return (y * scale.reshape(g, out)).sum(axis=-2)


def quantize_int4(w: jax.Array, group_size: int = 128) -> Dict[str, jax.Array]:
    """Group-wise symmetric int4 quantization of [..., in, out].

    The input dim is split into groups of `group_size` rows; each
    (group, output-channel) pair gets its own f32 scale (max-abs / 7).
    Returns {"q4": uint8 [..., G, gs/2, out] (two input rows nibble-
    packed per byte), "scale4": f32 [..., G, 1, out]} — 4× fewer weight
    bytes than bf16 on the HBM-bound decode path. Hand-packed instead
    of XLA's S4 dtype: S4 jit arguments break on the axon TPU runtime
    (device_put layout recursion), and the explicit uint8 layout also
    keeps the leaves mesh-shardable like any other array."""
    *lead, kin, out = w.shape
    if kin % group_size:
        # tiny test configs: fall back to the largest divisor ≤ group_size
        group_size = math.gcd(kin, group_size)
    if group_size % 2:
        # gcd with 128 is a power of two unless kin itself is odd,
        # which nibble packing (two input rows per byte) cannot express
        raise ValueError(f"int4 needs an even input dim, got {kin}")
    g = kin // group_size
    wf = w.astype(jnp.float32).reshape(*lead, g, group_size, out)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    even = q[..., 0::2, :].astype(jnp.uint8) & 0xF
    odd = jnp.left_shift(q[..., 1::2, :].astype(jnp.uint8), 4)
    return {"q4": even | odd, "scale4": scale}


def quantize_params_int4(params: Dict, group_size: int = 128) -> Dict:
    """Weight-only int4 for the four big layer matmuls (+ lm_head when
    untied). The embedding table stays per-row int8 — it is read by
    gather (one row per token), not streamed, so int4's packing is not
    worth the extra dequant there. Norm scales stay f32."""
    layers = dict(params["layers"])
    for k in ("wqkv", "wo", "w_gateup", "w_down"):
        layers[k] = quantize_int4(layers[k], group_size)
    out = dict(params)
    out["layers"] = layers
    emb = params["embed"].astype(jnp.float32)
    row_scale = jnp.maximum(
        jnp.max(jnp.abs(emb), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    out["embed"] = {
        "q": jnp.clip(jnp.round(emb / row_scale), -127, 127).astype(jnp.int8),
        "scale": row_scale,
    }
    if "lm_head" in params:
        out["lm_head"] = quantize_int4(params["lm_head"], group_size)
    return out


def _layer_qkv(
    lp: Dict, cfg: Qwen3Config, x: jax.Array, cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x [B,T,H] → q [B,T,Nq,D], k/v [B,T,Nkv,D] with q/k-norm + RoPE."""
    b, t, _ = x.shape
    D = cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    qkv = mm(x, lp["wqkv"])  # one fused matmul
    q = qkv[..., : nq * D].reshape(b, t, nq, D)
    k = qkv[..., nq * D : (nq + nkv) * D].reshape(b, t, nkv, D)
    v = qkv[..., (nq + nkv) * D :].reshape(b, t, nkv, D)
    q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return q, k, v


def _layer_mlp(lp: Dict, x: jax.Array) -> jax.Array:
    gateup = mm(x, lp["w_gateup"])  # one fused matmul
    i = gateup.shape[-1] // 2
    return mm(jax.nn.silu(gateup[..., :i]) * gateup[..., i:], lp["w_down"])


AttnFn = Callable[[int, jax.Array, jax.Array, jax.Array], jax.Array]


def forward_hidden(
    params: Dict,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,  # [B, T, H]
    positions: jax.Array,  # [B, T]
    attn_lengths: Optional[jax.Array] = None,  # [B] valid length
    return_kv: bool = False,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """Self-contained prefill forward: causal attention within the batch.

    Returns final hidden [B,T,H] and, when `return_kv`, per-layer
    (k, v) stacked [L, B, T, Nkv, D] (post-RoPE) for writing the paged cache.
    """
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]

    def body(x, lp):
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _layer_qkv(lp, cfg, h, cos, sin)
        if cfg.use_flash and attn_lengths is not None:
            from ..ops.flash_attention import flash_attention

            attn = flash_attention(q, k, v, attn_lengths, causal=True)
        else:
            attn = gqa_attention(
                q, k, v, causal=True, q_positions=positions,
                kv_lengths=attn_lengths,
            )
        b, t, _, _ = attn.shape
        x = x + mm(attn.reshape(b, t, -1), lp["wo"])
        h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        x = x + _layer_mlp(lp, h)
        return x, (k, v) if return_kv else None

    if cfg.remat:
        body = jax.checkpoint(body)
    x, kvs = jax.lax.scan(body, inputs_embeds, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, kvs


def forward_with_attn_fn(
    params: Dict,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,  # [B, T, H]
    positions: jax.Array,  # [B, T]
    attn_fn: AttnFn,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Forward where attention is delegated (paged decode / custom kernels).

    `attn_fn(layer_idx, q, k_new, v_new) -> attn_out` receives post-RoPE
    q/k/v for the new tokens; it owns cache read/write. Returns final hidden
    and stacked per-layer new (k, v).
    """
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    layer_ids = jnp.arange(cfg.num_hidden_layers)

    def body(x, scanned):
        lp, lid = scanned
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _layer_qkv(lp, cfg, h, cos, sin)
        attn = attn_fn(lid, q, k, v)
        b, t, _, _ = attn.shape
        x = x + mm(attn.reshape(b, t, -1), lp["wo"])
        h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        x = x + _layer_mlp(lp, h)
        return x, (k, v)

    x, kvs = jax.lax.scan(body, inputs_embeds, (params["layers"], layer_ids))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, kvs


def lm_logits(params: Dict, cfg: Qwen3Config, hidden: jax.Array) -> jax.Array:
    """Hidden → vocab logits in float32."""
    head = params.get("lm_head")
    if head is None:
        emb = params["embed"]
        if isinstance(emb, dict):  # int8 per-row table: head scale per vocab
            logits = jnp.einsum(
                "...h,vh->...v", hidden.astype(jnp.float32),
                emb["q"].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return logits * emb["scale"][:, 0]
        head = emb.T
    if isinstance(head, dict):
        if "q4" in head:  # grouped int4 head: f32 partial dots per group
            return _int4_dot(hidden.astype(jnp.float32), head)
        logits = jnp.einsum(
            "...h,hv->...v", hidden.astype(jnp.float32),
            head["q"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return logits * head["scale"][0]
    return jnp.einsum(
        "...h,hv->...v", hidden.astype(jnp.float32), head.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("cfg",))
def forward_logits(
    params: Dict,
    cfg: Qwen3Config,
    input_ids: jax.Array,  # [B, T]
    attn_lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Token-in, logits-out convenience (parity tests vs transformers)."""
    x = embed_tokens(params, input_ids).astype(cfg.dtype)
    b, t = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    hidden, _ = forward_hidden(params, cfg, x, positions, attn_lengths)
    return lm_logits(params, cfg, hidden)


@partial(jax.jit, static_argnames=("cfg",))
def _last_token_logits(params, cfg, embeds, length):
    b, t, _ = embeds.shape
    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    hidden, _ = forward_hidden(
        params, cfg, embeds.astype(cfg.dtype), pos, attn_lengths=length[None]
    )
    last = jnp.take_along_axis(
        hidden, (length - 1)[None, None, None].astype(jnp.int32), axis=1
    )
    return lm_logits(params, cfg, last)[0, 0]


def greedy_decode_simple(
    params: Dict,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,  # [1, T, H]
    max_new_tokens: int = 128,
    eos_id: Optional[int] = None,
) -> np.ndarray:
    """Engine-less greedy decoding (KV recomputed each step) — the slow
    correctness path mirroring HF `generate` (reference model.py:655-659).
    Uses one fixed [T + max_new] buffer so the step compiles once per call
    shape. Used for e2e parity tests; the serving engine replaces this."""
    eos = cfg.eos_token_id if eos_id is None else eos_id
    _, t0, h = inputs_embeds.shape
    buf = jnp.concatenate(
        [inputs_embeds.astype(cfg.dtype),
         jnp.zeros((1, max_new_tokens, h), cfg.dtype)],
        axis=1,
    )
    out_ids = []
    length = t0
    for _ in range(max_new_tokens):
        logits = _last_token_logits(
            params, cfg, buf, jnp.asarray(length, jnp.int32)
        )
        nxt = int(jnp.argmax(logits))
        if nxt == eos:
            break
        out_ids.append(nxt)
        nxt_embed = embed_tokens(params, jnp.asarray([nxt])).astype(cfg.dtype)
        buf = jax.lax.dynamic_update_slice(buf, nxt_embed[None], (0, length, 0))
        length += 1
    return np.asarray(out_ids, dtype=np.int64)


@partial(jax.jit, static_argnames=("cfg",))
def _padded_step_logits(params, cfg, buf, kv_mask, row):
    """One step of the right-padded batched fallback: full-buffer forward
    with an explicit key mask, logits read at the shared buffer `row`.

    Mirrors HF `generate(inputs_embeds, attention_mask)` mechanics
    (reference infer.py:484-489): RoPE positions are
    `cumsum(attention_mask) - 1` with pad rows pinned to 1 (HF's
    `masked_fill`), causality is over buffer rows, and padded keys are
    masked additively.
    """
    csum = jnp.cumsum(kv_mask.astype(jnp.int32), axis=1) - 1
    positions = jnp.where(kv_mask > 0, csum, 1).astype(jnp.int32)
    key_bias = jnp.where(
        kv_mask > 0, 0.0, -1e9
    ).astype(jnp.float32)[:, None, None, :]

    def attn_fn(lid, q, k, v):
        del lid
        return gqa_attention(q, k, v, causal=True, bias=key_bias)

    hidden, _ = forward_with_attn_fn(
        params, cfg, buf.astype(cfg.dtype), positions, attn_fn
    )
    last = jnp.take_along_axis(
        hidden,
        jnp.broadcast_to(
            row.astype(jnp.int32)[None, None, None],
            (hidden.shape[0], 1, 1),
        ),
        axis=1,
    )
    return lm_logits(params, cfg, last)[:, 0]


def greedy_decode_padded(
    params: Dict,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,  # [B, T, H] right-padded with zeros
    input_lens: jax.Array,  # [B] valid prefix lengths
    max_new_tokens: int = 512,
    eos_id: Optional[int] = None,
) -> list:
    """Engine-less BATCHED greedy decode over a right-padded embed batch —
    the analogue of the reference's HF fallback
    `llm.generate(inputs_embeds=pad_sequence(...), attention_mask=...)`
    (reference infer.py:477-491).

    Faithful to that contract, including its known flaw: every sequence's
    next token is read at the SHARED last buffer row, so sequences shorter
    than the batch max predict their first token from a zero-embedding pad
    row (query roped at HF's masked_fill position 1) that attends over
    their valid prefix. That padding geometry is what produces the
    reference README's 8.53%-CER batch-16 HF row vs 7.02% at batch 1
    (README.md:93-94); the engine path with per-sequence prompt embeds
    avoids it, so this exists only for reference-surface parity when the
    engine is disabled. The longest sequence in the batch sees no padding
    and decodes token-identically to `greedy_decode_simple`.

    KV is recomputed each step (one compiled step per buffer shape — the
    slow correctness path, like `greedy_decode_simple`). Greedy argmax,
    matching the repo-wide decode contract. Finished sequences append
    `pad_token_id` (HF's `unfinished_sequences` semantics) with the key
    mask still extended, exactly as HF extends `attention_mask` with ones.

    Returns a list of B np.int64 arrays (truncated before the first eos).
    """
    eos = cfg.eos_token_id if eos_id is None else eos_id
    b, t0, h = inputs_embeds.shape
    buf = jnp.concatenate(
        [jnp.asarray(inputs_embeds, cfg.dtype),
         jnp.zeros((b, max_new_tokens, h), cfg.dtype)],
        axis=1,
    )
    lens = jnp.asarray(input_lens, jnp.int32)
    col = jnp.arange(t0 + max_new_tokens, dtype=jnp.int32)
    kv_mask = (col[None, :] < lens[:, None]).astype(jnp.int32)

    out_ids: list = [[] for _ in range(b)]
    done = np.zeros(b, dtype=bool)
    for step in range(max_new_tokens):
        row = jnp.asarray(t0 + step - 1, jnp.int32)
        logits = _padded_step_logits(params, cfg, buf, kv_mask, row)
        nxt = np.asarray(jnp.argmax(logits, axis=-1))
        nxt = np.where(done, cfg.pad_token_id, nxt)
        done |= nxt == eos
        for i in range(b):
            if not done[i] and nxt[i] != eos:
                out_ids[i].append(int(nxt[i]))
        if bool(done.all()):
            break
        nxt_embed = embed_tokens(params, jnp.asarray(nxt)).astype(cfg.dtype)
        buf = jax.lax.dynamic_update_slice(
            buf, nxt_embed[:, None, :], (0, t0 + step, 0)
        )
        kv_mask = kv_mask.at[:, t0 + step].set(1)
    return [np.asarray(ids, dtype=np.int64) for ids in out_ids]
