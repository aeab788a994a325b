"""SAN-M (self-attention + FSMN memory) audio encoder in functional JAX.

TPU-native re-design of the SenseVoice-style encoder the reference pulls
from the funasr registry (reference model.py:57-59
`tables.encoder_classes[name](input_size=80, **conf)`; the Fun-ASR-Nano
model card wires a SenseVoiceEncoderSmall-family encoder). Architecture
family, faithfully reproduced but laid out TPU-first:

- fbank [B, T, 80] is scaled by sqrt(d) and summed with sinusoidal
  positions, then projected to `output_size` by the first layer;
- each layer: LN → SAN-M attention → residual, LN → ReLU FFN → residual.
  SAN-M attention = standard MHSA plus an FSMN memory branch: a depthwise
  1-D convolution over the value projections with a residual, added to
  the attention output AFTER linear_out — funasr
  MultiHeadedAttentionSANM.forward returns `linear_out(att) + fsmn_memory`
  and applies `sanm_shift` as extra left padding on the conv
  (left = (k-1)//2 + shift, right = k-1-left);
- optional `tp_blocks` trailing stage after after_norm (+ tp_norm), the
  SenseVoiceEncoderSmall layout;
- all layers after the first are homogeneous and run as one `lax.scan`
  (one compiled body instead of N unrolled layers);
- masking by sequence length everywhere; bf16 matmuls, f32 norms/softmax.

Layer-math audit vs funasr (funasr/models/sanm/{encoder,attention}.py
semantics, checkpoint key space handled in models/convert.py):
  encoders0.0 = EncoderLayerSANM(in=input_size, out=output_size): when
  in_size != size there is NO attention residual (here: layer0,
  residual_attn=False); encoders.* keep the residual. normalize_before
  =True: x = x + attn(norm1(x)); x = x + ffn(norm2(x)). Scores scaled by
  d_k**-0.5; value heads and the fsmn branch share the same v projection.

Returns (encoder_out [B, T, D], encoder_out_lens [B]) matching the
`audio_encoder(speech, speech_lengths)` call surface
(reference model.py:256-265, infer.py:455-457).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import full_attention


@dataclasses.dataclass(frozen=True)
class SANMEncoderConfig:
    input_size: int = 80
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    tp_blocks: int = 0  # trailing tp stage (SenseVoiceEncoderSmall layout)
    kernel_size: int = 11  # FSMN memory kernel
    sanm_shift: int = 0
    dropout_rate: float = 0.1  # unused at inference; kept for config parity
    use_flash: bool = False  # Pallas flash attention (TPU, lane-aligned dims)
    # fused attention SUBLAYER kernel (ops/sanm_fused.py): qkv proj +
    # attention + out proj + FSMN in one dispatch — no HBM intermediates.
    # Inference-only (no VJP); requires head_dim % 128 == 0 and in_dim
    # lane-aligned, so layer0 (in_dim 80) always takes the unfused path.
    fused_attention: bool = False
    fused_interpret: bool = False  # interpret-mode fused kernel (tests)
    remat: bool = False  # rematerialize layers in backward (training)
    dtype: Any = jnp.bfloat16

    @classmethod
    def from_conf(cls, conf: Dict, input_size: int = 80, dtype=jnp.bfloat16):
        return cls(
            input_size=input_size,
            output_size=conf.get("output_size", 512),
            attention_heads=conf.get("attention_heads", 4),
            linear_units=conf.get("linear_units", 2048),
            num_blocks=conf.get("num_blocks", 50),
            tp_blocks=conf.get("tp_blocks", 0),
            kernel_size=conf.get("kernel_size", 11),
            sanm_shift=conf.get("sanm_shift", 0),
            use_flash=conf.get("use_flash", False),
            fused_attention=conf.get("fused_attention", False),
            dtype=dtype,
        )


def sinusoidal_positions(t: int, d: int) -> np.ndarray:
    """funasr SinusoidalPositionEncoder convention: positions start at 1."""
    pos = np.arange(1, t + 1, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d, 2, dtype=np.float64) * -(np.log(10000.0) / d)
    )[None, :]
    pe = np.zeros((t, d), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-12) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def _fsmn_memory(
    v: jax.Array,  # [B, T, D] value projections (head-merged)
    kernel: jax.Array,  # [K, D] depthwise weights
    mask: jax.Array,  # [B, T, 1]
    shift: int = 0,
) -> jax.Array:
    """FSMN block: depthwise 1-D conv over time with a residual, no bias —
    the memory branch of SAN-M attention. `shift` adds left padding
    (funasr MultiHeadedAttentionSANM: left = (k-1)//2 + sanm_shift,
    right = k-1-left), making the kernel look further into the past."""
    k = kernel.shape[0]
    left = (k - 1) // 2 + shift
    right = k - 1 - left
    v = v * mask
    # depthwise conv via feature-group conv: [B, T, D] → NWC conv
    out = jax.lax.conv_general_dilated(
        v.astype(jnp.float32),
        kernel.astype(jnp.float32)[:, None, :],  # [K, 1, D] (W, I/g, O)
        window_strides=(1,),
        padding=[(left, right)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=v.shape[-1],
    )
    return (out.astype(v.dtype) + v) * mask


def _sanm_attention(
    lp: Dict,
    cfg: SANMEncoderConfig,
    x: jax.Array,  # [B, T, in_dim]
    mask: jax.Array,  # [B, T, 1] 1/0 validity
    lengths: jax.Array,  # [B]
) -> jax.Array:
    b, t, _ = x.shape
    d = cfg.output_size
    h = cfg.attention_heads
    if (cfg.fused_attention and x.shape[-1] % 128 == 0
            and (d // h) % 128 == 0 and t % 8 == 0):
        from ..ops.sanm_fused import sanm_attention_fused

        return sanm_attention_fused(
            x, lp["w_qkv"], lp["b_qkv"], lp["fsmn_kernel"], lp["w_out"],
            lp["b_out"], lengths, heads=h, shift=cfg.sanm_shift,
            interpret=cfg.fused_interpret,
        )
    qkv = x @ lp["w_qkv"] + lp["b_qkv"]  # [B, T, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    mem = _fsmn_memory(v, lp["fsmn_kernel"], mask, cfg.sanm_shift)
    q = q.reshape(b, t, h, d // h)
    k = k.reshape(b, t, h, d // h)
    v = v.reshape(b, t, h, d // h)
    if cfg.use_flash:
        from ..ops.flash_attention import flash_attention

        att = flash_attention(q, k, v, lengths, causal=False)
    else:
        att = full_attention(q, k, v, kv_lengths=lengths)
    att = att.reshape(b, t, d)
    # funasr contract: fsmn memory joins AFTER the output projection
    # (MultiHeadedAttentionSANM.forward: att_outs + fsmn_memory)
    return att @ lp["w_out"] + lp["b_out"] + mem


def _ffn(lp: Dict, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(x @ lp["w_ff1"] + lp["b_ff1"])
    return h @ lp["w_ff2"] + lp["b_ff2"]


def _encoder_layer(
    lp: Dict,
    cfg: SANMEncoderConfig,
    x: jax.Array,
    mask: jax.Array,
    lengths: jax.Array,
    residual_attn: bool = True,
) -> jax.Array:
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
    att = _sanm_attention(lp, cfg, h, mask, lengths)
    x = x + att if residual_attn else att
    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
    return x + _ffn(lp, h)


def init_params(cfg: SANMEncoderConfig, key: jax.Array) -> Dict:
    d, i, k_sz = cfg.output_size, cfg.linear_units, cfg.kernel_size
    n_rest = cfg.num_blocks - 1

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in ** -0.5).astype(
            cfg.dtype
        )

    def layer(k, in_dim, stacked: Optional[int] = None):
        def shp(s):
            return (stacked, *s) if stacked else s

        ks = jax.random.split(k, 6)
        return {
            "ln1_scale": jnp.ones(shp((in_dim,)), jnp.float32),
            "ln1_bias": jnp.zeros(shp((in_dim,)), jnp.float32),
            "w_qkv": w(ks[0], shp((in_dim, 3 * d)), in_dim),
            "b_qkv": jnp.zeros(shp((3 * d,)), cfg.dtype),
            "fsmn_kernel": w(ks[1], shp((k_sz, d)), k_sz),
            "w_out": w(ks[2], shp((d, d)), d),
            "b_out": jnp.zeros(shp((d,)), cfg.dtype),
            "ln2_scale": jnp.ones(shp((d,)), jnp.float32),
            "ln2_bias": jnp.zeros(shp((d,)), jnp.float32),
            "w_ff1": w(ks[3], shp((d, i)), d),
            "b_ff1": jnp.zeros(shp((i,)), cfg.dtype),
            "w_ff2": w(ks[4], shp((i, d)), i),
            "b_ff2": jnp.zeros(shp((d,)), cfg.dtype),
        }

    k0, k1, k2 = jax.random.split(key, 3)
    params = {
        "layer0": layer(k0, cfg.input_size),
        "layers": layer(k1, d, stacked=n_rest),
        "after_norm_scale": jnp.ones((d,), jnp.float32),
        "after_norm_bias": jnp.zeros((d,), jnp.float32),
    }
    if cfg.tp_blocks > 0:
        params["tp_layers"] = layer(k2, d, stacked=cfg.tp_blocks)
        params["tp_norm_scale"] = jnp.ones((d,), jnp.float32)
        params["tp_norm_bias"] = jnp.zeros((d,), jnp.float32)
    return params


def _sanm_attention_packed(
    lp: Dict,
    cfg: SANMEncoderConfig,
    x: jax.Array,        # [TT, in_dim] packed tokens
    seg_ids: jax.Array,  # [TT]
    gap_mask: jax.Array,  # [TT, 1] 1.0 valid / 0.0 gap
    k_window: int = 0,
    k_window_rows: int = 0,
) -> jax.Array:
    d = cfg.output_size
    h = cfg.attention_heads
    qkv = x @ lp["w_qkv"] + lp["b_qkv"]  # [TT, 3D]
    q2, k2, v2 = jnp.split(qkv, 3, axis=-1)
    # FSMN memory over the packed timeline: gaps are ≥ (k-1)//2 zeros, so
    # the depthwise conv's cross-segment taps read zeros — identical to
    # per-utterance SAME zero padding
    mem = _fsmn_memory(
        v2[None], lp["fsmn_kernel"], gap_mask[None], cfg.sanm_shift
    )[0]
    if cfg.use_flash and k_window_rows > 0:
        from ..ops.flash_attention import flash_attention_segmented_oneshot

        # ONE-SHOT windowed kernel: the online multi-k-block variant ran
        # at ~1% MFU (per-head m/l scratch column updates + per-tile acc
        # rescales dominated); with each q-block's whole key window in
        # VMEM the softmax is plain — −17% full packed encode at the
        # bench mix (BENCH_NOTES round 4)
        att = flash_attention_segmented_oneshot(
            q2, k2, v2, seg_ids, nq=h, nkv=h, d=d // h,
            window=k_window_rows, interpret=cfg.fused_interpret,
        )
    elif cfg.use_flash:
        from ..ops.flash_attention import flash_attention_segmented

        # 512×1024 tiles: fewer grid programs than 512² at the bench's
        # ~11k-frame packing (per-tile setup overhead, not FLOPs or
        # bytes, dominates); bq capped at 512 to fit VMEM with the
        # head-batched block layout + double buffering
        att = flash_attention_segmented(
            q2, k2, v2, seg_ids, nq=h, nkv=h, d=d // h,
            block_q=512, block_k=1024, k_window=k_window,
        )
    else:
        from ..ops.attention import segment_attention_xla

        att = segment_attention_xla(q2, k2, v2, seg_ids, h, d // h)
    return att @ lp["w_out"] + lp["b_out"] + mem


def _encoder_layer_packed(
    lp: Dict,
    cfg: SANMEncoderConfig,
    x: jax.Array,
    seg_ids: jax.Array,
    gap_mask: jax.Array,
    residual_attn: bool = True,
    k_window: int = 0,
    k_window_rows: int = 0,
) -> jax.Array:
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
    att = _sanm_attention_packed(lp, cfg, h, seg_ids, gap_mask, k_window,
                                 k_window_rows)
    x = x + att if residual_attn else att
    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
    return x + _ffn(lp, h)


@partial(jax.jit, static_argnames=("cfg", "k_window", "k_window_rows"))
def encode_packed(
    params: Dict,
    cfg: SANMEncoderConfig,
    speech: jax.Array,   # [TT, input_size] packed valid frames (+ gaps)
    seg_ids: jax.Array,  # [TT] int32: utterance id, -1 = gap
    pos_ids: jax.Array,  # [TT] int32: frame position WITHIN its utterance
    k_window: int = 0,
    k_window_rows: int = 0,
) -> jax.Array:
    """Packed (ragged) encoder forward → [TT, output_size].

    TPU-native answer to padded-batch waste: all utterances' valid
    frames are packed along one time axis (16-frame-aligned segments
    with ≥16-frame zero gaps, see engine/packed.py), so the FFN/QKV
    matmuls — the encoder's FLOPs — run on ~2.4× fewer rows at the
    SPEECHIO duration mix, and attention is segment-block-diagonal.
    Numerics match `encode` per utterance exactly (same math; gap
    zeros reproduce SAME conv padding)."""
    tt = speech.shape[0]
    gap_mask = (seg_ids >= 0)[:, None].astype(cfg.dtype)
    x = speech.astype(jnp.float32) * (cfg.output_size ** 0.5)
    pe = jnp.asarray(sinusoidal_positions(tt, cfg.input_size))
    # per-token position WITHIN the utterance (funasr positions start
    # at 1 → table row pos_ids)
    x = (x + pe[jnp.clip(pos_ids, 0, tt - 1)]).astype(cfg.dtype)
    x = x * gap_mask

    x = _encoder_layer_packed(
        params["layer0"], cfg, x, seg_ids, gap_mask,
        residual_attn=(cfg.input_size == cfg.output_size),
        k_window=k_window, k_window_rows=k_window_rows,
    )

    def body(carry, lp):
        return (
            _encoder_layer_packed(lp, cfg, carry, seg_ids, gap_mask,
                                  k_window=k_window,
                                  k_window_rows=k_window_rows),
            None,
        )

    if cfg.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["after_norm_scale"], params["after_norm_bias"])
    if cfg.tp_blocks > 0:
        x, _ = jax.lax.scan(body, x, params["tp_layers"])
        x = layer_norm(x, params["tp_norm_scale"], params["tp_norm_bias"])
    return x * gap_mask


@partial(jax.jit, static_argnames=("cfg",))
def encode(
    params: Dict,
    cfg: SANMEncoderConfig,
    speech: jax.Array,  # [B, T, input_size]
    speech_lengths: jax.Array,  # [B]
) -> Tuple[jax.Array, jax.Array]:
    """fbank → encoder states. Output length == input length (no
    subsampling in the encoder; the adaptor downsamples, reference
    model.py:391-396)."""
    b, t, _ = speech.shape
    x = speech.astype(jnp.float32) * (cfg.output_size ** 0.5)
    pe = jnp.asarray(sinusoidal_positions(t, cfg.input_size))
    x = (x + pe[None, :, :]).astype(cfg.dtype)
    mask = (
        jnp.arange(t)[None, :] < speech_lengths[:, None]
    )[..., None].astype(cfg.dtype)
    x = x * mask

    # first layer projects input_size → output_size; funasr
    # EncoderLayerSANM keeps the attention residual ONLY when
    # in_size == size (e.g. the ct-punc encoder), never across a
    # projection
    x = _encoder_layer(
        params["layer0"], cfg, x, mask, speech_lengths,
        residual_attn=(cfg.input_size == cfg.output_size),
    )

    def body(carry, lp):
        return _encoder_layer(lp, cfg, carry, mask, speech_lengths), None

    if cfg.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["after_norm_scale"], params["after_norm_bias"])
    if cfg.tp_blocks > 0:
        # SenseVoiceEncoderSmall trailing stage: tp_encoders then tp_norm
        x, _ = jax.lax.scan(body, x, params["tp_layers"])
        x = layer_norm(x, params["tp_norm_scale"], params["tp_norm_bias"])
    return x * mask, speech_lengths
