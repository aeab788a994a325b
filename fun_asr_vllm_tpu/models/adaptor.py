"""Audio→LLM adaptor with 8× temporal downsampling, in functional JAX.

Re-design of the funasr adaptor the reference instantiates via
``tables.adaptor_classes`` with ``use_low_frame_rate=True``
(reference model.py:112-125). The length contract is pinned by the
reference's token math (model.py:391-396):

    o1  = 1 + (T - 3 + 2*1) // 2        # conv k=3, s=2, p=1
    o2  = 1 + (o1 - 3 + 2*1) // 2       # conv k=3, s=2, p=1
    out = (o2 - 1) // 2 + 1             # stride-2 subsample

i.e. 10 ms fbank frames → ~80 ms audio tokens (T/8). Structure: two
strided 1-D convolutions with ReLU, a stride-2 frame subsample, then a
two-layer MLP projecting encoder_dim → llm_dim.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NanoAdaptorConfig:
    encoder_dim: int = 512
    llm_dim: int = 1024
    ffn_dim: int = 2048
    kernel_size: int = 3
    use_low_frame_rate: bool = True
    dtype: Any = jnp.bfloat16

    @classmethod
    def from_conf(cls, conf: Dict, dtype=jnp.bfloat16):
        return cls(
            encoder_dim=conf.get("encoder_dim", 512),
            llm_dim=conf.get("llm_dim", 1024),
            ffn_dim=conf.get("ffn_dim", conf.get("llm_dim", 1024) * 2),
            kernel_size=conf.get("kernel_size", 3),
            use_low_frame_rate=conf.get("use_low_frame_rate", True),
            dtype=dtype,
        )


def downsampled_length(t: int) -> int:
    """Python-side token-length contract (reference model.py:391-396)."""
    o1 = 1 + (t - 3 + 2) // 2
    o2 = 1 + (o1 - 3 + 2) // 2
    return (o2 - 1) // 2 + 1


def downsampled_length_jnp(t: jax.Array) -> jax.Array:
    o1 = 1 + (t - 1) // 2
    o2 = 1 + (o1 - 1) // 2
    return (o2 - 1) // 2 + 1


def init_params(cfg: NanoAdaptorConfig, key: jax.Array) -> Dict:
    e, l, f, k = cfg.encoder_dim, cfg.llm_dim, cfg.ffn_dim, cfg.kernel_size
    ks = jax.random.split(key, 4)

    def w(kk, shape, fan_in):
        return (jax.random.normal(kk, shape, jnp.float32) * fan_in ** -0.5).astype(
            cfg.dtype
        )

    return {
        "conv1_w": w(ks[0], (k, e, e), k * e),  # (W, I, O)
        "conv1_b": jnp.zeros((e,), cfg.dtype),
        "conv2_w": w(ks[1], (k, e, e), k * e),
        "conv2_b": jnp.zeros((e,), cfg.dtype),
        "w1": w(ks[2], (e, f), e),
        "b1": jnp.zeros((f,), cfg.dtype),
        "w2": w(ks[3], (f, l), f),
        "b2": jnp.zeros((l,), cfg.dtype),
    }


def _strided_conv(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """[B, T, C] → [B, 1+(T-1)//2, C]; k=3, s=2, p=1 (torch Conv1d math)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(2,),
        padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return jax.nn.relu(out + b.astype(jnp.float32)).astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def forward_packed(
    params: Dict,
    cfg: NanoAdaptorConfig,
    x: jax.Array,    # [TT, encoder_dim] packed encoder states
    m1: jax.Array,   # [TT/2, 1] validity after conv1 (host-computed)
    m2: jax.Array,   # [TT/4, 1] validity after conv2
) -> jax.Array:
    """Packed-timeline adaptor → [TT/8, llm_dim] audio tokens.

    Segments are 16-frame-aligned with ≥16-frame zero gaps
    (engine/packed.py), so each strided conv's cross-boundary taps read
    zeros or masked-garbage-zeroed slots — numerics match `forward`'s
    per-utterance p=1 zero padding exactly. Utterance i's tokens land at
    packed positions [start_i/8, start_i/8 + downsampled_length(t_i))."""
    if not cfg.use_low_frame_rate:
        # the packed frame layout hard-codes the 8× downsample token
        # placement (engine/packed.plan_frame_pack tok_starts = start//8);
        # the engine falls back to the padded path for this config
        raise NotImplementedError(
            "forward_packed requires use_low_frame_rate=True"
        )
    x = _strided_conv(x[None], params["conv1_w"], params["conv1_b"])
    x = x * m1[None].astype(x.dtype)
    x = _strided_conv(x, params["conv2_w"], params["conv2_b"])
    x = x * m2[None].astype(x.dtype)
    x = x[0, ::2]
    m3 = m2[::2]
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    out = h @ params["w2"] + params["b2"]
    return out * m3.astype(out.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict,
    cfg: NanoAdaptorConfig,
    encoder_out: jax.Array,  # [B, T, encoder_dim]
    encoder_out_lens: jax.Array,  # [B]
) -> Tuple[jax.Array, jax.Array]:
    """(encoder states, lens) → (audio tokens [B, T', llm_dim], lens')
    matching the `audio_adaptor(encoder_out, encoder_out_lens)` surface
    (reference model.py:491-493, infer.py:458-460)."""
    x = encoder_out
    if cfg.use_low_frame_rate:
        x = _strided_conv(x, params["conv1_w"], params["conv1_b"])
        x = _strided_conv(x, params["conv2_w"], params["conv2_b"])
        x = x[:, ::2]
        out_lens = downsampled_length_jnp(encoder_out_lens)
    else:
        out_lens = encoder_out_lens
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    out = h @ params["w2"] + params["b2"]
    mask = (
        jnp.arange(out.shape[1])[None, :] < out_lens[:, None]
    )[..., None].astype(out.dtype)
    return out * mask, out_lens
