"""Token sampling (vLLM SamplingParams-compatible surface).

The reference decodes with ``SamplingParams(top_p=0.001, max_tokens=500)``
(reference infer.py:384-387) — effectively greedy. Implemented as a single
jit-friendly function covering greedy / temperature / top-k / top-p.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SamplingParams:
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    max_tokens: int = 500
    stop_token_ids: Optional[List[int]] = None
    skip_special_tokens: bool = True

    @property
    def is_greedy(self) -> bool:
        # vLLM treats top_p→0 / temperature→0 as argmax
        return self.temperature <= 1e-5 or self.top_p <= 0.01


def sample_tokens(
    logits: jax.Array,  # [S, V] float32
    key: jax.Array,
    temperature: float,
    top_p: float,
    top_k: int,
) -> jax.Array:
    """Sample one token per row. Static sampling config (bucketed by the
    engine so each distinct config compiles once)."""
    if temperature <= 1e-5 or top_p <= 0.01:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep 1st)
        keep = cum - probs < top_p
        thresh = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@jax.jit
def sample_tokens_per_row(
    logits: jax.Array,       # [S, V] float32
    key: jax.Array,
    temperature: jax.Array,  # [S] f32
    top_p: jax.Array,        # [S] f32
    top_k: jax.Array,        # [S] int32 (<=0 → disabled)
) -> jax.Array:
    """Per-row sampling configurations in ONE vectorized step — the vLLM
    per-prompt SamplingParams contract (reference model.py:645-653 call
    shape): each slot carries its own temperature/top_p/top_k; greedy
    rows (temperature≤1e-5 or top_p≤0.01) take the argmax exactly.

    One descending sort serves both the per-row k-th-value cutoff and the
    nucleus (top_p) cumulative cutoff; compiled once for all mixes."""
    s, v = logits.shape
    greedy = (temperature <= 1e-5) | (top_p <= 0.01)
    lf = logits.astype(jnp.float32)
    argmax = jnp.argmax(lf, axis=-1).astype(jnp.int32)

    safe_t = jnp.where(greedy, 1.0, jnp.maximum(temperature, 1e-5))
    scaled = lf / safe_t[:, None]
    order = jnp.argsort(-scaled, axis=-1)                 # descending
    sorted_logits = jnp.take_along_axis(scaled, order, axis=-1)

    # per-row top-k: k-th largest value as cutoff (disabled → rank V)
    k_row = jnp.where(top_k > 0, top_k, v).astype(jnp.int32)
    kth = jnp.take_along_axis(
        sorted_logits, jnp.clip(k_row - 1, 0, v - 1)[:, None], axis=-1
    )
    scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

    # per-row nucleus over the top-k-FILTERED, renormalized distribution
    # (top-k then top-p, matching sample_tokens, which masks before
    # sorting — otherwise the same request samples from a different
    # distribution depending on batch composition)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (s, v), 1)
    in_k = ranks < k_row[:, None]
    sorted_masked = jnp.where(in_k, sorted_logits, -jnp.inf)
    probs = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (first always kept)
    keep = (cum - probs < jnp.minimum(top_p, 1.0)[:, None]) & in_k
    thresh = jnp.min(
        jnp.where(keep, sorted_masked, jnp.inf), axis=-1, keepdims=True
    )
    scaled = jnp.where(scaled < thresh, -jnp.inf, scaled)

    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(greedy, argmax, sampled)
