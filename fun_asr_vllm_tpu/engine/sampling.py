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
