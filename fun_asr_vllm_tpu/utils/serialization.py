"""Param pytree ↔ safetensors serialization (our native checkpoint format).

Trees are flattened with '/'-joined keys. Arrays are stored float32 (or
original integer dtype) and cast to the component dtype on load — keeps
files framework-neutral and avoids bf16-in-numpy headaches.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            arr = np.asarray(v, dtype=np.float32) if jnp.issubdtype(
                jnp.asarray(v).dtype, jnp.floating
            ) else np.asarray(v)
            out[key] = arr
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_params(path: str, tree: Dict) -> None:
    from safetensors.numpy import save_file

    save_file(flatten_tree(tree), path)


def load_params(path: str, dtype=None) -> Dict:
    from safetensors.numpy import load_file

    flat = load_file(path)
    if dtype is not None:
        flat = {
            k: (jnp.asarray(v, dtype) if np.issubdtype(v.dtype, np.floating)
                else jnp.asarray(v))
            for k, v in flat.items()
        }
    else:
        flat = {k: jnp.asarray(v) for k, v in flat.items()}
    return unflatten_tree(flat)


def cast_tree(tree: Dict, dtype, norm_keys=("ln", "norm")) -> Dict:
    """Cast floating arrays to `dtype`, keeping *norm* params in f32."""
    def _cast(key, v):
        if isinstance(v, dict):
            return {k: _cast(k, x) for k, x in v.items()}
        arr = jnp.asarray(v)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            return arr
        if any(nk in key for nk in norm_keys):
            return arr.astype(jnp.float32)
        return arr.astype(dtype)

    return {k: _cast(k, v) for k, v in tree.items()}
