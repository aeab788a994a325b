"""LoRA adapters for the stacked Qwen3 decoder (training + merge).

The reference supports LoRA finetuning of the (otherwise frozen) LLM via
PEFT (`use_lora`/`lora_conf`, reference model.py:83-102). Here adapters
are a small separate param tree over the STACKED layer weights
(models/qwen3.py layout: every projection is [L, in, out]):

    {"layers": {"<target>_lora_A": [L, in, r],
                "<target>_lora_B": [L, r, out]}}

and the merge is an in-graph fold ``W + scale * A @ B`` applied by the
train step's param transform — the base weights stay frozen constants,
gradients flow only through the adapters, and XLA fuses the rank-r
update into the forward matmuls. PEFT convention at init: A gaussian,
B zero, so step 0 is exactly the base model.

Targets are the stacked leaf names: wqkv, wo (attention, the reference
lora_conf's q/k/v/o_proj equivalent), w_gateup, w_down (MLP).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: stacked-layer projection leaves LoRA can target
TARGETS = ("wqkv", "wo", "w_gateup", "w_down")


def init_lora_params(
    llm_params: Dict,
    targets: Iterable[str],
    rank: int,
    key: jax.Array,
    dtype=jnp.float32,
) -> Dict:
    """Adapter tree for `targets`; A ~ N(0, 1/r), B = 0 (delta-zero init)."""
    layers = {}
    for t in targets:
        if t not in TARGETS:
            raise ValueError(f"unknown LoRA target {t!r}; pick from {TARGETS}")
        w = llm_params["layers"][t]
        nl, d_in, d_out = w.shape
        key, ka = jax.random.split(key)
        layers[f"{t}_lora_A"] = (
            jax.random.normal(ka, (nl, d_in, rank), dtype) / np.sqrt(rank)
        )
        layers[f"{t}_lora_B"] = jnp.zeros((nl, rank, d_out), dtype)
    return {"layers": layers}


def apply_lora(llm_params: Dict, lora_params: Dict, scale: float) -> Dict:
    """Base → merged LLM tree: W ← W + scale · A @ B per targeted leaf.

    Pure function of arrays — safe inside jit (the train step folds it
    into the forward) and usable eagerly for export."""
    layers = dict(llm_params["layers"])
    adapters = lora_params["layers"]
    for name, a in adapters.items():
        if not name.endswith("_lora_A"):
            continue
        t = name[: -len("_lora_A")]
        b = adapters[f"{t}_lora_B"]
        w = layers[t]
        delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32),
                           b.astype(jnp.float32))
        layers[t] = (w.astype(jnp.float32) + scale * delta).astype(w.dtype)
    out = dict(llm_params)
    out["layers"] = layers
    return out


def lora_scale(rank: int, alpha: float) -> float:
    return float(alpha) / float(rank)


# ---------------------------------------------------------------------------
# adapter file format: <dir>/lora.safetensors + <dir>/lora_meta.json

LORA_WEIGHTS = "lora.safetensors"
LORA_META = "lora_meta.json"


def save_lora(model_dir: str, lora_params: Dict, *, rank: int, alpha: float,
              targets: Iterable[str]) -> None:
    from ..utils.serialization import save_params

    os.makedirs(model_dir, exist_ok=True)
    save_params(os.path.join(model_dir, LORA_WEIGHTS),
                {"llm_lora": lora_params})
    with open(os.path.join(model_dir, LORA_META), "w") as f:
        json.dump({"rank": rank, "alpha": alpha,
                   "targets": list(targets)}, f, indent=2)


def load_lora(model_dir: str) -> Optional[Tuple[Dict, Dict]]:
    """→ (adapter tree, meta) or None when the dir carries no adapter."""
    path = os.path.join(model_dir, LORA_WEIGHTS)
    if not os.path.exists(path):
        return None
    from ..utils.serialization import load_params

    tree = load_params(path)["llm_lora"]
    meta = {"rank": None, "alpha": None, "targets": None}
    meta_path = os.path.join(model_dir, LORA_META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    if meta["rank"] is None:
        any_a = next(k for k in tree["layers"] if k.endswith("_lora_A"))
        meta["rank"] = int(tree["layers"][any_a].shape[-1])
    if meta["alpha"] is None:
        meta["alpha"] = float(meta["rank"])
    return tree, meta


def maybe_merge_lora_dir(model_dir: str, llm_params: Dict) -> Dict:
    """Fold a `lora.safetensors` adapter sitting next to the weights into
    the LLM tree (load-time analogue of the reference's
    PeftModel.from_pretrained, model.py:91-98). No adapter → unchanged."""
    loaded = load_lora(model_dir)
    if loaded is None:
        return llm_params
    tree, meta = loaded
    return apply_lora(llm_params, tree,
                      lora_scale(meta["rank"], meta["alpha"]))
