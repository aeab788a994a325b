"""Checkpoint conversion: HF/funasr torch weights → JAX param pytrees.

The reference builds its decoder from an HF checkpoint dir
(reference model.py:74-75 `AutoModelForCausalLM.from_config` +
`init_param_path`) and its encoder/adaptor from a funasr `model.pt`
(reference model.py:57-59, 112-124). This module maps those state_dicts
onto the stacked-layer layouts used by `models/qwen3.py`,
`models/encoder.py` and `models/adaptor.py`.

torch is only needed when actually converting (CPU build is in the image);
safetensors checkpoints load without torch.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .qwen3 import Qwen3Config


def _to_np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16) without importing torch at module scope
    if hasattr(t, "detach"):
        t = t.detach()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a checkpoint dir: *.safetensors preferred,
    falling back to torch model.pt / pytorch_model.bin."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open

        for fn in st_files:
            with safe_open(os.path.join(model_dir, fn), framework="np") as f:
                for k in f.keys():
                    tensors[k] = f.get_tensor(k)
        return tensors
    for fn in ("model.pt", "pytorch_model.bin", "model.safetensors.index.json"):
        path = os.path.join(model_dir, fn)
        if os.path.exists(path) and fn.endswith((".pt", ".bin")):
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            return {k: _to_np(v) for k, v in sd.items()}
    raise FileNotFoundError(f"no checkpoint files in {model_dir}")


def _stack(sd: Mapping[str, np.ndarray], fmt: str, n: int,
           transpose: bool = False) -> jnp.ndarray:
    mats = [sd[fmt.format(i)] for i in range(n)]
    if transpose:
        mats = [m.T for m in mats]
    return jnp.asarray(np.stack(mats))


def qwen3_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Qwen3Config, prefix: str = ""
) -> Dict:
    """HF Qwen3ForCausalLM state_dict → stacked param tree.

    torch Linear stores [out, in]; our layout is [in, out], hence the
    transposes. Accepts an optional key prefix (e.g. ``llm.`` for the
    combined FunASRNano checkpoint)."""
    p = prefix
    L = cfg.num_hidden_layers

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    def cast(x):
        return x.astype(cfg.dtype)

    wq = _stack(sd, p + "model.layers.{}.self_attn.q_proj.weight", L, True)
    wk = _stack(sd, p + "model.layers.{}.self_attn.k_proj.weight", L, True)
    wv = _stack(sd, p + "model.layers.{}.self_attn.v_proj.weight", L, True)
    w_gate = _stack(sd, p + "model.layers.{}.mlp.gate_proj.weight", L, True)
    w_up = _stack(sd, p + "model.layers.{}.mlp.up_proj.weight", L, True)
    layers = {
        "input_ln": f32(_stack(sd, p + "model.layers.{}.input_layernorm.weight", L)),
        "post_ln": f32(
            _stack(sd, p + "model.layers.{}.post_attention_layernorm.weight", L)
        ),
        # fused projections (models/qwen3.py layout): [H, (Nq+2Nkv)D], [H, 2I]
        "wqkv": cast(jnp.concatenate([wq, wk, wv], axis=-1)),
        "wo": cast(
            _stack(sd, p + "model.layers.{}.self_attn.o_proj.weight", L, True)
        ),
        "q_norm": f32(_stack(sd, p + "model.layers.{}.self_attn.q_norm.weight", L)),
        "k_norm": f32(_stack(sd, p + "model.layers.{}.self_attn.k_norm.weight", L)),
        "w_gateup": cast(jnp.concatenate([w_gate, w_up], axis=-1)),
        "w_down": cast(
            _stack(sd, p + "model.layers.{}.mlp.down_proj.weight", L, True)
        ),
    }
    params = {
        "embed": cast(jnp.asarray(sd[p + "model.embed_tokens.weight"])),
        "final_norm": f32(jnp.asarray(sd[p + "model.norm.weight"])),
        "layers": layers,
    }
    head_key = p + "lm_head.weight"
    if head_key in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = cast(jnp.asarray(sd[head_key]).T)
    return params


def qwen3_from_pretrained(model_dir: str, dtype=jnp.bfloat16,
                          lora_dir: str = None):
    cfg = Qwen3Config.from_pretrained(model_dir, dtype=dtype)
    sd = load_state_dict(model_dir)
    if lora_dir:
        lora_sd, scaling = load_lora_dir(lora_dir)
        sd = merge_lora(sd, lora_sd, scaling=scaling)
    return qwen3_from_state_dict(sd, cfg), cfg


def subdict(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def merge_lora(
    sd: Dict[str, np.ndarray],
    lora_sd: Mapping[str, np.ndarray],
    scaling: Optional[float] = None,
    alpha: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Merge PEFT LoRA weights into a base state_dict (inference-time
    equivalent of the reference's `PeftModel.from_pretrained`,
    reference model.py:91-98): W ← W + scaling · B @ A.

    PEFT names adapters
    ``base_model.model.<module>.lora_A.weight`` / ``...lora_B.weight``
    (optionally with a ``.default`` adapter segment); `scaling` defaults to
    alpha / r inferred from the A matrix rank when `alpha` is given,
    else 1.0."""
    merged = dict(sd)
    a_mats: Dict[str, np.ndarray] = {}
    b_mats: Dict[str, np.ndarray] = {}
    for key, val in lora_sd.items():
        k = key.replace("base_model.model.", "").replace(".default", "")
        if ".lora_A." in k:
            a_mats[k.split(".lora_A.")[0]] = _to_np(val)
        elif ".lora_B." in k:
            b_mats[k.split(".lora_B.")[0]] = _to_np(val)
    for module, a in a_mats.items():
        b = b_mats.get(module)
        if b is None:
            continue
        base_key = module + ".weight"
        if base_key not in merged:
            logging_key = module
            raise KeyError(f"LoRA target {logging_key!r} not in base weights")
        r = a.shape[0]
        s = scaling if scaling is not None else (
            (alpha / r) if alpha is not None else 1.0
        )
        merged[base_key] = (
            merged[base_key].astype(np.float32) + s * (b @ a)
        ).astype(merged[base_key].dtype)
    return merged


def load_lora_dir(lora_dir: str) -> Tuple[Dict[str, np.ndarray], Optional[float]]:
    """Load a PEFT adapter dir → (state_dict, scaling from its config)."""
    import json

    sd = load_state_dict(lora_dir)
    scaling = None
    cfg_path = os.path.join(lora_dir, "adapter_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        if c.get("r"):
            scaling = c.get("lora_alpha", c["r"]) / c["r"]
    return sd, scaling
