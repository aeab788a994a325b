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


# --------------------- funasr encoder/adaptor key space ---------------------
#
# The reference loads the audio encoder + adaptor from the funasr/ModelScope
# checkpoint (reference model.py:40-67, 112-124). funasr's SANM family
# (funasr/models/sanm + sense_voice) names parameters:
#
#   encoders0.0.self_attn.linear_q_k_v.{weight,bias}   Linear [3D, in]
#   encoders0.0.self_attn.fsmn_block.weight            Conv1d [D, 1, K]
#   encoders0.0.self_attn.linear_out.{weight,bias}     Linear [D, D]
#   encoders0.0.norm1.{weight,bias}  encoders0.0.norm2.{weight,bias}
#   encoders0.0.feed_forward.w_1.{weight,bias}         Linear [I, D]
#   encoders0.0.feed_forward.w_2.{weight,bias}         Linear [D, I]
#   encoders.{i}.…  (num_blocks-1 homogeneous layers)
#   after_norm.{weight,bias}
#   tp_encoders.{i}.… + tp_norm.{weight,bias}          (SenseVoiceEncoderSmall)
#
# torch Linear stores [out, in] → transpose to our [in, out]; Conv1d
# depthwise [D, 1, K] → our [K, D].


def _enc_layer_from_funasr(
    sd: Mapping[str, np.ndarray], prefix: str, dtype
) -> Dict[str, jnp.ndarray]:
    def g(name):
        return sd[prefix + name]

    def cast(x):
        return jnp.asarray(x).astype(dtype)

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    return {
        "ln1_scale": f32(g("norm1.weight")),
        "ln1_bias": f32(g("norm1.bias")),
        "w_qkv": cast(g("self_attn.linear_q_k_v.weight").T),
        "b_qkv": cast(g("self_attn.linear_q_k_v.bias")),
        "fsmn_kernel": cast(
            np.squeeze(g("self_attn.fsmn_block.weight"), axis=1).T
        ),
        "w_out": cast(g("self_attn.linear_out.weight").T),
        "b_out": cast(g("self_attn.linear_out.bias")),
        "ln2_scale": f32(g("norm2.weight")),
        "ln2_bias": f32(g("norm2.bias")),
        "w_ff1": cast(g("feed_forward.w_1.weight").T),
        "b_ff1": cast(g("feed_forward.w_1.bias")),
        "w_ff2": cast(g("feed_forward.w_2.weight").T),
        "b_ff2": cast(g("feed_forward.w_2.bias")),
    }


def _stack_trees(trees) -> Dict[str, jnp.ndarray]:
    return {
        k: jnp.stack([t[k] for t in trees]) for k in trees[0]
    }


def encoder_from_funasr_sd(
    sd: Mapping[str, np.ndarray], enc_cfg, prefix: str = ""
) -> Dict:
    """funasr SANM/SenseVoice encoder state_dict → models/encoder.py tree.

    `enc_cfg` is a SANMEncoderConfig; num_blocks/tp_blocks must match the
    checkpoint (a KeyError with the missing key is raised otherwise)."""
    dtype = enc_cfg.dtype
    p = prefix
    params = {
        "layer0": _enc_layer_from_funasr(sd, p + "encoders0.0.", dtype),
        "layers": _stack_trees([
            _enc_layer_from_funasr(sd, p + f"encoders.{i}.", dtype)
            for i in range(enc_cfg.num_blocks - 1)
        ]),
        "after_norm_scale": jnp.asarray(sd[p + "after_norm.weight"], jnp.float32),
        "after_norm_bias": jnp.asarray(sd[p + "after_norm.bias"], jnp.float32),
    }
    if enc_cfg.tp_blocks > 0:
        params["tp_layers"] = _stack_trees([
            _enc_layer_from_funasr(sd, p + f"tp_encoders.{i}.", dtype)
            for i in range(enc_cfg.tp_blocks)
        ])
        params["tp_norm_scale"] = jnp.asarray(sd[p + "tp_norm.weight"], jnp.float32)
        params["tp_norm_bias"] = jnp.asarray(sd[p + "tp_norm.bias"], jnp.float32)
    return params


# plausible funasr namings per adaptor field — the Fun-ASR-Nano adaptor
# class is not vendored in the reference repo, so the converter is
# alias-table-driven; extend the lists when the real checkpoint lands
_ADAPTOR_ALIASES = {
    "conv1": ("conv1d1", "conv1", "conv.0", "downsample.0", "cnn.0"),
    "conv2": ("conv1d2", "conv2", "conv.2", "downsample.2", "cnn.2"),
    "linear1": ("linear1", "w_1", "mlp.0", "fc1", "linear.0"),
    "linear2": ("linear2", "w_2", "mlp.2", "fc2", "linear.2"),
}


def adaptor_from_funasr_sd(
    sd: Mapping[str, np.ndarray], ad_cfg, prefix: str = ""
) -> Dict:
    """funasr adaptor state_dict → models/adaptor.py tree (two strided
    Conv1d + two Linear, reference token math model.py:391-396)."""
    dtype = ad_cfg.dtype

    def find(field):
        for alias in _ADAPTOR_ALIASES[field]:
            k = prefix + alias + ".weight"
            if k in sd:
                return sd[k], sd.get(prefix + alias + ".bias")
        avail = sorted(k for k in sd if k.startswith(prefix))
        raise KeyError(
            f"adaptor field {field!r}: none of {_ADAPTOR_ALIASES[field]} "
            f"found under prefix {prefix!r}; available: {avail[:20]}"
        )

    def cast(x):
        return jnp.asarray(x).astype(dtype)

    params = {}
    if ad_cfg.use_low_frame_rate:
        for field, (wk, bk) in (("conv1", ("conv1_w", "conv1_b")),
                                ("conv2", ("conv2_w", "conv2_b"))):
            w, b = find(field)
            # torch Conv1d [O, I, K] → lax (W, I, O)
            params[wk] = cast(np.transpose(w, (2, 1, 0)))
            params[bk] = cast(b if b is not None
                              else np.zeros(w.shape[0], np.float32))
    for field, (wk, bk) in (("linear1", ("w1", "b1")),
                            ("linear2", ("w2", "b2"))):
        w, b = find(field)
        params[wk] = cast(w.T)
        params[bk] = cast(b if b is not None
                          else np.zeros(w.shape[0], np.float32))
    return params


def nano_from_funasr_sd(
    sd: Mapping[str, np.ndarray], enc_cfg, ad_cfg, llm_cfg
) -> Tuple[Dict, Dict, Dict]:
    """Combined funasr FunASRNano state_dict → (enc, adaptor, llm) trees.

    The ModelScope checkpoint stores everything under `audio_encoder.*`,
    `audio_adaptor.*`, `llm.*` (HF naming below `llm.`,
    reference model.py:25-130 attribute names)."""
    enc = encoder_from_funasr_sd(sd, enc_cfg, prefix="audio_encoder.")
    ad = adaptor_from_funasr_sd(sd, ad_cfg, prefix="audio_adaptor.")
    llm = qwen3_from_state_dict(sd, llm_cfg, prefix="llm.")
    return enc, ad, llm


def nano_from_funasr(
    model_dir: str, enc_cfg, ad_cfg, llm_cfg, dtype=jnp.bfloat16
) -> Tuple[Dict, Dict, Dict]:
    """`nano_from_funasr_sd` over a checkpoint dir's model.pt."""
    return nano_from_funasr_sd(load_state_dict(model_dir), enc_cfg, ad_cfg,
                               llm_cfg)


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


# --------------------- Qwen3-ASR checkpoint layout --------------------------
#
# The reference's data factory transcribes with a dedicated Qwen3-ASR-1.7B
# model via the `qwen_asr` package (reference simple_audio_processor.py:791-822
# `self.asr_model.transcribe(audio=[...], language=[...])`;
# run_audio_cat_cut.py:566 `from qwen_asr import Qwen3ASRModel`,
# :603-609 `Qwen3ASRModel.from_pretrained("./Qwen/Qwen3-ASR-1.7B")`).
# Architecturally it is an audio tower + projector feeding a Qwen3-1.7B
# decoder — the decoder is exactly the Qwen3 layout `qwen3_from_state_dict`
# already covers (hidden 2048 / 28 layers / 16q+8kv heads / inter 6144),
# under a multimodal key prefix. This converter resolves the prefix, maps
# the decoder, and maps the audio tower when it matches the Fun-ASR
# SANM-encoder/adaptor contract; an incompatible tower raises a loud
# NotImplementedError naming the seam instead of silently degrading.

# decoder keys live at <prefix>model.layers.* in the multimodal checkpoint
QWEN3_ASR_DECODER_PREFIXES = ("", "thinker.", "language_model.", "decoder.",
                              "llm.")
QWEN3_ASR_AUDIO_PREFIXES = ("audio_encoder.", "audio_tower.",
                            "thinker.audio_encoder.", "thinker.audio_tower.")
QWEN3_ASR_ADAPTOR_PREFIXES = ("audio_adaptor.", "multi_modal_projector.",
                              "projector.", "thinker.audio_adaptor.")


def read_hf_config(model_dir: str) -> Optional[Dict]:
    path = os.path.join(model_dir, "config.json")
    if not os.path.exists(path):
        return None
    import json

    with open(path, encoding="utf-8") as f:
        return json.load(f)


def is_qwen3_asr_dir(model_dir: str) -> bool:
    """A Qwen3-ASR-style checkpoint dir: HF config.json whose model_type
    names qwen3 + asr/audio/omni, no funasr config.yaml."""
    if os.path.exists(os.path.join(model_dir, "config.yaml")):
        return False
    cfg = read_hf_config(model_dir)
    if not cfg:
        return False
    mt = str(cfg.get("model_type", "")).lower().replace("-", "_")
    return mt.startswith("qwen3_asr") or (
        "qwen3" in mt and ("audio" in mt or "omni" in mt)
    )


def qwen3_asr_decoder_config(cfg: Dict, dtype=jnp.bfloat16) -> Qwen3Config:
    """Resolve the decoder sub-config (flat, or nested under
    text_config/thinker_config/llm_config) → Qwen3Config."""
    dec = cfg
    for key in ("text_config", "thinker_config", "llm_config"):
        if isinstance(cfg.get(key), dict):
            dec = cfg[key]
            # thinker_config may nest once more
            if isinstance(dec.get("text_config"), dict):
                dec = dec["text_config"]
            break
    return Qwen3Config.from_hf_dict(dec, dtype=dtype)


def qwen3_asr_from_pretrained(
    model_dir: str, dtype=jnp.bfloat16
) -> Tuple[Optional[Dict], Optional[Dict], Dict,
           Optional[Any], Optional[Any], Qwen3Config]:
    """Qwen3-ASR checkpoint dir → (enc, adaptor, llm) params + configs.

    Returns (enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg);
    enc/ad are None when the checkpoint carries no Fun-ASR-shaped audio
    tower configuration (audio_encoder_conf/audio_adaptor_conf keys)."""
    cfg = read_hf_config(model_dir)
    if cfg is None:
        raise FileNotFoundError(f"no config.json in {model_dir}")
    llm_cfg = qwen3_asr_decoder_config(cfg, dtype=dtype)
    sd = load_state_dict(model_dir)

    prefix = next(
        (p for p in QWEN3_ASR_DECODER_PREFIXES
         if p + "model.embed_tokens.weight" in sd), None)
    if prefix is None:
        raise KeyError(
            "no Qwen3 decoder found: tried prefixes "
            f"{QWEN3_ASR_DECODER_PREFIXES} + 'model.embed_tokens.weight'; "
            f"checkpoint keys start with: "
            f"{sorted({k.split('.', 1)[0] for k in sd})}"
        )
    llm = qwen3_from_state_dict(sd, llm_cfg, prefix=prefix)

    enc = ad = enc_cfg = ad_cfg = None
    audio_prefix = next(
        (p for p in QWEN3_ASR_AUDIO_PREFIXES
         if any(k.startswith(p) for k in sd)), None)
    if audio_prefix is not None:
        enc_conf = cfg.get("audio_encoder_conf")
        ad_conf = cfg.get("audio_adaptor_conf")
        if not enc_conf:
            raise NotImplementedError(
                f"{model_dir} carries an audio tower under "
                f"{audio_prefix!r} but no Fun-ASR-style "
                "audio_encoder_conf in config.json — a non-SANM tower "
                "(e.g. a Whisper-style AuT encoder) needs its own JAX "
                "graph; this converter covers the SANM-shaped tower only"
            )
        from . import adaptor as adaptor_mod
        from . import encoder as encoder_mod

        enc_cfg = encoder_mod.SANMEncoderConfig.from_conf(
            enc_conf, input_size=cfg.get("input_size", 80), dtype=dtype)
        ad_cfg = adaptor_mod.NanoAdaptorConfig.from_conf(
            ad_conf or {}, dtype=dtype)
        import dataclasses as _dc

        ad_cfg = _dc.replace(
            ad_cfg, encoder_dim=enc_cfg.output_size,
            llm_dim=llm_cfg.hidden_size)
        enc = encoder_from_funasr_sd(sd, enc_cfg, prefix=audio_prefix)
        adaptor_prefix = next(
            (p for p in QWEN3_ASR_ADAPTOR_PREFIXES
             if any(k.startswith(p) for k in sd)), None)
        if adaptor_prefix is None:
            raise KeyError(
                "audio tower present but no adaptor/projector under "
                f"{QWEN3_ASR_ADAPTOR_PREFIXES}")
        ad = adaptor_from_funasr_sd(sd, ad_cfg, prefix=adaptor_prefix)
    return enc, ad, llm, enc_cfg, ad_cfg, llm_cfg
