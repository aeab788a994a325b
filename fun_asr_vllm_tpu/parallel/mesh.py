"""Device mesh construction and parameter sharding rules."""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)
_warned_int4_replicate = False


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    """(dp, tp) mesh over available devices; dp defaults to n_devices/tp.

    tp is laid out innermost so tensor-parallel collectives ride the
    fastest ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != devices({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def qwen3_param_sharding(mesh: Mesh) -> Dict:
    """PartitionSpecs for the stacked Qwen3 param tree (models/qwen3.py).

    Megatron pattern: attention/MLP input projections column-parallel
    (output features over `tp`), output projections row-parallel (input
    features over `tp`); embeddings sharded over vocab; norms replicated.
    Leading stacked-layer dim is never sharded."""
    specs = {
        "embed": P("tp", None),
        "final_norm": P(),
        "layers": {
            "input_ln": P(None, None),
            "post_ln": P(None, None),
            "wqkv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "w_gateup": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        },
    }
    return specs


def encoder_param_sharding(mesh: Mesh) -> Dict:
    """SAN-M encoder (models/encoder.py): FFN column/row pairs over `tp`;
    fused qkv projection column-parallel; everything else replicated."""
    def layer(stacked: bool):
        lead = (None,) if stacked else ()
        return {
            "ln1_scale": P(*lead, None), "ln1_bias": P(*lead, None),
            "w_qkv": P(*lead, None, "tp"), "b_qkv": P(*lead, "tp"),
            "fsmn_kernel": P(*lead, None, "tp"),
            "w_out": P(*lead, "tp", None), "b_out": P(*lead, None),
            "ln2_scale": P(*lead, None), "ln2_bias": P(*lead, None),
            "w_ff1": P(*lead, None, "tp"), "b_ff1": P(*lead, "tp"),
            "w_ff2": P(*lead, "tp", None), "b_ff2": P(*lead, None),
        }

    return {
        "layer0": layer(False),
        "layers": layer(True),
        "after_norm_scale": P(), "after_norm_bias": P(),
        # optional SenseVoiceEncoderSmall trailing stage
        "tp_layers": layer(True),
        "tp_norm_scale": P(), "tp_norm_bias": P(),
    }


def adaptor_param_sharding(mesh: Mesh) -> Dict:
    return {
        "conv1_w": P(None, None, None), "conv1_b": P(),
        "conv2_w": P(None, None, None), "conv2_b": P(),
        "w1": P(None, "tp"), "b1": P("tp"),
        "w2": P("tp", None), "b2": P(),
    }


def shard_params(mesh: Mesh, params: Dict, specs: Dict) -> Dict:
    """Place a param tree on the mesh according to a parallel spec tree
    (recursive zip — PartitionSpec is a tuple subclass, so jax.tree.map
    would wrongly traverse it).

    int8 weight-only quantized leaves ({"q", "scale"}, models/qwen3.py)
    take the weight's spec on `q`; the per-channel `scale` inherits only
    the axes whose sizes match (broadcast size-1 dims stay replicated)."""
    if isinstance(params, dict):
        if set(params) == {"q4", "scale4"} and not isinstance(specs, dict):
            # grouped int4 leaf: the weight's (.., in, out) spec maps to
            # q4 [.., G, gs/2, out] (nibble-packed) — the input-dim axis
            # shards the GROUP dim (the packed gs/2 stays whole), out
            # keeps its axis; scale4 [.., G, 1, out] follows with the
            # size-1 dim replicated
            q, scale = params["q4"], params["scale4"]
            wspec = tuple(specs) + (None,) * ((q.ndim - 1) - len(tuple(specs)))
            # the group dim G = in/group_size is much smaller than the
            # input dim it stands in for — a tp size that divides `in`
            # need not divide G (e.g. tp=16, in=3072 → G=24). Replicate
            # the group dim when it doesn't split evenly rather than
            # failing at device_put.
            gax = wspec[-2]
            if gax is not None:
                names = (gax,) if isinstance(gax, str) else tuple(gax)
                nshards = 1
                for nm in names:
                    nshards *= mesh.shape[nm]
                if q.shape[-3] % nshards != 0:
                    global _warned_int4_replicate
                    if not _warned_int4_replicate:
                        _warned_int4_replicate = True
                        logger.warning(
                            "int4 group dim G=%d is not divisible by the "
                            "tp shard count %d — q4/scale4 are REPLICATED "
                            "on every device for this layer shape, losing "
                            "the weight-sharding memory benefit; use a "
                            "group_size whose G divides the tp size",
                            q.shape[-3], nshards,
                        )
                    gax = None
            qspec = P(*wspec[:-2], gax, None, wspec[-1])
            sspec = P(*wspec[:-2], gax, None, wspec[-1])
            return {
                "q4": jax.device_put(q, NamedSharding(mesh, qspec)),
                "scale4": jax.device_put(scale, NamedSharding(mesh, sspec)),
            }
        if set(params) == {"q", "scale"} and not isinstance(specs, dict):
            q, scale = params["q"], params["scale"]
            full = tuple(specs) + (None,) * (q.ndim - len(tuple(specs)))
            sspec = P(*[
                ax if scale.shape[i] == q.shape[i] else None
                for i, ax in enumerate(full[: scale.ndim])
            ])
            return {
                "q": jax.device_put(q, NamedSharding(mesh, P(*full))),
                "scale": jax.device_put(scale, NamedSharding(mesh, sspec)),
            }
        return {k: shard_params(mesh, v, specs[k]) for k, v in params.items()}
    return jax.device_put(params, NamedSharding(mesh, specs))


def spec_tree_like(params: Dict, specs: Dict):
    """Return specs aligned to params (validates structure)."""
    if isinstance(params, dict):
        return {k: spec_tree_like(v, specs[k]) for k, v in params.items()}
    return specs


def lora_param_sharding(lora_params: Dict) -> Dict:
    """PartitionSpecs for a LoRA adapter tree (parallel/lora.py layout
    {"layers": {"<t>_lora_A": [L,in,r], "<t>_lora_B": [L,r,out]}}).

    Follows the base weight's Megatron axis so the in-graph merge
    W + A@B adds like-sharded tensors: column-parallel targets
    (wqkv/w_gateup, out over tp) shard B's out dim; row-parallel targets
    (wo/w_down, in over tp) shard A's in dim; everything else replicates
    (rank dims are tiny)."""
    col = {"wqkv", "w_gateup"}
    row = {"wo", "w_down"}
    layers = {}
    for name in lora_params["layers"]:
        t = name.rsplit("_lora_", 1)[0]
        if name.endswith("_lora_A") and t in row:
            layers[name] = P(None, "tp", None)
        elif name.endswith("_lora_B") and t in col:
            layers[name] = P(None, None, "tp")
        else:
            layers[name] = P(None, None, None)
    return {"layers": layers}
