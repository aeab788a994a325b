"""Torch mini-references of the funasr modules Fun-ASR-Nano is built from.

These implement funasr's SANM-encoder / adaptor semantics exactly as
documented in funasr/models/sanm/{encoder,attention}.py (ESPnet lineage:
LayerNorm eps=1e-12, scores scaled by d_k**-0.5, fsmn memory joined AFTER
linear_out, sanm_shift as extra left padding) with the checkpoint's module
naming, so a `.state_dict()` of these modules IS a synthetic funasr-format
checkpoint fragment (reference model.py:40-67, 112-124). Used by
`tests/test_convert.py` (per-module conversion parity),
`tests/test_convert_full_checkpoint.py` (full-checkpoint round-trip) and
`tools/check_checkpoint.py --fabricate`.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


class SANMAttnRef(nn.Module):
    """funasr MultiHeadedAttentionSANM semantics."""

    def __init__(self, in_feat, n_feat, n_head, kernel_size, sanm_shift=0):
        super().__init__()
        self.linear_q_k_v = nn.Linear(in_feat, 3 * n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.fsmn_block = nn.Conv1d(
            n_feat, n_feat, kernel_size, groups=n_feat, bias=False
        )
        left = (kernel_size - 1) // 2 + sanm_shift
        self.pad_fn = nn.ConstantPad1d((left, kernel_size - 1 - left), 0.0)
        self.h, self.d_k = n_head, n_feat // n_head

    def forward(self, x, mask):  # mask [B, T] float 1/0
        b, t, _ = x.shape
        q, k, v = self.linear_q_k_v(x).chunk(3, dim=-1)
        inputs = v * mask[..., None]
        mem = self.fsmn_block(self.pad_fn(inputs.transpose(1, 2))).transpose(1, 2)
        mem = (mem + inputs) * mask[..., None]
        q_h = q.view(b, t, self.h, self.d_k).transpose(1, 2) * self.d_k ** -0.5
        k_h = k.view(b, t, self.h, self.d_k).transpose(1, 2)
        v_h = v.view(b, t, self.h, self.d_k).transpose(1, 2)
        scores = q_h @ k_h.transpose(-2, -1)
        neg = torch.finfo(scores.dtype).min
        scores = scores.masked_fill(~mask.bool()[:, None, None, :], neg)
        att = (scores.softmax(-1) @ v_h).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(att) + mem


class EncoderLayerRef(nn.Module):
    """funasr EncoderLayerSANM, normalize_before=True."""

    def __init__(self, in_size, size, linear_units, n_head, kernel_size,
                 sanm_shift=0):
        super().__init__()
        self.self_attn = SANMAttnRef(in_size, size, n_head, kernel_size,
                                     sanm_shift)
        self.feed_forward = nn.Sequential()
        self.feed_forward.w_1 = nn.Linear(size, linear_units)
        self.feed_forward.w_2 = nn.Linear(linear_units, size)
        self.norm1 = nn.LayerNorm(in_size, eps=1e-12)
        self.norm2 = nn.LayerNorm(size, eps=1e-12)
        self.in_size, self.size = in_size, size

    def forward(self, x, mask):
        residual = x
        x = self.self_attn(self.norm1(x), mask)
        if self.in_size == self.size:
            x = residual + x
        residual = x
        h = torch.relu(self.feed_forward.w_1(self.norm2(x)))
        return residual + self.feed_forward.w_2(h)


class SANMEncoderRef(nn.Module):
    """funasr SANMEncoder / SenseVoiceEncoderSmall layout + naming."""

    def __init__(self, input_size, d, n_head, linear_units, num_blocks,
                 kernel_size, sanm_shift=0, tp_blocks=0):
        super().__init__()
        self.d = d
        self.encoders0 = nn.ModuleList(
            [EncoderLayerRef(input_size, d, linear_units, n_head,
                             kernel_size, sanm_shift)]
        )
        self.encoders = nn.ModuleList(
            [EncoderLayerRef(d, d, linear_units, n_head, kernel_size,
                             sanm_shift) for _ in range(num_blocks - 1)]
        )
        self.after_norm = nn.LayerNorm(d, eps=1e-12)
        self.tp_blocks = tp_blocks
        if tp_blocks:
            self.tp_encoders = nn.ModuleList(
                [EncoderLayerRef(d, d, linear_units, n_head, kernel_size,
                                 sanm_shift) for _ in range(tp_blocks)]
            )
            self.tp_norm = nn.LayerNorm(d, eps=1e-12)

    def forward(self, x, lens):
        from fun_asr_vllm_tpu.models import encoder as encoder_mod

        b, t, dim = x.shape
        x = x * self.d ** 0.5
        pe = torch.from_numpy(encoder_mod.sinusoidal_positions(t, dim))
        x = x + pe[None]
        mask = (torch.arange(t)[None, :] < lens[:, None]).float()
        for layer in self.encoders0:
            x = layer(x, mask)
        for layer in self.encoders:
            x = layer(x, mask)
        x = self.after_norm(x)
        if self.tp_blocks:
            for layer in self.tp_encoders:
                x = layer(x, mask)
            x = self.tp_norm(x)
        return x


class AdaptorRef(nn.Module):
    """Two strided Conv1d (k=3, s=2, p=1) + ::2 subsample + 2-layer MLP —
    the reference token math (model.py:391-396)."""

    def __init__(self, e, llm_dim, ffn_dim):
        super().__init__()
        self.conv1d1 = nn.Conv1d(e, e, 3, stride=2, padding=1)
        self.conv1d2 = nn.Conv1d(e, e, 3, stride=2, padding=1)
        self.linear1 = nn.Linear(e, ffn_dim)
        self.linear2 = nn.Linear(ffn_dim, llm_dim)

    def forward(self, x):
        x = torch.relu(self.conv1d1(x.transpose(1, 2)))
        x = torch.relu(self.conv1d2(x)).transpose(1, 2)
        x = x[:, ::2]
        return self.linear2(torch.relu(self.linear1(x)))


# Every plausible funasr naming of the adaptor modules, keyed by variant
# name; mirrors models/convert.py `_ADAPTOR_ALIASES` so the converter's
# whole alias table is exercisable against fabricated checkpoints.
ADAPTOR_NAMINGS = {
    "conv1d1": {"conv1d1": "conv1d1", "conv1d2": "conv1d2",
                "linear1": "linear1", "linear2": "linear2"},
    "conv_w": {"conv1d1": "conv1", "conv1d2": "conv2",
               "linear1": "w_1", "linear2": "w_2"},
    "seq_conv_mlp": {"conv1d1": "conv.0", "conv1d2": "conv.2",
                     "linear1": "mlp.0", "linear2": "mlp.2"},
    "downsample_fc": {"conv1d1": "downsample.0", "conv1d2": "downsample.2",
                      "linear1": "fc1", "linear2": "fc2"},
    "cnn_linear": {"conv1d1": "cnn.0", "conv1d2": "cnn.2",
                   "linear1": "linear.0", "linear2": "linear.2"},
}


def rename_adaptor_sd(sd, naming: str):
    """Rename a canonical AdaptorRef state_dict into one of the funasr
    naming variants from ADAPTOR_NAMINGS."""
    table = ADAPTOR_NAMINGS[naming]
    out = {}
    for k, v in sd.items():
        module, _, leaf = k.rpartition(".")
        out[table[module] + "." + leaf] = v
    return out


def sd_np(module: nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
