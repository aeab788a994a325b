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


def fbank_torch(
    waveform: torch.Tensor,
    sample_frequency: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    window_type: str = "hamming",
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    snip_edges: bool = True,
) -> torch.Tensor:
    """Pure-torch kaldi log-mel fbank per torchaudio.compliance.kaldi
    semantics (the surface funasr's WavFrontend calls — reference
    model.py:372-377): int16-scale waveform -> [T, num_mel_bins].

    Independent derivation of the kaldi pipeline — strided framing
    (snip_edges), DC removal, preemphasis with the first sample
    self-referenced, feature window, zero-pad to the next pow2, power
    spectrum, kaldi mel scale 1127*ln(1+f/700) triangles over
    [low_freq, nyquist], natural log with the float32-eps floor. Exists
    so `audio/frontend.py` is cross-checked against a torch-built
    reference rather than only its own numpy twin (torchaudio itself is
    not installed in this environment)."""
    wav = waveform.to(torch.float32).reshape(-1)
    ws = int(sample_frequency * frame_length / 1000)
    sh = int(sample_frequency * frame_shift / 1000)
    n = wav.numel()
    if snip_edges:
        m = 0 if n < ws else 1 + (n - ws) // sh
    else:
        raise NotImplementedError("snip_edges=False not needed")
    if m == 0:
        return torch.zeros(0, num_mel_bins)
    frames = wav.unfold(0, ws, sh)[:m].contiguous()  # [m, ws]

    if remove_dc_offset:
        frames = frames - frames.mean(dim=1, keepdim=True)
    if preemphasis_coefficient != 0.0:
        prev = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)
        frames = frames - preemphasis_coefficient * prev

    i = torch.arange(ws, dtype=torch.float64)
    a = 2.0 * torch.pi / (ws - 1)
    if window_type == "hamming":
        win = 0.54 - 0.46 * torch.cos(a * i)
    elif window_type == "hanning":
        win = 0.5 - 0.5 * torch.cos(a * i)
    elif window_type == "povey":
        win = (0.5 - 0.5 * torch.cos(a * i)).pow(0.85)
    elif window_type == "rectangular":
        win = torch.ones(ws, dtype=torch.float64)
    else:
        raise ValueError(window_type)
    frames = frames * win.to(torch.float32)

    n_fft = 1
    while n_fft < ws:
        n_fft *= 2
    spec = torch.fft.rfft(frames, n=n_fft, dim=1)
    power = spec.real.square() + spec.imag.square()  # [m, n_fft//2+1]

    # kaldi mel banks over the first n_fft//2 bins (nyquist excluded)
    nyq = 0.5 * sample_frequency
    hi = nyq + high_freq if high_freq <= 0.0 else high_freq

    def mel(f):
        return 1127.0 * torch.log1p(torch.as_tensor(f, dtype=torch.float64)
                                    / 700.0)

    fft_bins = mel(sample_frequency / n_fft
                   * torch.arange(n_fft // 2, dtype=torch.float64))
    mlo, mhi = mel(low_freq), mel(hi)
    delta = (mhi - mlo) / (num_mel_bins + 1)
    left = mlo + torch.arange(num_mel_bins, dtype=torch.float64)[:, None] * delta
    center, right = left + delta, left + 2 * delta
    up = (fft_bins[None] - left) / (center - left)
    down = (right - fft_bins[None]) / (right - center)
    banks = torch.clamp(torch.minimum(up, down), min=0.0).to(torch.float32)

    mel_e = power[:, : n_fft // 2] @ banks.T  # [m, num_mel_bins]
    eps = torch.finfo(torch.float32).eps
    return torch.log(torch.clamp(mel_e, min=eps))
