"""Sharded training step for FunASRNano (the reference `forward` loss path).

The reference keeps a teacher-forcing loss path with token-accuracy stats
(reference model.py:132-248: scatter audio embeddings at `fbank_beg` into
the token-embedding sequence, causal LM cross-entropy over labels with
-100 masking, `force_gatherable` packaging for torch DataParallel at
model.py:245-248). Here the same computation is a single pjit-compiled
step over a (dp, tp) mesh: batch sharded over `dp`, decoder/encoder
weights over `tp` (parallel/mesh.py rules), XLA inserting the collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import adaptor as adaptor_mod
from ..models import encoder as encoder_mod
from ..models import qwen3 as qwen3_mod


class NanoConfigs(NamedTuple):
    encoder: encoder_mod.SANMEncoderConfig
    adaptor: adaptor_mod.NanoAdaptorConfig
    llm: qwen3_mod.Qwen3Config


def splice_audio_embeds(
    token_embeds: jax.Array,  # [B, L, H]
    audio_embeds: jax.Array,  # [B, Ta, H]
    audio_lens: jax.Array,  # [B]
    fbank_beg: jax.Array,  # [B] start offset of the audio span per item
) -> jax.Array:
    """Vectorized audio-span scatter (reference model.py:513-541, done there
    with a python loop + in-place tensor writes; here a masked gather —
    identical result, jit/TPU-friendly)."""
    b, l, h = token_embeds.shape
    ta = audio_embeds.shape[1]
    rel = jnp.arange(l)[None, :] - fbank_beg[:, None]  # [B, L]
    in_span = (rel >= 0) & (rel < audio_lens[:, None])
    gathered = jnp.take_along_axis(
        audio_embeds, jnp.clip(rel, 0, ta - 1)[:, :, None], axis=1
    )
    return jnp.where(in_span[:, :, None], gathered, token_embeds)


def nano_loss(
    params: Dict,
    cfgs: NanoConfigs,
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Teacher-forcing loss + stats (reference model.py:199-243 stats dict:
    loss, token accuracy, batch/padding token counts)."""
    enc_out, enc_lens = encoder_mod.encode(
        params["audio_encoder"], cfgs.encoder,
        batch["speech"], batch["speech_lengths"],
    )
    audio, audio_lens = adaptor_mod.forward(
        params["audio_adaptor"], cfgs.adaptor, enc_out, enc_lens
    )
    input_ids = jnp.maximum(batch["input_ids"], 0)
    embeds = qwen3_mod.embed_tokens(params["llm"], input_ids).astype(
        cfgs.llm.dtype
    )
    embeds = splice_audio_embeds(
        embeds, audio.astype(cfgs.llm.dtype), audio_lens, batch["fbank_beg"]
    )
    b, l, _ = embeds.shape
    pos = jnp.broadcast_to(jnp.arange(l)[None, :], (b, l))
    hidden, _ = qwen3_mod.forward_hidden(
        params["llm"], cfgs.llm, embeds, pos,
        attn_lengths=batch["attention_lengths"],
    )
    logits = qwen3_mod.lm_logits(params["llm"], cfgs.llm, hidden)  # [B,L,V] f32

    labels = batch["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = (shift_labels != -100).astype(jnp.float32)
    safe_labels = jnp.maximum(shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = -(token_logp * mask).sum() / denom

    preds = jnp.argmax(shift_logits, axis=-1)
    acc = ((preds == safe_labels) * mask).sum() / denom
    # full training-stats parity (reference model.py:200-243)
    dialog_turns = (batch["fbank_beg"] > 0).astype(jnp.float32)
    real_tokens = batch["attention_lengths"].sum().astype(jnp.float32)
    frames_total = jnp.asarray(
        batch["speech"].shape[0] * batch["speech"].shape[1], jnp.float32
    )
    real_frames = batch["speech_lengths"].sum().astype(jnp.float32)
    stats = {
        "loss": loss,
        "acc": acc,
        "batch_tokens": mask.sum(),
        "total_tokens": jnp.asarray(mask.size, jnp.float32),
        "batch_size": jnp.asarray(b, jnp.float32),
        "batch_size_x_tokens": jnp.asarray(b * l, jnp.float32),
        "batch_size_real_tokens": real_tokens,
        "padding_tokens": b * l - real_tokens,
        "batch_size_speech": jnp.asarray(
            batch["speech"].shape[0], jnp.float32
        ),
        "batch_size_x_frames": frames_total,
        "batch_size_real_frames": real_frames,
        "padding_frames": frames_total - real_frames,
        "dialog_turns_max": dialog_turns.max(),
        "dialog_turns_avg": dialog_turns.sum() / b,
    }
    return loss, stats


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    *,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    clip_norm: Optional[float] = None,
    schedule: str = "constant",
    grad_accum: int = 1,
):
    """AdamW with optional warmup/cosine schedule, global-norm clipping
    and gradient accumulation (optax.MultiSteps).

    Returns ``(optimizer, lr_fn)`` when a schedule is in play would break
    existing callers — so it returns just the optimizer; use
    :func:`lr_schedule` to rebuild the schedule for logging."""
    sched = lr_schedule(lr, warmup_steps=warmup_steps,
                        total_steps=total_steps, schedule=schedule)
    tx = optax.adamw(sched, weight_decay=weight_decay)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def lr_schedule(
    lr: float,
    *,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    schedule: str = "constant",
):
    """Learning-rate schedule factory shared by the optimizer and the
    trainer's logging. ``constant`` (with optional linear warmup) or
    ``cosine`` (warmup → cosine decay to 0 over total_steps)."""
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine schedule requires total_steps")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=total_steps,
        )
    if schedule != "constant":
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.constant_schedule(lr)],
            [warmup_steps],
        )
    return optax.constant_schedule(lr)


#: top-level trainable components of the FunASRNano param tree
COMPONENTS = ("audio_encoder", "audio_adaptor", "llm")


def split_trainable(params: Dict, trainable) -> Tuple[Dict, Dict]:
    """Split the nano param tree into (trainable, frozen) sub-dicts by
    component name (reference model.py:60-66, 77-81, 120-124 freeze
    flags: encoder/llm frozen, adaptor trainable is the shipped config)."""
    trainable = set(trainable)
    unknown = trainable - set(params)
    if unknown:
        raise ValueError(f"unknown trainable components {sorted(unknown)}")
    tparams = {k: v for k, v in params.items() if k in trainable}
    fparams = {k: v for k, v in params.items() if k not in trainable}
    if not tparams:
        raise ValueError("nothing to train: trainable is empty")
    return tparams, fparams


def make_partitioned_train_step(
    cfgs: NanoConfigs, optimizer, trainable, param_transform=None
):
    """Freeze-aware pjit update: gradients (and optimizer state) only for
    `trainable` components; frozen components enter the loss as
    constants, so JAX's AD never builds their backward pass (a frozen
    encoder costs zero backward FLOPs — the analogue of the reference's
    requires_grad=False freezes, reference model.py:60-66/77-81).

    `param_transform(merged) -> merged` runs inside the jit before the
    loss — the hook LoRA uses to fold adapters into the frozen LLM
    (parallel/lora.py), keeping gradients rank-r."""

    @partial(jax.jit, donate_argnums=(0, 2))
    def train_step(tparams, fparams, opt_state, batch):
        def loss_fn(tp):
            p = dict(fparams)
            p.update(tp)
            if param_transform is not None:
                p = param_transform(p)
            return nano_loss(p, cfgs, batch)

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(tparams)
        updates, opt_state = optimizer.update(grads, opt_state, tparams)
        tparams = optax.apply_updates(tparams, updates)
        return tparams, opt_state, stats

    return train_step


def make_eval_step(cfgs: NanoConfigs):
    """Jitted loss/stats only (validation pass)."""

    @jax.jit
    def eval_step(params, batch):
        _loss, stats = nano_loss(params, cfgs, batch)
        return stats

    return eval_step


def collate_samples(
    samples,
    *,
    frame_multiple: int = 1,
    token_multiple: int = 1,
    frames_to: Optional[int] = None,
    tokens_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Pad per-utterance `data_load_speech` outputs into one train batch.

    Shapes round up to `frame_multiple` / `token_multiple` so an epoch
    compiles a bounded set of step programs (XLA static shapes — the
    bucketing that replaces torch's dynamic batching). `frames_to` /
    `tokens_to` pin the padded shape instead (multi-host training needs
    one GLOBAL static shape — per-host maxima would diverge); samples
    exceeding a pinned shape raise (callers filter first)."""
    b = len(samples)
    l = max(len(s["input_ids"]) for s in samples)
    f = max(s["speech"].shape[1] for s in samples)
    # a pin IS the final padded shape (no multiple-rounding on top —
    # rounding first would reject valid samples whenever the pin is not
    # itself a multiple of token_multiple/frame_multiple)
    if tokens_to is not None:
        if l > tokens_to:
            raise ValueError(f"sample has {l} tokens > pinned {tokens_to}")
        l = tokens_to
    else:
        l = -(-l // token_multiple) * token_multiple
    if frames_to is not None:
        if f > frames_to:
            raise ValueError(f"sample has {f} frames > pinned {frames_to}")
        f = frames_to
    else:
        f = -(-f // frame_multiple) * frame_multiple
    d = samples[0]["speech"].shape[2]
    batch = {
        "speech": np.zeros((b, f, d), np.float32),
        "speech_lengths": np.zeros((b,), np.int32),
        "input_ids": np.zeros((b, l), np.int32),
        "labels": np.full((b, l), -100, np.int32),
        "fbank_beg": np.zeros((b,), np.int32),
        "attention_lengths": np.zeros((b,), np.int32),
    }
    for j, s in enumerate(samples):
        sl = int(s["speech_lengths"][0])
        batch["speech"][j, :sl] = np.asarray(s["speech"])[0, :sl]
        batch["speech_lengths"][j] = sl
        n = len(s["input_ids"])
        batch["input_ids"][j, :n] = s["input_ids"]
        batch["labels"][j, :n] = s["labels_ids"]
        batch["fbank_beg"][j] = s["fbank_beg"][0]
        batch["attention_lengths"][j] = n
    return batch


def make_train_step(cfgs: NanoConfigs, optimizer):
    """One pjit-compiled update: grads over all trainable components.
    Shardings come from the input arrays' placements (GSPMD propagation)."""

    @partial(jax.jit, static_argnums=(), donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        (loss, stats), grads = jax.value_and_grad(
            lambda p: nano_loss(p, cfgs, batch), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats

    return train_step


def make_synthetic_batch(
    cfgs: NanoConfigs, batch: int, frames: int, seq_len: int, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Tiny synthetic training batch honoring the audio-span layout."""
    rng = np.random.default_rng(seed)
    audio_tokens = adaptor_mod.downsampled_length(frames)
    fbank_beg = np.full((batch,), 2, np.int32)
    input_ids = rng.integers(
        2, cfgs.llm.vocab_size, size=(batch, seq_len)
    ).astype(np.int32)
    labels = input_ids.copy()
    labels[:, : 2 + audio_tokens] = -100  # prompt+audio positions unmasked
    return {
        "speech": rng.normal(size=(batch, frames, cfgs.encoder.input_size))
        .astype(np.float32),
        "speech_lengths": np.full((batch,), frames, np.int32),
        "input_ids": input_ids,
        "labels": labels,
        "fbank_beg": fbank_beg,
        "attention_lengths": np.full((batch,), seq_len, np.int32),
    }
