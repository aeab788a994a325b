"""FunASRNano: speech-LLM assembly (audio encoder → adaptor → Qwen3).

TPU-native re-design of the reference model core
(reference model.py:23-718): ChatML prompt assembly with
``<|startofspeech|>…<|endofspeech|>`` audio spans, audio-embedding splice
into the token-embedding sequence, decode via the paged-KV engine
(`self.vllm` attribute contract preserved, reference test.py:12-20) or an
engine-less greedy fallback (the HF-generate analogue,
reference model.py:655-659).

Public surface parity:
- ``FunASRNano.from_pretrained(model=dir, device=...)`` → (model, kwargs)
  with kwargs["tokenizer"], kwargs["frontend"] (reference model.py:710-718)
- ``m.inference(data_in=[wav], hotwords=..., language=..., itn=...)`` →
  ([{key, text, text_tn, label}], meta_data) (reference model.py:544-708)
- ``m.audio_encoder(speech, lens)`` / ``m.audio_adaptor(out, lens)``
  callables for the batch harness (reference infer.py:455-460)
"""

from __future__ import annotations

import logging
import os
import random
import re
import string
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import WavFrontend
from ..audio.io import load_audio
from ..config import (
    FLAGSHIP_ADAPTOR_CONF,
    FLAGSHIP_ENCODER_CONF,
    FLAGSHIP_FRONTEND_CONF,
    NanoModelConfig,
)
from ..text.normalize import clean_response, strip_special_chars
from ..utils.serialization import cast_tree, load_params, save_params
from ..utils.tokenizer import ByteTokenizer, load_tokenizer
from . import adaptor as adaptor_mod
from . import encoder as encoder_mod
from . import qwen3 as qwen3_mod
from .qwen3 import Qwen3Config

logger = logging.getLogger(__name__)

SPEECH_SPAN_RE = re.compile(r"(<\|startofspeech\|>.*?<\|endofspeech\|>)")

_DTYPES = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
           "float32": jnp.float32, "fp32": jnp.float32}


def _resolve_dtype(name: str):
    if name in ("fp16", "float16"):
        # TPUs compute in bfloat16; aliasing silently would change
        # rounding behavior vs a true-fp16 reference, so say so
        logger.warning("float16 is not supported on TPU — using bfloat16")
        return jnp.bfloat16
    return _DTYPES[name]


def resolve_model_dir(model: str) -> str:
    """Local dir → itself; an ``org/name`` hub id → a downloaded
    snapshot dir (ModelScope first, then the HF hub — the reference's
    AutoModel hub="ms" behavior, model.py:44-55). Raises a clear error
    when the id cannot be resolved (offline / libs absent)."""
    if model is None or os.path.isdir(model):
        return model
    if not re.match(r"^[\w.\-]+/[\w.\-]+$", str(model)):
        raise FileNotFoundError(f"model dir not found: {model}")
    errors = []
    try:
        from modelscope import snapshot_download as ms_download  # optional

        return ms_download(model)
    except Exception as e:  # pragma: no cover - depends on env/network
        errors.append(f"modelscope: {e.__class__.__name__}: {e}")
    try:
        from huggingface_hub import snapshot_download as hf_download

        return hf_download(model)
    except Exception as e:  # pragma: no cover - depends on env/network
        errors.append(f"huggingface_hub: {e.__class__.__name__}: {e}")
    raise FileNotFoundError(
        f"could not resolve model id {model!r} from the ModelScope/HF "
        f"hubs ({'; '.join(errors)}). Pass a local model dir instead."
    )


class FunASRNano:
    def __init__(
        self,
        *,
        encoder_params: Dict,
        encoder_cfg: encoder_mod.SANMEncoderConfig,
        adaptor_params: Dict,
        adaptor_cfg: adaptor_mod.NanoAdaptorConfig,
        llm_params: Dict,
        llm_cfg: Qwen3Config,
        frontend: WavFrontend,
        tokenizer: Any,
        model_dir: str = "",
    ) -> None:
        self.encoder_params = encoder_params
        self.encoder_cfg = encoder_cfg
        self.adaptor_params = adaptor_params
        self.adaptor_cfg = adaptor_cfg
        self.llm_params = llm_params
        self.llm_cfg = llm_cfg
        self.frontend = frontend
        self.tokenizer = tokenizer
        self.model_dir = model_dir
        self.use_low_frame_rate = adaptor_cfg.use_low_frame_rate
        # engine slots attached by callers (reference test.py:12-20)
        self.vllm = None
        self.vllm_sampling_params = None

    # ------------- component call surfaces (reference infer.py:455-460) ----

    def audio_encoder(self, speech, speech_lengths):
        return encoder_mod.encode(
            self.encoder_params, self.encoder_cfg, jnp.asarray(speech),
            jnp.asarray(speech_lengths),
        )

    def audio_adaptor(self, encoder_out, encoder_out_lens):
        return adaptor_mod.forward(
            self.adaptor_params, self.adaptor_cfg, encoder_out, encoder_out_lens
        )

    def encode(self, speech, speech_lengths):
        """Encoder-only surface (reference model.py:256-265)."""
        return self.audio_encoder(speech, speech_lengths)

    def forward_export(self, speech, speech_lengths, **kwargs):
        """fbank features → audio prompt embeddings, the exportable
        encoder+adaptor subgraph (reference model.py:251-254)."""
        x, olens = self.audio_encoder(speech, speech_lengths)
        return self.audio_adaptor(x, olens)

    def embed_ids(self, ids: Sequence[int]) -> jax.Array:
        """Token ids → embedding rows (the `get_input_embeddings()` surface,
        reference infer.py:403-404)."""
        return qwen3_mod.embed_tokens(
            self.llm_params, jnp.asarray(list(ids), jnp.int32)
        ).astype(jnp.float32)

    def shard_for_mesh(self, mesh) -> None:
        """Place all param trees on a (dp, tp) mesh with Megatron
        shardings (parallel/mesh.py); jitted forwards then run
        tensor-parallel with XLA-inserted collectives."""
        from ..parallel.mesh import (
            adaptor_param_sharding,
            encoder_param_sharding,
            qwen3_param_sharding,
            shard_params,
        )

        self.encoder_params = shard_params(
            mesh, self.encoder_params, encoder_param_sharding(mesh)
        )
        self.adaptor_params = shard_params(
            mesh, self.adaptor_params, adaptor_param_sharding(mesh)
        )
        self.llm_params = shard_params(
            mesh, self.llm_params, qwen3_param_sharding(mesh)
        )
        self.mesh = mesh

    def encode_batch(
        self, wavs: Sequence[np.ndarray]
    ) -> Tuple[jax.Array, jax.Array]:
        """wavs → audio prompt embeddings [B, T', llm_dim] + lengths."""
        speech, speech_lengths = self.frontend.extract(list(wavs))
        enc_out, enc_lens = self.audio_encoder(speech, speech_lengths)
        return self.audio_adaptor(enc_out, enc_lens)

    # ----------------------- prompt assembly ------------------------------

    @staticmethod
    def build_instruction(
        hotwords: Sequence[str] = (),
        language: Optional[str] = None,
        itn: bool = True,
    ) -> str:
        """The reference's transcription instruction
        (reference model.py:553-568)."""
        prompt = ""
        if hotwords:
            joined = ", ".join(hotwords)
            prompt = (
                "请结合上下文信息，更加准确地完成语音转写任务。"
                "如果没有相关信息，我们会留空。\n\n\n**上下文信息：**\n\n\n"
            )
            prompt += f"热词列表：[{joined}]\n"
        prompt += "语音转写" if language is None else f"语音转写成{language}"
        if not itn:
            prompt += "，不进行文本规整"
        return prompt + "："

    def chatml_parts(
        self, instruction: str, system: str = "You are a helpful assistant.",
        sys_prompt: bool = True,
    ) -> Tuple[List[int], List[int]]:
        """(prefix_ids, suffix_ids) around the audio span
        (reference model.py:330, infer.py:395-396)."""
        prefix = (
            f"<|im_start|>system\n{system}<|im_end|>\n<|im_start|>user\n{instruction}"
            if sys_prompt
            else f"<|im_start|>user\n{instruction}"
        )
        suffix = "<|im_end|>\n<|im_start|>assistant\n"
        return self.tokenizer.encode(prefix), self.tokenizer.encode(suffix)

    def build_prompt_embeds(
        self,
        audio_embeds: jax.Array,  # [B, T', D]
        audio_lens: jax.Array,  # [B]
        prefix_ids: Sequence[int],
        suffix_ids: Sequence[int],
    ) -> List[np.ndarray]:
        """Per-utterance [prefix ⧺ speech ⧺ suffix] embedding sequences
        (reference infer.py:462-466)."""
        prefix = np.asarray(self.embed_ids(prefix_ids))
        suffix = np.asarray(self.embed_ids(suffix_ids))
        audio = np.asarray(audio_embeds, dtype=np.float32)
        lens = np.asarray(audio_lens)
        return [
            np.concatenate([prefix, audio[i, : int(lens[i])], suffix], axis=0)
            for i in range(audio.shape[0])
        ]

    # ----------------------------- inference ------------------------------

    def data_template(self, data: Sequence[Dict]) -> Dict[str, List]:
        """Chat message list → {system, user, assistant} turn lists
        (reference model.py:267-290). A user item may carry an ``audio``
        array referenced by the ``!!`` span marker."""
        system, user, assistant = [], [], []
        for item in data:
            role, content = item["role"], item["content"]
            if role == "system":
                system.append(content)
            elif role == "user":
                if "audio" in item:
                    content = [content, item["audio"]]
                user.append(content)
            elif role == "assistant":
                assistant.append(content)
        if user and not system:
            # `system * len(user)` is the reference's own construction
            # (model.py:283-289); with no system turn it would zip to
            # ZERO turns and silently produce an empty prompt — default
            # the system prompt instead
            system = ["You are a helpful assistant."]
        return {
            "system": system * len(user),
            "user": user,
            "assistant": assistant,
        }

    def data_load_speech(
        self,
        contents: Dict[str, List],
        tokenizer=None,
        frontend=None,
        meta_data: Optional[Dict] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        """Parse multiturn ChatML with ``<|startofspeech|>…<|endofspeech|>``
        spans → token ids with zero "fake tokens" at audio positions +
        padded fbank batch (reference model.py:292-450). Caps:
        multiturn_num_max=5 turns, max_token_length=1500 tokens
        (reference model.py:318-320)."""
        tokenizer = tokenizer or self.tokenizer
        fe = frontend or self.frontend
        meta_data = meta_data if meta_data is not None else {}
        do_think = kwargs.get("do_think", True)
        sys_prompt = kwargs.get("sys_prompt", True)
        assistant_input = kwargs.get("infer_with_assistant_input", False)

        input_ids: List[int] = []
        labels: List[int] = []
        source_ids: List[int] = []
        fbank_beg: List[int] = []
        fake_token_len: List[int] = []
        wavs: List[np.ndarray] = []
        target_ids: List[int] = []
        t_load = t_feat = 0.0

        turns = zip(contents["system"], contents["user"],
                    contents["assistant"])
        for i, (system_prompt, user_prompt, target_out) in enumerate(turns):
            if i >= kwargs.get("multiturn_num_max", 5):
                break
            if len(input_ids) > kwargs.get("max_token_length", 1500):
                break
            audio = None
            if isinstance(user_prompt, (list, tuple)):
                user_prompt, audio = user_prompt
            if i == 0:
                if assistant_input:
                    source_input = (
                        f"<|im_start|>system\n{system_prompt}<|im_end|>\n"
                        f"<|im_start|>user\n{user_prompt}"
                        if sys_prompt else f"<|im_start|>user\n{user_prompt}"
                    )
                else:
                    source_input = (
                        f"<|im_start|>system\n{system_prompt}<|im_end|>\n"
                        f"<|im_start|>user\n{user_prompt}<|im_end|>\n"
                        f"<|im_start|>assistant\n"
                        if sys_prompt else
                        f"<|im_start|>user\n{user_prompt}<|im_end|>\n"
                        f"<|im_start|>assistant\n"
                    )
            else:
                source_input = (
                    f"<|im_start|>user\n{user_prompt}"
                    if assistant_input else
                    f"<|im_start|>user\n{user_prompt}<|im_end|>\n"
                    f"<|im_start|>assistant\n"
                )
            if not do_think:
                source_input += "<think>\n\n</think>\n\n"

            turn_ids: List[int] = []
            fbank_beg_i = -1
            fake_len_i = 0
            for sub_str in SPEECH_SPAN_RE.split(source_input):
                if not sub_str.startswith("<|startofspeech|>"):
                    turn_ids += tokenizer.encode(sub_str)
                    continue
                sub_str = sub_str.replace("<|startofspeech|>", "").replace(
                    "<|endofspeech|>", ""
                )
                if sub_str.startswith("!"):
                    sub_str = sub_str[1:]
                    if sub_str.startswith("!"):  # "!!" → in-memory samples
                        wav = np.asarray(audio, np.float32).reshape(-1)
                    else:
                        t0 = time.perf_counter()
                        wav = load_audio(sub_str, fs=fe.fs)
                        t_load += time.perf_counter() - t0
                    t1 = time.perf_counter()
                    frames = fe.lfr_frame_count(len(wav))
                    t_feat += time.perf_counter() - t1
                    fake_len_i = (
                        adaptor_mod.downsampled_length(frames)
                        if self.use_low_frame_rate else frames
                    )
                    if fbank_beg_i >= 0:
                        # the reference records ONE (fbank_beg,
                        # fake_token_len) per turn (model.py:403-404),
                        # so a second span in the same turn mis-splices
                        # there too — surface it instead of silently
                        # matching that corruption
                        logger.warning(
                            "multiple audio spans in one turn: only the "
                            "last span's position is spliced "
                            "(reference model.py:403-404 semantics)"
                        )
                    fbank_beg_i = len(turn_ids)
                    turn_ids += [0] * fake_len_i
                    wavs.append(wav)

            fbank_beg.append(
                fbank_beg_i + len(input_ids) if fbank_beg_i >= 0 else -1
            )
            fake_token_len.append(fake_len_i)
            target_ids = tokenizer.encode(f"{target_out}<|im_end|>")
            source_ids = input_ids + turn_ids
            input_ids = input_ids + turn_ids + target_ids
            labels = labels + [-100] * len(turn_ids) + target_ids

        speech = speech_lengths = None
        precomputed = ("audio_embedding" in kwargs
                       and "audio_embedding_lens" in kwargs)
        if wavs and not precomputed:
            t1 = time.perf_counter()
            speech, speech_lengths = fe.extract(wavs)
            t_feat += time.perf_counter() - t1
            meta_data["batch_data_time"] = (
                float(jnp.sum(speech_lengths)) * fe.frame_shift
                * fe.lfr_n / 1000
            )
        elif wavs:
            # precomputed adaptor output: skip the fbank entirely — the
            # whole point of the audio_embedding kwargs path
            meta_data["batch_data_time"] = sum(
                len(w) for w in wavs
            ) / fe.fs
        meta_data["load_data"] = f"{t_load:0.3f}"
        meta_data["extract_feat"] = f"{t_feat:0.3f}"
        return {
            "speech": speech,
            "speech_lengths": speech_lengths,
            "input_ids": np.asarray(input_ids, np.int64),
            "source_ids": np.asarray(source_ids, np.int64),
            "labels_ids": np.asarray(labels, np.int64),
            "target_ids": np.asarray(target_ids, np.int64),
            "fbank_beg": np.asarray(fbank_beg, np.int32),
            "fake_token_len": np.asarray(fake_token_len, np.int32),
        }

    @staticmethod
    def _teacher_forcing(kwargs: Dict) -> bool:
        # the reference spells this kwarg two different ways
        # (model.py:505 "tearchforing", :641 "teachforing") — accept all
        return bool(
            kwargs.get("teacher_forcing")
            or kwargs.get("tearchforing")
            or kwargs.get("teachforing")
        )

    def inference_prepare(
        self, data_in, data_lengths=None, key=None, tokenizer=None,
        frontend=None, **kwargs,
    ):
        """messages → spliced prompt embeddings (reference model.py:452-541):
        embed the token ids, run encoder+adaptor over every audio span,
        overwrite the fake-token rows per turn."""
        if kwargs.get("batch_size", 1) > 1:
            raise NotImplementedError("batch decoding is not implemented")
        meta_data: Dict[str, Any] = {}
        contents = self.data_template(data_in[0])
        output = self.data_load_speech(
            contents, tokenizer, frontend, meta_data=meta_data, **kwargs
        )
        ids = (output["input_ids"] if self._teacher_forcing(kwargs)
               else output["source_ids"])
        embeds = np.array(self.embed_ids(np.maximum(ids, 0)))  # [T, H] f32

        has_spans = bool((np.asarray(output["fbank_beg"]) >= 0).any())
        if has_spans:
            if ("audio_embedding" in kwargs
                    and "audio_embedding_lens" in kwargs):
                # precomputed adaptor output (reference model.py:477-480)
                audio = kwargs["audio_embedding"]
                audio_lens = kwargs["audio_embedding_lens"]
            else:
                enc_out, enc_lens = self.audio_encoder(
                    output["speech"], output["speech_lengths"]
                )
                audio, audio_lens = self.audio_adaptor(enc_out, enc_lens)
            audio_np = np.asarray(audio, np.float32)
            lens_np = np.asarray(audio_lens)
            speech_idx = 0
            for turn, beg in enumerate(np.maximum(output["fbank_beg"], 0)):
                if beg <= 0:
                    continue
                n = int(output["fake_token_len"][turn])
                if n > audio_np.shape[1] or beg + n > embeds.shape[0]:
                    # splice-length fallback (reference model.py:521-539)
                    logger.error(
                        "splice length mismatch: fake=%d audio=%s — "
                        "falling back to encoder_out_lens", n, audio_np.shape,
                    )
                    n = min(int(lens_np[speech_idx]), embeds.shape[0] - beg)
                embeds[beg : beg + n] = audio_np[speech_idx, :n]
                speech_idx += 1
        return embeds, contents, output, output["source_ids"], meta_data

    def inference_llm(
        self, data_in, data_lengths=None, key=None, tokenizer=None,
        frontend=None, **kwargs,
    ) -> Tuple[List[Dict], Dict]:
        """Decode (or teacher-force) the spliced embeddings
        (reference model.py:614-708)."""
        embeds, contents, batch, source_ids, meta_data = self.inference_prepare(
            data_in, data_lengths, key, tokenizer, frontend, **kwargs
        )
        label = contents["assistant"][-1] if contents["assistant"] else "null"
        max_tokens = kwargs.get("max_tokens", kwargs.get("max_length", 500))
        loss = None
        if not self._teacher_forcing(kwargs):
            if self.vllm is not None:
                sp = self.vllm_sampling_params
                if sp is None:
                    from ..engine import SamplingParams

                    sp = SamplingParams(top_p=0.001, max_tokens=max_tokens)
                outputs = self.vllm.generate(
                    {"prompt_embeds": embeds}, sp, use_tqdm=False
                )
                response = outputs[0].outputs[0].text
            else:
                out_ids = qwen3_mod.greedy_decode_simple(
                    self.llm_params, self.llm_cfg, jnp.asarray(embeds)[None],
                    max_new_tokens=max_tokens,
                )
                response = self.tokenizer.decode(
                    out_ids.tolist(), skip_special_tokens=True
                )
        else:
            # teacher-forcing eval: loss + argmax predictions over the
            # target span (reference model.py:666-683)
            t = embeds.shape[0]
            pos = jnp.arange(t)[None, :]
            hidden, _ = qwen3_mod.forward_hidden(
                self.llm_params, self.llm_cfg,
                jnp.asarray(embeds)[None].astype(self.llm_cfg.dtype), pos,
                attn_lengths=jnp.asarray([t]),
            )
            logits = qwen3_mod.lm_logits(
                self.llm_params, self.llm_cfg, hidden[0]
            ).astype(jnp.float32)
            labels = np.asarray(batch["labels_ids"])
            labels[labels == -1] = -100
            # HF convention: logits[t] predicts labels[t+1]
            shift_logits = logits[:-1]
            shift_labels = labels[1:]
            valid = shift_labels != -100
            logp = jax.nn.log_softmax(shift_logits, axis=-1)
            tok_lp = jnp.take_along_axis(
                logp, jnp.asarray(np.maximum(shift_labels, 0))[:, None],
                axis=1,
            )[:, 0]
            loss = float(
                -(tok_lp * jnp.asarray(valid)).sum() / max(valid.sum(), 1)
            )
            preds = np.asarray(jnp.argmax(logits, axis=-1))
            # reference parity: model.py:677 slices preds[:, len(source):]
            # (logits[len(source)-1] — the first target prediction — is
            # deliberately excluded there too)
            preds = preds[len(source_ids):]
            response = self.tokenizer.decode(
                preds.tolist(), skip_special_tokens=True
            )

        if key is None:
            chars = string.ascii_letters + string.digits
            key = ["rand_key_" + "".join(random.choice(chars) for _ in range(13))]
        result = {
            "key": key[0],
            "text": clean_response(response),
            "text_tn": strip_special_chars(response),
            "label": label,
        }
        if loss is not None:
            result["loss"] = loss
        out_dir = kwargs.get("output_dir")
        if out_dir:
            d = os.path.join(out_dir, "1best_recog")
            os.makedirs(d, exist_ok=True)
            for name, val in (
                ("text", result["text"]), ("label", str(result["label"])),
                ("text_tn", result["text_tn"]),
            ):
                with open(os.path.join(d, name), "a", encoding="utf-8") as f:
                    f.write(f"{key[0]}\t{val}\n".replace("\n\n", "\n"))
        return [result], meta_data

    def inference(
        self,
        data_in: Sequence,
        data_lengths=None,
        key: Optional[List[str]] = None,
        tokenizer=None,
        frontend=None,
        **kwargs,
    ) -> Tuple[List[Dict], Dict]:
        """Single-utterance decode (batch=1, like the reference —
        model.py:463-464 raises for batch>1; batch work goes through the
        engine harnesses). `data_in[0]` may be a wav path, raw samples, or
        a full chat message list with audio spans (reference
        model.py:544-613)."""
        if kwargs.get("batch_size", 1) > 1 or len(data_in) > 1:
            raise NotImplementedError("batch decoding is not implemented")

        instruction = self.build_instruction(
            kwargs.get("hotwords", []), kwargs.get("language"),
            kwargs.get("itn", True),
        )
        new_data_in = []
        for data in data_in:
            if isinstance(data, str):
                new_data_in.append([
                    {"role": "system",
                     "content": "You are a helpful assistant."},
                    {"role": "user",
                     "content": f"{instruction}<|startofspeech|>!{data}"
                                f"<|endofspeech|>"},
                    {"role": "assistant", "content": "null"},
                ])
            elif isinstance(data, (np.ndarray, jax.Array)):
                new_data_in.append([
                    {"role": "system",
                     "content": "You are a helpful assistant."},
                    {"role": "user",
                     "content": f"{instruction}<|startofspeech|>!!"
                                f"<|endofspeech|>",
                     "audio": np.asarray(data)},
                    {"role": "assistant", "content": "null"},
                ])
            else:  # already a message list
                new_data_in.append(data)

        if key is None:
            chars = string.ascii_letters + string.digits
            key = ["rand_key_" + "".join(random.choice(chars)
                                         for _ in range(13))
                   for _ in new_data_in]
        return self.inference_llm(
            new_data_in, data_lengths=data_lengths, key=key,
            tokenizer=tokenizer, frontend=frontend, **kwargs,
        )

    # ------------------------- load / save --------------------------------

    @staticmethod
    def from_pretrained(
        model: str = None, device: str = None, dtype: str = "bfloat16",
        apply_lora: bool = True, llm_dir: str = None, **kwargs,
    ) -> Tuple["FunASRNano", Dict]:
        """Build from a model dir (config.yaml [+ model.safetensors]).

        Returns (model, kwargs) with tokenizer/frontend like the reference's
        AutoModel.build_model contract (reference model.py:710-718). Missing
        weights random-initialize with a warning (benchmark/test mode).
        `llm_dir` overrides the decoder weight dir from the config's
        llm_conf.init_param_path (the --vllm_model_dir analogue,
        reference infer_kaldidata.py:386-391). A non-local `org/name`
        id resolves through the ModelScope/HF hubs like the reference's
        AutoModel (model.py:44-55)."""
        jdtype = _resolve_dtype(dtype)
        model = resolve_model_dir(model)
        from .convert import is_qwen3_asr_dir

        if is_qwen3_asr_dir(model):
            # Qwen3-ASR-style checkpoint (the data factory's dedicated
            # transcriber, reference run_audio_cat_cut.py:566/603-609,
            # simple_audio_processor.py:791-822): HF config.json with a
            # multimodal-prefixed Qwen3 decoder + audio tower. The
            # checkpoint carries its OWN decoder weights — an llm_dir
            # override (a Nano-config concept) cannot be honored here,
            # so refuse loudly instead of silently loading the bundled
            # decoder; apply_lora is likewise a Nano-only surface (these
            # checkpoints have no LoRA sidecar) and is ignored.
            if llm_dir:
                raise ValueError(
                    "llm_dir cannot override the decoder of a Qwen3-ASR "
                    f"checkpoint ({model}): its decoder weights are part "
                    "of the multimodal checkpoint itself")
            return FunASRNano._from_qwen3_asr_dir(
                model, jdtype, device=device, **kwargs)
        cfg = NanoModelConfig.from_dir(model)
        if llm_dir:
            cfg.llm_conf["init_param_path"] = llm_dir
        enc_cfg = encoder_mod.SANMEncoderConfig.from_conf(
            cfg.audio_encoder_conf, input_size=cfg.input_size, dtype=jdtype
        )
        # auto-enable the Pallas flash kernels on TPU for lane-aligned dims
        # unless the config pins them off
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        if (
            on_tpu
            and "use_flash" not in cfg.audio_encoder_conf
            and enc_cfg.output_size % (enc_cfg.attention_heads * 128) == 0
        ):
            import dataclasses as _dc

            # fused_attention: the single-dispatch attention-sublayer
            # kernel for the PADDED path (ops/sanm_fused.py, −10% full
            # encode at [16,1200,512] vs flash; BENCH_NOTES round 4) —
            # the packed path routes its own one-shot segmented kernel
            enc_cfg = _dc.replace(enc_cfg, use_flash=True,
                                  fused_attention=True)
        ad_cfg = adaptor_mod.NanoAdaptorConfig.from_conf(
            cfg.audio_adaptor_conf, dtype=jdtype
        )
        frontend = WavFrontend(**cfg.frontend_conf)
        tokenizer = load_tokenizer(model)

        ckpt = os.path.join(model, "model.safetensors")
        llm_dir = cfg.llm_conf.get("init_param_path")
        funasr_ckpt = next(
            (os.path.join(model, f) for f in ("model.pt", "pytorch_model.bin")
             if os.path.exists(os.path.join(model, f))),
            None,
        )
        if not os.path.exists(ckpt) and funasr_ckpt:
            # the funasr/ModelScope combined checkpoint: audio_encoder.* /
            # audio_adaptor.* / llm.* key spaces (reference model.py:25-130)
            from .convert import nano_from_funasr

            if llm_dir and os.path.exists(os.path.join(llm_dir, "config.json")):
                llm_cfg = Qwen3Config.from_pretrained(llm_dir, dtype=jdtype)
            else:
                llm_cfg = Qwen3Config.from_hf_dict(cfg.llm_conf, dtype=jdtype)
            enc_params, ad_params, llm_params = nano_from_funasr(
                model, enc_cfg, ad_cfg, llm_cfg, dtype=jdtype
            )
            if apply_lora:
                from ..parallel.lora import maybe_merge_lora_dir

                llm_params = maybe_merge_lora_dir(model, llm_params)
            if on_tpu and llm_cfg.head_dim % 128 == 0 and not llm_cfg.use_flash:
                import dataclasses as _dc

                llm_cfg = _dc.replace(llm_cfg, use_flash=True)
            m = FunASRNano(
                encoder_params=enc_params, encoder_cfg=enc_cfg,
                adaptor_params=ad_params, adaptor_cfg=ad_cfg,
                llm_params=llm_params, llm_cfg=llm_cfg,
                frontend=frontend, tokenizer=tokenizer, model_dir=model,
            )
            out_kwargs = dict(kwargs)
            out_kwargs.update(
                tokenizer=tokenizer, frontend=frontend, model_path=model,
                device=device or "tpu",
            )
            return m, out_kwargs
        if os.path.exists(ckpt):
            tree = load_params(ckpt)
            enc_params = cast_tree(tree["audio_encoder"], jdtype)
            ad_params = cast_tree(tree["audio_adaptor"], jdtype)
            llm_params = cast_tree(
                _migrate_llm_layout(tree["llm"]), jdtype
            )
            if llm_dir and os.path.exists(os.path.join(llm_dir, "config.json")):
                llm_cfg = Qwen3Config.from_pretrained(llm_dir, dtype=jdtype)
            else:
                llm_cfg = _infer_llm_cfg_from_tree(llm_params, jdtype)
        else:
            if llm_dir and os.path.exists(os.path.join(llm_dir, "config.json")):
                from .convert import qwen3_from_pretrained

                # optional LoRA merged at load (reference model.py:83-102)
                lora_conf = cfg.llm_conf.get("lora_conf") or {}
                lora_dir = (
                    lora_conf.get("init_param_path")
                    if cfg.llm_conf.get("use_lora") else None
                )
                llm_params, llm_cfg = qwen3_from_pretrained(
                    llm_dir, dtype=jdtype, lora_dir=lora_dir
                )
            else:
                logger.warning(
                    "no llm weights found in %s — random-initializing", model
                )
                llm_cfg = Qwen3Config(dtype=jdtype)
                llm_params = qwen3_mod.init_params(llm_cfg, jax.random.PRNGKey(0))
            logger.warning(
                "no encoder/adaptor weights in %s — random-initializing", model
            )
            enc_params = encoder_mod.init_params(enc_cfg, jax.random.PRNGKey(1))
            ad_cfg = adaptor_mod.NanoAdaptorConfig(
                encoder_dim=enc_cfg.output_size,
                llm_dim=llm_cfg.hidden_size,
                ffn_dim=ad_cfg.ffn_dim,
                use_low_frame_rate=ad_cfg.use_low_frame_rate,
                dtype=jdtype,
            )
            ad_params = adaptor_mod.init_params(ad_cfg, jax.random.PRNGKey(2))

        if apply_lora:
            # a lora.safetensors adapter beside the weights folds in at
            # load (the reference's PeftModel.from_pretrained analogue,
            # model.py:91-98); cli/train.py resumes pass apply_lora=False
            # to keep base + adapter separate
            from ..parallel.lora import maybe_merge_lora_dir

            llm_params = maybe_merge_lora_dir(model, llm_params)

        if on_tpu and llm_cfg.head_dim % 128 == 0 and not llm_cfg.use_flash:
            import dataclasses as _dc

            llm_cfg = _dc.replace(llm_cfg, use_flash=True)

        m = FunASRNano(
            encoder_params=enc_params, encoder_cfg=enc_cfg,
            adaptor_params=ad_params, adaptor_cfg=ad_cfg,
            llm_params=llm_params, llm_cfg=llm_cfg,
            frontend=frontend, tokenizer=tokenizer, model_dir=model,
        )
        out_kwargs = dict(kwargs)
        out_kwargs.update(
            tokenizer=tokenizer, frontend=frontend, model_path=model,
            device=device or "tpu",
        )
        return m, out_kwargs

    @staticmethod
    def _from_qwen3_asr_dir(
        model: str, jdtype, device: str = None, **kwargs,
    ) -> Tuple["FunASRNano", Dict]:
        """Build from a Qwen3-ASR-style multimodal checkpoint dir.

        The reference's data factory transcribes with Qwen3-ASR-1.7B
        (`Qwen3ASRModel.from_pretrained`, reference
        run_audio_cat_cut.py:603-609); passing such a dir as
        `--asr_model` to our cat_cut stage4 / audio_processor routes
        here via BatchPipeline → from_pretrained. The decoder converts
        through the generic Qwen3 mapping under its multimodal prefix;
        the audio tower converts when SANM-shaped (convert.py
        qwen3_asr_from_pretrained raises a named-seam error otherwise)."""
        from .convert import qwen3_asr_from_pretrained, read_hf_config

        enc_params, ad_params, llm_params, enc_cfg, ad_cfg, llm_cfg = (
            qwen3_asr_from_pretrained(model, dtype=jdtype))
        hf_cfg = read_hf_config(model) or {}
        frontend = WavFrontend(**(hf_cfg.get("frontend_conf") or {}))
        tokenizer = load_tokenizer(model)
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        import dataclasses as _dc

        if on_tpu and llm_cfg.head_dim % 128 == 0 and not llm_cfg.use_flash:
            llm_cfg = _dc.replace(llm_cfg, use_flash=True)
        if enc_params is None:
            # decoder-only checkpoint: random audio stack at default
            # Fun-ASR shapes (test/bench mode, mirrors the config.yaml
            # path's random-init warning)
            logger.warning(
                "Qwen3-ASR dir %s has no audio tower — random-"
                "initializing encoder/adaptor", model)
            enc_cfg = encoder_mod.SANMEncoderConfig(dtype=jdtype)
            ad_cfg = adaptor_mod.NanoAdaptorConfig(
                encoder_dim=enc_cfg.output_size,
                llm_dim=llm_cfg.hidden_size, dtype=jdtype)
            enc_params = encoder_mod.init_params(
                enc_cfg, jax.random.PRNGKey(1))
            ad_params = adaptor_mod.init_params(
                ad_cfg, jax.random.PRNGKey(2))
        if (
            on_tpu
            and not enc_cfg.use_flash
            and enc_cfg.output_size % (enc_cfg.attention_heads * 128) == 0
        ):
            enc_cfg = _dc.replace(enc_cfg, use_flash=True,
                                  fused_attention=True)
        m = FunASRNano(
            encoder_params=enc_params, encoder_cfg=enc_cfg,
            adaptor_params=ad_params, adaptor_cfg=ad_cfg,
            llm_params=llm_params, llm_cfg=llm_cfg,
            frontend=frontend, tokenizer=tokenizer, model_dir=model,
        )
        out_kwargs = dict(kwargs)
        out_kwargs.update(
            tokenizer=tokenizer, frontend=frontend, model_path=model,
            device=device or "tpu",
        )
        return m, out_kwargs

    def save_pretrained(self, model_dir: str) -> None:
        os.makedirs(model_dir, exist_ok=True)
        NanoModelConfig(
            audio_encoder="SANMEncoder",
            audio_encoder_conf=dict(
                output_size=self.encoder_cfg.output_size,
                attention_heads=self.encoder_cfg.attention_heads,
                linear_units=self.encoder_cfg.linear_units,
                num_blocks=self.encoder_cfg.num_blocks,
                tp_blocks=self.encoder_cfg.tp_blocks,
                kernel_size=self.encoder_cfg.kernel_size,
                sanm_shift=self.encoder_cfg.sanm_shift,
            ),
            audio_adaptor="NanoAdaptor",
            audio_adaptor_conf=dict(
                encoder_dim=self.adaptor_cfg.encoder_dim,
                llm_dim=self.adaptor_cfg.llm_dim,
                ffn_dim=self.adaptor_cfg.ffn_dim,
                use_low_frame_rate=self.adaptor_cfg.use_low_frame_rate,
            ),
            llm_conf=dict(
                hidden_size=self.llm_cfg.hidden_size,
                num_hidden_layers=self.llm_cfg.num_hidden_layers,
                num_attention_heads=self.llm_cfg.num_attention_heads,
                num_key_value_heads=self.llm_cfg.num_key_value_heads,
                head_dim=self.llm_cfg.head_dim,
                intermediate_size=self.llm_cfg.intermediate_size,
                vocab_size=self.llm_cfg.vocab_size,
                eos_token_id=self.llm_cfg.eos_token_id,
            ),
            frontend_conf=dict(
                fs=self.frontend.fs, window=self.frontend.window,
                n_mels=self.frontend.n_mels, lfr_m=self.frontend.lfr_m,
                lfr_n=self.frontend.lfr_n,
            ),
            input_size=self.encoder_cfg.input_size,
        ).save(model_dir)
        save_params(
            os.path.join(model_dir, "model.safetensors"),
            {
                "audio_encoder": self.encoder_params,
                "audio_adaptor": self.adaptor_params,
                "llm": self.llm_params,
            },
        )


def _migrate_llm_layout(llm_tree: Dict) -> Dict:
    """Upgrade combined checkpoints saved with the pre-fusion layout
    (separate wq/wk/wv and w_gate/w_up) to the fused wqkv/w_gateup layout."""
    layers = llm_tree.get("layers", {})
    if "wqkv" in layers or "wq" not in layers:
        return llm_tree
    layers = dict(layers)
    layers["wqkv"] = jnp.concatenate(
        [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1
    )
    layers["w_gateup"] = jnp.concatenate(
        [layers.pop("w_gate"), layers.pop("w_up")], axis=-1
    )
    out = dict(llm_tree)
    out["layers"] = layers
    return out


def _infer_llm_cfg_from_tree(llm_params: Dict, dtype) -> Qwen3Config:
    """Derive a Qwen3Config from parameter shapes (our combined checkpoint
    carries no separate HF config.json)."""
    lyr = llm_params["layers"]
    L, H, QKVD = lyr["wqkv"].shape
    D = lyr["q_norm"].shape[-1]
    V = llm_params["embed"].shape[0]
    nq = lyr["wo"].shape[1] // D
    nkv = (QKVD // D - nq) // 2
    return Qwen3Config(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=nq,
        num_key_value_heads=nkv,
        head_dim=D, intermediate_size=lyr["w_gateup"].shape[-1] // 2,
        tie_word_embeddings="lm_head" not in llm_params,
        eos_token_id=1 if V < 1000 else 151645,
        pad_token_id=0 if V < 1000 else 151643,
        dtype=dtype,
    )


def make_test_model_dir(
    path: str,
    *,
    vocab_size: int = 258,
    hidden_size: int = 64,
    num_layers: int = 2,
    enc_dim: int = 64,
    enc_blocks: int = 2,
    seed: int = 0,
    flagship: bool = False,
) -> str:
    """Fabricate a tiny random-weight FunASRNano model dir (config.yaml +
    model.safetensors, ByteTokenizer implied) for CLI/e2e tests and benches
    — the engine-level fake-model strategy from SURVEY.md §4.

    With ``flagship=True`` the weights are random but the SHAPES are the
    real Fun-ASR-Nano stack (SenseVoice-small-family encoder + Qwen3-0.6B,
    reference model.py:33, 74-75): per-token/per-frame compute matches the
    real model, so serving/bench SLOs measured against it are honest."""
    os.makedirs(path, exist_ok=True)
    if flagship:
        llm_cfg = Qwen3Config(tie_word_embeddings=True, eos_token_id=1,
                              pad_token_id=0, dtype=jnp.float32)
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=512, attention_heads=4,
            linear_units=2048, num_blocks=50, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=512, llm_dim=llm_cfg.hidden_size, ffn_dim=2048,
            dtype=jnp.float32,
        )
    else:
        llm_cfg = Qwen3Config(
            vocab_size=vocab_size, hidden_size=hidden_size,
            num_hidden_layers=num_layers, num_attention_heads=4,
            num_key_value_heads=2, head_dim=max(hidden_size // 4, 8),
            intermediate_size=hidden_size * 2, tie_word_embeddings=True,
            eos_token_id=1, pad_token_id=0, dtype=jnp.float32,
        )
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=enc_dim, attention_heads=4,
            linear_units=enc_dim * 2, num_blocks=enc_blocks,
            dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=enc_dim, llm_dim=hidden_size,
            ffn_dim=hidden_size * 2, dtype=jnp.float32,
        )
    m = FunASRNano(
        encoder_params=encoder_mod.init_params(enc_cfg, jax.random.PRNGKey(seed)),
        encoder_cfg=enc_cfg,
        adaptor_params=adaptor_mod.init_params(ad_cfg, jax.random.PRNGKey(seed + 1)),
        adaptor_cfg=ad_cfg,
        llm_params=qwen3_mod.init_params(llm_cfg, jax.random.PRNGKey(seed + 2)),
        llm_cfg=llm_cfg,
        frontend=WavFrontend(**FLAGSHIP_FRONTEND_CONF),
        tokenizer=ByteTokenizer(),
        model_dir=path,
    )
    m.save_pretrained(path)
    return path
