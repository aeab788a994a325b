"""SenseVoiceSmall in functional JAX: the aux tagging/ASR model the
reference data factory runs for language/emotion/event tags
(reference run_sense_voice.py:19-28 `AutoModel(model="iic/SenseVoiceSmall")`).

funasr architecture (funasr/models/sense_voice/model.py):
- frontend: fbank 80 × LFR(m=7, n=6) + CMVN → 560-dim features;
- 4 query embeddings prepended in FEATURE space:
  [language, event_query(1), emo_query(2), textnorm] — rows of one
  `nn.Embedding(·, input_size)` table; speech becomes
  [lang ⧺ event ⧺ emo ⧺ textnorm ⧺ frames];
- SenseVoiceEncoderSmall: SAN-M encoder (num_blocks) + trailing tp stage
  (tp_blocks) — models/encoder.py with tp_blocks > 0;
- CTC head `ctc.ctc_lo: Linear(output_size → vocab)`; greedy CTC decode
  (argmax → collapse repeats → drop blank 0). The first decoded tokens
  are the `<|lang|><|emo|><|event|>` tag tokens the reference parses
  (run_sense_voice.py:54-64).

Key space for conversion: `embed.weight`, `encoder.encoders0/…` (via
models/convert.encoder_from_funasr_sd), `ctc.ctc_lo.{weight,bias}`.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

LID_DICT = {"auto": 0, "zh": 3, "en": 4, "yue": 7, "ja": 11, "ko": 12,
            "nospeech": 13}
TEXTNORM_DICT = {"withitn": 14, "woitn": 15}
EVENT_QUERY_ID = 1
EMO_QUERY_ID = 2


@dataclasses.dataclass(frozen=True)
class SenseVoiceConfig:
    input_size: int = 560           # 80 mel × lfr_m 7
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    tp_blocks: int = 20
    kernel_size: int = 11
    sanm_shift: int = 0
    vocab_size: int = 25055
    embed_entries: int = 16         # query-embedding table rows
    dtype: Any = None               # resolved lazily (jnp.bfloat16)

    def encoder_cfg(self):
        import jax.numpy as jnp

        from . import encoder as encoder_mod

        return encoder_mod.SANMEncoderConfig(
            input_size=self.input_size, output_size=self.output_size,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units, num_blocks=self.num_blocks,
            tp_blocks=self.tp_blocks, kernel_size=self.kernel_size,
            sanm_shift=self.sanm_shift,
            dtype=self.dtype or jnp.float32,
        )


def init_params(cfg: SenseVoiceConfig, key) -> Dict:
    import jax
    import jax.numpy as jnp

    from . import encoder as encoder_mod

    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "embed": jax.random.normal(
            k0, (cfg.embed_entries, cfg.input_size), jnp.float32
        ) * 0.02,
        "encoder": encoder_mod.init_params(cfg.encoder_cfg(), k1),
        "ctc_w": jax.random.normal(
            k2, (cfg.output_size, cfg.vocab_size), jnp.float32
        ) * cfg.output_size ** -0.5,
        "ctc_b": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def forward_ctc_logits(
    params: Dict,
    cfg: SenseVoiceConfig,
    speech,            # [B, T, input_size] LFR+CMVN features
    speech_lengths,    # [B]
    language_ids,      # [B] rows of LID_DICT
    textnorm_ids,      # [B] rows of TEXTNORM_DICT
):
    """→ (ctc logits [B, 4+T, vocab], lengths [B] incl. the 4 queries)."""
    import jax.numpy as jnp

    from . import encoder as encoder_mod

    b = speech.shape[0]
    lang_q = params["embed"][language_ids][:, None]          # [B,1,D]
    event_emo_q = jnp.broadcast_to(
        params["embed"][jnp.asarray([EVENT_QUERY_ID, EMO_QUERY_ID])][None],
        (b, 2, cfg.input_size),
    )
    textnorm_q = params["embed"][textnorm_ids][:, None]
    x = jnp.concatenate(
        [lang_q, event_emo_q, textnorm_q, speech.astype(lang_q.dtype)],
        axis=1,
    )
    lens = speech_lengths + 4
    enc_out, enc_lens = encoder_mod.encode(
        params["encoder"], cfg.encoder_cfg(), x, lens
    )
    logits = enc_out.astype(jnp.float32) @ params["ctc_w"] + params["ctc_b"]
    return logits, enc_lens


def ctc_greedy_decode(logits: np.ndarray, length: int,
                      blank: int = 0) -> List[int]:
    """argmax → collapse repeats → drop blank (funasr ctc greedy path)."""
    ids = np.asarray(logits[:length]).argmax(-1)
    out = []
    prev = -1
    for t in ids:
        if t != prev and t != blank:
            out.append(int(t))
        prev = t
    return out


def from_funasr_sd(sd, cfg: SenseVoiceConfig) -> Dict:
    """funasr SenseVoiceSmall state_dict → param tree."""
    import jax.numpy as jnp

    from .convert import encoder_from_funasr_sd

    return {
        "embed": jnp.asarray(sd["embed.weight"], jnp.float32),
        "encoder": encoder_from_funasr_sd(
            sd, cfg.encoder_cfg(), prefix="encoder."
        ),
        "ctc_w": jnp.asarray(sd["ctc.ctc_lo.weight"], jnp.float32).T,
        "ctc_b": jnp.asarray(sd["ctc.ctc_lo.bias"], jnp.float32),
    }


class SenseVoiceSmall:
    """Inference wrapper with the reference call shape:
    `model.generate(input=wav, ...)` → [{"text": "<|zh|><|NEUTRAL|>
    <|Speech|>..."}]. Tokenizer pluggable (id→piece mapping)."""

    def __init__(
        self,
        model_dir: Optional[str] = None,
        config: Optional[SenseVoiceConfig] = None,
        params: Optional[Dict] = None,
        tokenizer=None,
        fs: int = 16000,
    ) -> None:
        import jax

        self.cfg = config or SenseVoiceConfig()
        from ..audio.frontend import WavFrontend

        cmvn_file = None
        if model_dir:
            mvn = os.path.join(model_dir, "am.mvn")
            cmvn_file = mvn if os.path.exists(mvn) else None
        self.frontend = WavFrontend(
            fs=fs, n_mels=80, lfr_m=7, lfr_n=6, dither=0.0,
            cmvn_file=cmvn_file,
        )
        if params is not None:
            self.params = params
        elif model_dir:
            from .convert import load_state_dict

            self.params = from_funasr_sd(load_state_dict(model_dir), self.cfg)
        else:
            self.params = init_params(self.cfg, jax.random.PRNGKey(0))
        self.tokenizer = tokenizer
        if tokenizer is None and model_dir:
            from ..utils.tokenizer import load_tokenizer

            try:
                self.tokenizer = load_tokenizer(model_dir)
            except Exception:
                self.tokenizer = None

    def generate(
        self,
        input,                        # wav path / array / list of either
        language: str = "auto",
        use_itn: bool = True,
        **_kw,
    ) -> List[Dict]:
        import jax.numpy as jnp

        from ..audio.io import load_audio

        wavs = input if isinstance(input, (list, tuple)) else [input]
        wavs = [load_audio(w, fs=self.frontend.fs)
                if isinstance(w, str) else np.asarray(w, np.float32)
                for w in wavs]
        speech, lens = self.frontend.extract(wavs)
        lid = LID_DICT.get(language, LID_DICT["auto"])
        tn = TEXTNORM_DICT["withitn" if use_itn else "woitn"]
        b = speech.shape[0]
        logits, out_lens = forward_ctc_logits(
            self.params, self.cfg, speech, lens,
            jnp.full((b,), lid, jnp.int32), jnp.full((b,), tn, jnp.int32),
        )
        logits = np.asarray(logits)
        out_lens = np.asarray(out_lens)
        results = []
        for i in range(b):
            ids = ctc_greedy_decode(logits[i], int(out_lens[i]))
            if self.tokenizer is not None:
                text = self.tokenizer.decode(ids, skip_special_tokens=False)
            else:
                text = " ".join(str(t) for t in ids)
            results.append({"text": text})
        return results
