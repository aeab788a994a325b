"""CT-Transformer punctuation model in functional JAX (funasr `ct-punc`,
the aux model the reference's run_add_punc.py:7-16 loads).

funasr architecture (funasr/models/ct_transformer/model.py):
- `embed`: nn.Embedding(vocab≈272727, embed_unit=256) over word/char
  tokens (tokens.json in the model dir);
- `encoder`: SAN-M encoder over the embeddings (input_size=embed_unit,
  output_size=att_unit, the same EncoderLayerSANM stack as
  models/encoder.py — keys convert via encoder_from_funasr_sd);
- `decoder`: Linear(att_unit → num_classes) per-token punctuation
  classes ``["<unk>", "_", "，", "。", "？", "、"]`` — each predicted
  class is appended after its token ("_" = no punctuation).

Tokenization: greedy longest-match against the model vocab (the funasr
CodeMixTokenizer analogue for zh text); characters outside the vocab map
to <unk> but are kept verbatim in the output.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

PUNC_LIST = ("<unk>", "_", "，", "。", "？", "、")


@dataclasses.dataclass(frozen=True)
class CTPuncConfig:
    vocab_size: int = 272727
    embed_unit: int = 256
    att_unit: int = 256
    attention_heads: int = 8
    linear_units: int = 1024
    num_blocks: int = 4
    kernel_size: int = 11
    sanm_shift: int = 0
    num_classes: int = len(PUNC_LIST)

    def encoder_cfg(self):
        import jax.numpy as jnp

        from . import encoder as encoder_mod

        return encoder_mod.SANMEncoderConfig(
            input_size=self.embed_unit, output_size=self.att_unit,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units, num_blocks=self.num_blocks,
            kernel_size=self.kernel_size, sanm_shift=self.sanm_shift,
            dtype=jnp.float32,
        )


def init_params(cfg: CTPuncConfig, key) -> Dict:
    import jax
    import jax.numpy as jnp

    from . import encoder as encoder_mod

    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "embed": jax.random.normal(
            k0, (cfg.vocab_size, cfg.embed_unit), jnp.float32
        ) * 0.02,
        "encoder": encoder_mod.init_params(cfg.encoder_cfg(), k1),
        "dec_w": jax.random.normal(
            k2, (cfg.att_unit, cfg.num_classes), jnp.float32
        ) * cfg.att_unit ** -0.5,
        "dec_b": jnp.zeros((cfg.num_classes,), jnp.float32),
    }


def forward(params: Dict, cfg: CTPuncConfig, token_ids, lengths):
    """[B, T] token ids → per-token class logits [B, T, num_classes]."""
    import jax.numpy as jnp

    from . import encoder as encoder_mod

    x = params["embed"][token_ids]  # [B, T, E]
    enc_out, _ = encoder_mod.encode(
        params["encoder"], cfg.encoder_cfg(), x, lengths
    )
    return enc_out.astype(jnp.float32) @ params["dec_w"] + params["dec_b"]


def from_funasr_sd(sd, cfg: CTPuncConfig) -> Dict:
    import jax.numpy as jnp

    from .convert import encoder_from_funasr_sd

    return {
        "embed": jnp.asarray(sd["embed.weight"], jnp.float32),
        "encoder": encoder_from_funasr_sd(
            sd, cfg.encoder_cfg(), prefix="encoder."
        ),
        "dec_w": jnp.asarray(sd["decoder.weight"], jnp.float32).T,
        "dec_b": jnp.asarray(sd["decoder.bias"], jnp.float32),
    }


class GreedyVocabTokenizer:
    """Longest-match tokenization against a token list (tokens.json)."""

    def __init__(self, tokens: Sequence[str], unk: str = "<unk>") -> None:
        self.token_to_id = {t: i for i, t in enumerate(tokens)}
        self.unk_id = self.token_to_id.get(unk, 0)
        self.max_len = max((len(t) for t in tokens), default=1)

    def tokenize(self, text: str) -> Tuple[List[str], List[int]]:
        pieces: List[str] = []
        ids: List[int] = []
        i = 0
        while i < len(text):
            matched = False
            for ln in range(min(self.max_len, len(text) - i), 0, -1):
                piece = text[i : i + ln]
                if piece in self.token_to_id:
                    pieces.append(piece)
                    ids.append(self.token_to_id[piece])
                    i += ln
                    matched = True
                    break
            if not matched:
                pieces.append(text[i])
                ids.append(self.unk_id)
                i += 1
        return pieces, ids


class CTPunc:
    """`ct-punc`-shaped punctuator: callable text → punctuated text
    (the reference's AutoModel(model='ct-punc').generate surface)."""

    def __init__(
        self,
        model_dir: Optional[str] = None,
        config: Optional[CTPuncConfig] = None,
        params: Optional[Dict] = None,
        tokens: Optional[Sequence[str]] = None,
        punc_list: Sequence[str] = PUNC_LIST,
    ) -> None:
        import jax

        self.punc_list = list(punc_list)
        if model_dir and tokens is None:
            tok_path = os.path.join(model_dir, "tokens.json")
            if os.path.exists(tok_path):
                with open(tok_path, encoding="utf-8") as f:
                    tokens = json.load(f)
        if tokens is None:
            # char-level fallback vocab (CJK + ascii) for weight-less use
            tokens = ["<unk>"] + [chr(c) for c in range(0x4E00, 0x4E00 + 512)]
        self.tokenizer = GreedyVocabTokenizer(tokens)
        self.cfg = config or CTPuncConfig(
            vocab_size=max(len(tokens), 2)
        )
        if params is not None:
            self.params = params
        elif model_dir:
            from .convert import load_state_dict

            self.params = from_funasr_sd(load_state_dict(model_dir), self.cfg)
        else:
            self.params = init_params(self.cfg, jax.random.PRNGKey(0))

    def __call__(self, text: str) -> str:
        import jax.numpy as jnp

        text = text.strip()
        if not text:
            return text
        pieces, ids = self.tokenizer.tokenize(text)
        if not ids:
            return text
        logits = forward(
            self.params, self.cfg,
            jnp.asarray([ids], jnp.int32),
            jnp.asarray([len(ids)], jnp.int32),
        )
        classes = np.asarray(logits[0]).argmax(-1)
        out = []
        for piece, cls in zip(pieces, classes):
            out.append(piece)
            punc = self.punc_list[int(cls)]
            if punc not in ("<unk>", "_"):
                out.append(punc)
        result = "".join(out)
        # sentence-final period like the funasr post-step
        if result and result[-1] not in "，。！？、":
            result += "。"
        elif result.endswith("，") or result.endswith("、"):
            result = result[:-1] + "。"
        return result

    def generate(self, input: str, **_kw) -> List[Dict]:
        return [{"text": self(input)}]
