"""Tokenizer loading with a dependency-free fallback.

The reference uses the HF/Qwen tokenizer carried in the model dir
(reference model.py kwargs["tokenizer"], scp2nanojsonl.py:369). Here:
HF AutoTokenizer when tokenizer files exist; otherwise a byte-level
fallback so tiny test model dirs work without network or vocab files.
"""

from __future__ import annotations

import os
from typing import List, Sequence


class ByteTokenizer:
    """UTF-8 byte tokenizer: id = byte + 2 (0 = pad, 1 = eos).

    `<|im_end|>` encodes to the eos id — faithful to the real Qwen
    tokenizer, where <|im_end|> IS the eos special (id 151645,
    qwen3.py), so ChatML targets built by data_load_speech end in a
    true stop token and generation terminates exactly like production.

    Only used by test fixtures and fabricated model dirs; real model dirs
    ship a Qwen tokenizer."""

    pad_token_id = 0
    eos_token_id = 1
    vocab_size = 258

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids: List[int] = []
        parts = text.split("<|im_end|>")
        for i, part in enumerate(parts):
            ids.extend(b + 2 for b in part.encode("utf-8"))
            if i < len(parts) - 1:
                ids.append(self.eos_token_id)
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True,
               **_kw) -> str:
        # flagship-SHAPED fabricated dirs (make_test_model_dir
        # flagship=True) pair this tokenizer with the full 151936-id
        # vocab; random weights sample ids far past the byte range, so
        # fold them back instead of raising (these transcripts are
        # timing stand-ins, not text)
        data = bytes((i - 2) % 256 for i in ids if i >= 2)
        return data.decode("utf-8", errors="ignore")

    def batch_decode(self, batch, **kw):
        return [self.decode(ids, **kw) for ids in batch]

    def __call__(self, text, **kw):
        return {"input_ids": self.encode(text)}


_TOKENIZER_FILES = (
    "tokenizer.json", "tokenizer_config.json", "vocab.json", "merges.txt",
)


def load_tokenizer(model_dir: str):
    """HF tokenizer from `model_dir` (or its llm/ subdir); ByteTokenizer
    fallback when no tokenizer files exist."""
    for d in (model_dir, os.path.join(model_dir, "llm")):
        if any(os.path.exists(os.path.join(d, f)) for f in _TOKENIZER_FILES):
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(d)
    return ByteTokenizer()
