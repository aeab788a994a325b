"""Text processing & scoring layer (reference SURVEY.md L5).

Pure-CPU, dependency-free re-implementations of:
- char/word WER with full alignment (reference compute_wer_line.py),
- icefall-style transcript storage & error stats (reference infer.py:21-213),
- language detection / alimeeting cleanup (reference infer.py:334-371,
  kaldi_text_normalizer.py:34-59),
- rule-based Chinese/English text normalization and Chinese inverse text
  normalization, standing in for WeTextProcessing's OpenFst grammars
  (reference kaldi_text_normalizer.py, kaldi_text_itn.py).
"""

from .wer import characterize, strip_tags, compute_wer_line, Calculator, align
from .error_stats import store_transcripts, write_error_stats
from .normalize import (
    detect_language,
    normalize_text_alimeeting,
    remove_angle_bracket_content,
    nfkc,
)
from .zh_tn import ZhNormalizer
from .zh_itn import ZhInverseNormalizer, inverse_normalize_text
from .en_tn import EnNormalizer
from .tn_api import normalize_text

__all__ = [
    "characterize",
    "strip_tags",
    "compute_wer_line",
    "Calculator",
    "align",
    "store_transcripts",
    "write_error_stats",
    "detect_language",
    "normalize_text_alimeeting",
    "remove_angle_bracket_content",
    "nfkc",
    "ZhNormalizer",
    "ZhInverseNormalizer",
    "EnNormalizer",
    "normalize_text",
    "inverse_normalize_text",
]
