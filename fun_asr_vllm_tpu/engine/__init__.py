"""TPU serving engine (the vLLM analogue, reference SURVEY.md L3).

Continuous-batching decode of Qwen3 from prompt embeddings: paged KV cache
in HBM, jitted bucketed prefill + fixed-slot decode step functions (the
CUDA-graph-capture analogue, reference infer_kaldidata.py:648-656), greedy/
top-p sampling, and a vLLM-call-shaped `LLM.generate` front
(reference model.py:645-653, infer.py:468-475).
"""

from .sampling import SamplingParams
from .engine import LLM, CompletionOutput, FusedWaveHandle, RequestOutput
from .async_engine import AsyncLLM

__all__ = [
    "LLM", "AsyncLLM", "SamplingParams", "CompletionOutput",
    "FusedWaveHandle", "RequestOutput",
]
