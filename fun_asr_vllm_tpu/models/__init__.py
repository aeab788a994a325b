"""JAX model zoo: Qwen3 decoder, SAN-M audio encoder, Nano adaptor, and the
FunASRNano assembly (reference SURVEY.md L1/L2)."""
