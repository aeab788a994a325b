"""Shared utilities: tokenizers, timers, logging, serialization."""
