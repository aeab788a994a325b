"""CLI entry points preserving the reference's public command surfaces."""
