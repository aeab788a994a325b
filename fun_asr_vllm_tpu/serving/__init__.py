"""Online serving: FunASR-protocol WebSocket server, streaming client, and
the WER-gated QA checker (reference SURVEY.md L7)."""
