"""ASR-based QA checker (the reference asr_check.py:1-107 surface):
transcribe audio via a serving endpoint, accept iff WER(text, transcript)
is under a threshold. Used to gate TTS/recorded data quality.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Optional, Tuple

from ..text.normalize import detect_language
from ..text.wer import compute_wer_line
from .client import ASR_Client

logger = logging.getLogger(__name__)


def determine_lang(text: str) -> str:
    """Route zh vs en by character makeup (reference asr_check.py:10-40)."""
    return detect_language(text, en_ratio_threshold=0.5)


class ASR_Checker:
    def __init__(
        self,
        zh_host: str = "127.0.0.1", zh_port: int = 10095,
        en_host: Optional[str] = None, en_port: Optional[int] = None,
        wer_threshold: float = 0.3,
        itn: bool = False,
    ) -> None:
        self.zh = (zh_host, zh_port)
        self.en = (en_host or zh_host, en_port or zh_port)
        self.wer_threshold = wer_threshold
        self.itn = itn

    def check(self, text: str, audio_path: str) -> Tuple[bool, float, str]:
        """→ (passed, wer, transcript) (reference asr_check.py:81-98)."""
        lang = determine_lang(text)
        host, port = self.zh if lang == "zh" else self.en
        client = ASR_Client(host=host, port=port, mode="offline", itn=self.itn)
        transcript = asyncio.run(client.transcribe(audio_path))
        result = compute_wer_line(text, transcript, tochar=True)
        wer = result["stats"]["wer"]  # already a fraction (reference scale)
        if result["stats"]["all"] == 0:
            # an empty-tokenizing reference yields wer=0 regardless of
            # the hypothesis (reference compute_wer_line.py:330 parity)
            # — that would auto-pass ANY transcript, defeating the gate
            logger.warning("asr_check: reference tokenized empty — fail")
            return False, wer, transcript
        passed = wer < self.wer_threshold
        logger.info(
            "asr_check lang=%s wer=%.3f passed=%s", lang, wer, passed
        )
        return passed, wer, transcript


def main():
    import argparse

    ap = argparse.ArgumentParser(description="WER-gated ASR QA check")
    ap.add_argument("--text", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10095)
    ap.add_argument("--wer_threshold", type=float, default=0.3)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    checker = ASR_Checker(zh_host=args.host, zh_port=args.port,
                          wer_threshold=args.wer_threshold)
    passed, wer, transcript = checker.check(args.text, args.audio)
    print(f"passed={passed} wer={wer:.3f} transcript={transcript}")
    raise SystemExit(0 if passed else 1)


if __name__ == "__main__":
    main()
