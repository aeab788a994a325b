"""Audio I/O & frontend layer (reference SURVEY.md L0).

Replaces the reference's external native stack — ffmpeg/torchaudio/librosa
decode (reference model.py:362), torchaudio kaldi fbank inside funasr's
WavFrontend (reference model.py:372-377) — with:

- a dependency-free RIFF/WAV reader-writer + polyphase resampler (host side),
- a numpy golden-reference kaldi fbank (`fbank_ref`),
- a batched JAX fbank + LFR + CMVN pipeline compiled for TPU (`frontend`).
"""

from .io import read_wav, write_wav, resample, load_audio
from .frontend import WavFrontend, extract_fbank
from .fbank_ref import fbank_numpy, num_frames

__all__ = [
    "read_wav",
    "write_wav",
    "resample",
    "load_audio",
    "WavFrontend",
    "extract_fbank",
    "fbank_numpy",
    "num_frames",
]
