"""Host-side audio I/O: RIFF/WAV parse + write, resampling, loading.

Replaces the reference's decode path (ffmpeg/torchaudio/librosa/soundfile —
reference model.py:362 `load_audio_text_image_video`, infer_kaldidata.py:101
`librosa.load`, run_audio_cat_cut.py `sf.read/write`) with a dependency-free
implementation: an own RIFF parser (PCM 8/16/24/32, float32/64,
WAVE_FORMAT_EXTENSIBLE, RF64 for >4 GB 4-channel files) and a polyphase
resampler. Non-WAV containers fall back to an `ffmpeg` subprocess when the
binary exists.

Both hot paths route through the C++ native runtime when built
(csrc/native.cpp via utils/native.py): `wav_probe`/`wav_decode_f32` for
container parse + PCM conversion and `resample_upfirdn_f32` for the
polyphase core (taps designed here to the scipy.signal.resample_poly
spec). The pure-python/scipy implementations below remain the always-
available fallback and the behavioural reference.
"""

from __future__ import annotations

import io
import os
import struct
import subprocess
from typing import Optional, Tuple, Union

import numpy as np

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _decode_pcm(data: bytes, bits: int, fmt: int) -> np.ndarray:
    if fmt == _WAVE_FORMAT_IEEE_FLOAT:
        dtype = np.float32 if bits == 32 else np.float64
        return np.frombuffer(data, dtype=dtype).astype(np.float32)
    if bits == 16:
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    if bits == 32:
        return np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    if bits == 8:
        return (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        val = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        return val.astype(np.float32) / float(1 << 23)
    raise ValueError(f"unsupported PCM bit depth: {bits}")


def read_wav(
    path_or_bytes: Union[str, bytes, os.PathLike],
    always_2d: bool = False,
) -> Tuple[np.ndarray, int]:
    """Parse a RIFF/RF64 WAV file → (float32 samples, sample_rate).

    Multi-channel data comes back as [N, C] when C > 1 (or always_2d),
    else [N]. Values are in [-1, 1].
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            buf = fh.read()
    from ..utils import native as _native

    decoded = _native.wav_read_native(buf)
    if decoded is not None:
        samples, rate = decoded
        if always_2d and samples.ndim == 1:
            samples = samples.reshape(-1, 1)
        return samples, rate
    f = io.BytesIO(buf)
    try:
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] not in (b"RIFF", b"RF64") or riff[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        is_rf64 = riff[:4] == b"RF64"
        fmt_code = None
        bits = None
        channels = 1
        rate = 16000
        data = None
        rf64_data_size = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, csize = struct.unpack("<4sI", hdr)
            if cid == b"ds64" and is_rf64:
                body = f.read(csize)
                # riff_size(8) data_size(8) sample_count(8) ...
                rf64_data_size = struct.unpack("<Q", body[8:16])[0]
            elif cid == b"fmt ":
                body = f.read(csize)
                fmt_code, channels, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if fmt_code == _WAVE_FORMAT_EXTENSIBLE and csize >= 40:
                    # sub-format GUID's first two bytes are the real code
                    fmt_code = struct.unpack("<H", body[24:26])[0]
            elif cid == b"data":
                size = csize
                if is_rf64 and csize == 0xFFFFFFFF and rf64_data_size is not None:
                    size = rf64_data_size
                data = f.read(size)
            else:
                f.seek(csize + (csize & 1), os.SEEK_CUR)
            if csize & 1 and cid in (b"fmt ", b"ds64", b"data"):
                f.seek(1, os.SEEK_CUR)
        if data is None or fmt_code is None:
            raise ValueError("WAV missing fmt/data chunk")
        samples = _decode_pcm(data, bits, fmt_code)
        if channels > 1:
            samples = samples[: len(samples) // channels * channels]
            samples = samples.reshape(-1, channels)
        elif always_2d:
            samples = samples.reshape(-1, 1)
        return samples, rate
    finally:
        f.close()


def write_wav(
    path: Union[str, os.PathLike],
    samples: np.ndarray,
    rate: int,
    subtype: str = "PCM_16",
) -> None:
    """Write float32/-1..1 (or int16) samples as a PCM WAV file."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    if subtype == "FLOAT":
        payload = samples.astype("<f4").tobytes()
        bits, fmt_code = 32, _WAVE_FORMAT_IEEE_FLOAT
    else:
        if samples.dtype != np.int16:
            samples = np.clip(samples, -1.0, 1.0)
            samples = (samples * 32767.0).round().astype("<i2")
        payload = samples.astype("<i2").tobytes()
        bits, fmt_code = 16, _WAVE_FORMAT_PCM
    block_align = channels * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(
            struct.pack(
                "<IHHIIHH", 16, fmt_code, channels, rate,
                rate * block_align, block_align, bits,
            )
        )
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


class StreamingWavWriter:
    """Chunked PCM16 WAV/RF64 writer for multi-hour multi-channel files.

    The reference writes aligned 4-channel audio in chunks, switching to
    RF64 when the payload reaches 4 GB (reference
    run_audio_cat_cut.py:400-420, soundfile format="RF64"). This writer
    streams int16 frames and finalizes the header sizes on close —
    RF64 with a ds64 chunk when the data exceeds the RIFF 32-bit limit
    or when `force_rf64`.

    Usage::

        with StreamingWavWriter(path, rate, channels) as w:
            for chunk in chunks:        # float [-1,1] or int16 [N, C]
                w.write(chunk)
    """

    def __init__(self, path, rate: int, channels: int,
                 force_rf64: bool = False) -> None:
        self.path = path
        self.rate = rate
        self.channels = channels
        self.force_rf64 = force_rf64
        self._f = open(path, "wb")
        self._data_bytes = 0
        block_align = channels * 2
        # placeholder RIFF header (patched on close; ds64 reserved via JUNK)
        self._f.write(b"RIFF" + struct.pack("<I", 0) + b"WAVE")
        # 28-byte chunk reserved: becomes ds64 for RF64, stays JUNK for WAV
        self._f.write(b"JUNK" + struct.pack("<I", 28) + b"\x00" * 28)
        self._f.write(
            b"fmt " + struct.pack(
                "<IHHIIHH", 16, _WAVE_FORMAT_PCM, channels, rate,
                rate * block_align, block_align, 16,
            )
        )
        self._data_hdr_pos = self._f.tell()
        self._f.write(b"data" + struct.pack("<I", 0))

    def write(self, samples: np.ndarray) -> None:
        samples = np.asarray(samples)
        if samples.ndim == 1:
            samples = samples[:, None]
        if samples.dtype != np.int16:
            work = np.clip(samples.astype(np.float32) * 32767.0,
                           -32768, 32767)
            samples = work.astype("<i2")
        payload = samples.astype("<i2", copy=False).tobytes()
        self._f.write(payload)
        self._data_bytes += len(payload)

    def close(self) -> None:
        if self._f.closed:
            return
        riff_size = self._f.tell() - 8
        rf64 = self.force_rf64 or self._data_bytes >= 0xFFFFFFFF - 64
        self._f.seek(0)
        if rf64:
            self._f.write(b"RF64" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE")
            n_frames = self._data_bytes // (self.channels * 2)
            self._f.write(
                b"ds64" + struct.pack("<I", 28)
                + struct.pack("<QQQI", riff_size, self._data_bytes,
                              n_frames, 0)
            )
            self._f.seek(self._data_hdr_pos)
            self._f.write(b"data" + struct.pack("<I", 0xFFFFFFFF))
        else:
            self._f.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
            self._f.seek(self._data_hdr_pos)
            self._f.write(b"data" + struct.pack("<I", self._data_bytes))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_pcm(path, channels: int = 1, dtype: str = "<i2") -> np.ndarray:
    """Raw headerless PCM16 → float32 [-1,1]; [N, C] when channels > 1
    (the reference's recorded-device capture format,
    run_audio_cat_cut.py stage 2 inputs)."""
    raw = np.fromfile(path, dtype=dtype)
    x = raw.astype(np.float32) / 32768.0
    if channels > 1:
        x = x[: len(x) // channels * channels].reshape(-1, channels)
    return x


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (the torchaudio.transforms.Resample analogue,
    reference infer.py:326-328)."""
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32)
    from math import gcd

    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    from ..utils import native as _native

    out = _native.resample_poly_native(np.asarray(x), up, down)
    if out is not None:
        return out
    from scipy.signal import resample_poly

    out = resample_poly(np.asarray(x, dtype=np.float64), up, down, axis=0)
    return out.astype(np.float32)


def _ffmpeg_decode(path: str, fs: int) -> Optional[np.ndarray]:
    try:
        proc = subprocess.run(
            ["ffmpeg", "-v", "quiet", "-i", path, "-f", "f32le", "-ac", "1",
             "-ar", str(fs), "-"],
            capture_output=True,
            check=True,
        )
        return np.frombuffer(proc.stdout, dtype="<f4").copy()
    except (FileNotFoundError, subprocess.CalledProcessError):
        return None


def load_audio(
    source: Union[str, np.ndarray, "list"],
    fs: int = 16000,
) -> np.ndarray:
    """Load any supported audio source → mono float32 at `fs` Hz.

    The `load_audio_text_image_video(path, fs)` analogue
    (reference model.py:362): accepts file paths (wav natively; other
    containers via ffmpeg if installed) or raw sample arrays (assumed fs).
    """
    if isinstance(source, np.ndarray):
        x = source.astype(np.float32)
    elif isinstance(source, (list, tuple)):
        x = np.asarray(source, dtype=np.float32)
    else:
        path = str(source)
        ext = os.path.splitext(path)[1].lower()
        if ext in (".wav", ".wave"):
            x, sr = read_wav(path)
            if x.ndim > 1:
                x = x.mean(axis=1)
            x = resample(x, sr, fs)
        elif ext in (".pcm", ".raw"):
            x = np.frombuffer(open(path, "rb").read(), dtype="<i2").astype(
                np.float32
            ) / 32768.0
        else:
            decoded = _ffmpeg_decode(path, fs)
            if decoded is None:
                raise ValueError(
                    f"cannot decode {path!r}: only wav/pcm are supported "
                    "natively and no ffmpeg binary is available"
                )
            x = decoded
    if x.ndim > 1:
        x = x.mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32)
