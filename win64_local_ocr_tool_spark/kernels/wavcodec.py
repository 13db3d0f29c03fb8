"""PCM WAV decode via the stdlib ``wave`` module.

The multimodal audio seam (reference analog: audio-ish payload loads,
``backend/annotator/recognition/dataset.py:259-290``) gets a real
decoder for PCM WAV — the container's one stdlib-decodable audio
format. Compressed codecs stay behind the documented stub (swap in
soundfile/ffmpeg).
"""

from __future__ import annotations

import io
import wave

import numpy as np

_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_frames, n_channels, sample_width_bytes)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        return (
            w.getframerate(),
            w.getnframes(),
            w.getnchannels(),
            w.getsampwidth(),
        )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV -> (sample_rate, frames x channels int array)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n, ch, width = w.getnframes(), w.getnchannels(), w.getsampwidth()
        if width not in _DTYPES:
            raise ValueError(f"unsupported sample width {width}")
        raw = w.readframes(n)
    samples = np.frombuffer(raw, dtype=_DTYPES[width]).reshape(-1, ch)
    return rate, samples


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(rate, frames x channels int16 array) -> PCM WAV bytes (test
    fixtures and the resample emit path)."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()
