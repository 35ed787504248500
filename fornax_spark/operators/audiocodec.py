"""Pure-stdlib WAV (RIFF/PCM) codec: the audio analogue of
operators/imagecodec.py — real decode with zero external dependencies,
so the multimodal audio path stops being a stub in this container.

Format per the public RIFF/WAVE spec (also implemented by CPython's
`wave` module, which this uses for container parsing): a RIFF header,
an `fmt ` chunk (PCM format code 1, channels, sample rate, bits per
sample), and a `data` chunk of interleaved little-endian samples.
16-bit and 8-bit PCM are supported — the formats `wave` itself writes.

The reference engine has no audio pipeline; this implements the
multimodal-column contract the build brief adds on top (decode /
feature-extract behind a typed binary column).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """int16 samples (n,) mono or (n, ch) -> WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, float32 samples in [-1, 1], shape
    (n_samples, n_channels))."""
    if payload is None:
        raise NotImplementedError(
            "payload=None marks assets whose codec is not available in "
            "this environment"
        )
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # 8-bit PCM is unsigned, biased at 128
        arr = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width: {width}")
    return rate, arr.reshape(-1, n_ch)
