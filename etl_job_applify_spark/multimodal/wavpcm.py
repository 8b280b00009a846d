"""Dependency-free WAV/PCM audio codec via stdlib ``wave``.

The second REAL modality (images: ppm.py): RIFF/WAVE with 16-bit PCM is
fully encodable/decodable with the standard library, so the audio decode
path needs no codec jars or native libs. Everything runs inside Arrow
batches over in-memory bytes — payloads never touch the driver.

Same arithmetic-fixture trick as the PPM path: channel count, frame
count and EVERY sample value are closed-form in ``doc_id``, so a SQL
oracle can recompute what a correct decode must produce (sample counts,
first sample, peak, additive checksum) without parsing a single RIFF
byte. If the encoder and decoder disagreed anywhere — header layout,
interleaving, signedness, endianness — the checksums break.
"""

from __future__ import annotations

import io
import wave

import numpy as np

SAMPLE_RATE = 8000
SAMPLE_WIDTH = 2  # 16-bit PCM


def fixture_params(doc_id: int) -> tuple[int, int]:
    """(n_channels, n_frames): 1-2 channels, 20-30 frames."""
    return 1 + doc_id % 2, 20 + doc_id % 11


def fixture_samples(doc_id: int, n_samples: int) -> np.ndarray:
    """Interleaved signed samples: s(i) = (doc_id*13 + i*17) % 65536 - 32768
    over the flat frame×channel index."""
    u = (doc_id * 13 + np.arange(n_samples) * 17) % 65536
    return (u - 32768).astype(np.int16)


def encode_wav(
    n_channels: int, samples: np.ndarray, sample_rate: int = SAMPLE_RATE
) -> bytes:
    """16-bit little-endian PCM WAV bytes from interleaved samples."""
    if samples.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {samples.dtype}")
    if samples.size % n_channels:
        raise ValueError(
            f"{samples.size} samples not divisible by {n_channels} channels"
        )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(SAMPLE_WIDTH)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (n_channels, sample_rate, n_frames, interleaved int16 samples)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != SAMPLE_WIDTH:
            raise ValueError(
                f"only 16-bit PCM supported, got width {w.getsampwidth()}"
            )
        n_channels = w.getnchannels()
        rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    samples = np.frombuffer(raw, dtype="<i2")
    if samples.size != n_frames * n_channels:
        raise ValueError("truncated PCM payload")
    return n_channels, rate, n_frames, samples
