"""Dependency-free PPM (P6) codec + nearest-neighbor resize.

One deterministic, bit-exact image format makes the multimodal decode
path REAL without codec libraries: PPM P6 is a whitespace-tokenized
header (magic, width, height, maxval, ``#`` comments allowed) followed
by raw RGB bytes. Everything here is pure Python/numpy over in-memory
bytes and runs inside Arrow batches (mapInPandas) — payloads never touch
the driver.

The synthetic fixture is arithmetic in ``doc_id`` only (dims and every
pixel byte are closed-form), so a SQL oracle can recompute expected
width/height/checksums WITHOUT parsing bytes — decoding is checked
end-to-end against an engine that never saw the encoder.
"""

from __future__ import annotations

import numpy as np

#: fixture dimensioning — small and coprime-ish so corpora mix shapes
FIXTURE_MAX_W = 5  # width  = 4 + doc_id % 5  → 4..8
FIXTURE_MAX_H = 4  # height = 3 + doc_id % 4  → 3..6
CHANNELS = 3


def fixture_dims(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % FIXTURE_MAX_W, 3 + doc_id % FIXTURE_MAX_H


def fixture_pixels(doc_id: int, width: int, height: int) -> np.ndarray:
    """pixel[i] = (doc_id * 7 + i) % 256 over the flat RGB buffer."""
    n = CHANNELS * width * height
    return ((doc_id * 7 + np.arange(n)) % 256).astype(np.uint8)


def encode_ppm(width: int, height: int, pixels: bytes | np.ndarray) -> bytes:
    """P6 bytes; emits a comment line so decoders must handle them."""
    buf = np.asarray(bytearray(pixels), dtype=np.uint8)
    if buf.size != CHANNELS * width * height:
        raise ValueError(
            f"pixel buffer {buf.size} != 3*{width}*{height}"
        )
    header = f"P6\n# synthetic fixture\n{width} {height}\n255\n".encode()
    return header + buf.tobytes()


def _next_token(data: bytes, pos: int) -> tuple[bytes, int]:
    """PPM header token: skip whitespace and ``#`` comments, read to the
    next whitespace byte."""
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in b" \t\r\n\x0b\x0c":
            pos += 1
        elif c == ord("#"):
            while pos < n and data[pos] != ord("\n"):
                pos += 1
        else:
            break
    start = pos
    while pos < n and data[pos] not in b" \t\r\n\x0b\x0c":
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return data[start:pos], pos


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw RGB bytes).

    Full P6 grammar: arbitrary whitespace between header tokens,
    ``#``-comments anywhere in the header, exactly ONE whitespace byte
    between maxval and the raster (a raster may legitimately begin with a
    whitespace-valued byte, so only one is consumed).
    """
    magic, pos = _next_token(data, 0)
    if magic != b"P6":
        raise ValueError(f"not a P6 PPM (magic {magic!r})")
    w_tok, pos = _next_token(data, pos)
    h_tok, pos = _next_token(data, pos)
    max_tok, pos = _next_token(data, pos)
    width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # the single whitespace separating header from raster
    raster = data[pos : pos + CHANNELS * width * height]
    if len(raster) != CHANNELS * width * height:
        raise ValueError("truncated PPM raster")
    return width, height, CHANNELS, raster


def resize_nearest(
    pixels: bytes, width: int, height: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample: source index = (dst * src_dim) // dst_dim
    (floor mapping — the SQL-oracle-expressible formulation)."""
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, CHANNELS)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return img[ys][:, xs].tobytes()
