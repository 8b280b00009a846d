"""PVS (PPM video stream) container: the third REAL modality.

Real video pipelines move uncompressed frames as Netpbm streams all the
time (``ffmpeg -f image2pipe``, ``ppmtoy4m`` and friends pipe exactly
this: concatenated P6 images). PVS formalizes that as a container the
engine can parse without any codec library:

    PVS\\n
    <fps> <n_frames>\\n
    <frame 0 as a complete P6 image><frame 1>...<frame n-1>

Each frame is a self-describing P6 image (the ppm.py grammar — comments,
whitespace and all), so the stream is split by *parsing*, not by fixed
offsets: a frame-size bug anywhere desynchronizes every later frame and
the arithmetic oracle catches it.

The fixture is closed-form in ``doc_id`` (params, dims, and every pixel
byte of every frame), so a SQL oracle recomputes what a correct
demux+decode+sample must produce without ever seeing an encoder.

Scale: attach/demux/sample all run inside Arrow batches (mapInPandas);
payloads never touch the driver; per-document work is independent →
embarrassingly parallel. Frame SAMPLING (not full decode) is the point
at 100 TB: the sampler emits every Nth frame's features and drops the
raster immediately, so downstream state is |sampled frames| × features,
not bytes.
"""

from __future__ import annotations

import numpy as np

from .ppm import CHANNELS, _next_token, encode_ppm, fixture_dims

#: fixture parameters — closed-form in doc_id (SQL-recomputable)
def fixture_video_params(doc_id: int) -> tuple[int, int]:
    """→ (fps, n_frames): fps = 2 + id%3 (2..4), frames = 3 + id%4 (3..6)."""
    return 2 + doc_id % 3, 3 + doc_id % 4


def fixture_frame_pixels(doc_id: int, frame: int, width: int, height: int) -> np.ndarray:
    """pixel[i] of frame f = (doc_id*7 + f*11 + i) % 256 — distinct per
    frame so a frame-order bug breaks the checksums."""
    n = CHANNELS * width * height
    return ((doc_id * 7 + frame * 11 + np.arange(n)) % 256).astype(np.uint8)


def encode_pvs(fps: int, frames: list[bytes]) -> bytes:
    """Container header + concatenated P6 frames."""
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    return f"PVS\n{fps} {len(frames)}\n".encode() + b"".join(frames)


def _decode_frame_at(data: bytes, pos: int) -> tuple[int, int, bytes, int]:
    """Decode one P6 frame starting at ``pos`` → (w, h, raster, next_pos).
    Same header grammar as ppm.decode_ppm, but streaming: returns where
    the next frame begins."""
    magic, pos = _next_token(data, pos)
    if magic != b"P6":
        raise ValueError(f"not a P6 frame (magic {magic!r})")
    w_tok, pos = _next_token(data, pos)
    h_tok, pos = _next_token(data, pos)
    max_tok, pos = _next_token(data, pos)
    width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # single whitespace byte before the raster
    end = pos + CHANNELS * width * height
    raster = data[pos:end]
    if len(raster) != CHANNELS * width * height:
        raise ValueError("truncated PVS frame raster")
    return width, height, raster, end


def decode_pvs(data: bytes) -> tuple[int, list[tuple[int, int, bytes]]]:
    """→ (fps, [(width, height, raster), ...]) for every frame."""
    if not data.startswith(b"PVS\n"):
        raise ValueError("not a PVS stream")
    nl = data.index(b"\n", 4)
    fps_s, n_s = data[4:nl].split()
    fps, n_frames = int(fps_s), int(n_s)
    frames = []
    pos = nl + 1
    for _ in range(n_frames):
        w, h, raster, pos = _decode_frame_at(data, pos)
        frames.append((w, h, raster))
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after last frame")
    return fps, frames


def make_fixture_pvs(doc_id: int) -> bytes:
    fps, n_frames = fixture_video_params(doc_id)
    w, h = fixture_dims(doc_id)
    return encode_pvs(
        fps,
        [
            encode_ppm(w, h, fixture_frame_pixels(doc_id, f, w, h))
            for f in range(n_frames)
        ],
    )
