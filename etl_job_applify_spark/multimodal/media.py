"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The engine treats images/audio/video as what they are at 100 TB: opaque
bytes flowing through parquet (which stores binary natively, splittable
and compressed) with a typed metadata struct alongside. All per-item
compute — decode, resize, feature extraction, frame sampling — runs as
Arrow-batched ``mapInPandas`` so payloads never round-trip through
driver memory and Python sees whole columns per batch, not rows.

Image decode and resize are REAL for PPM/P6 (dependency-free codec in
ppm.py, oracle-checked end-to-end via the arithmetic fixture —
``attach_fake_ppm``); audio decode is REAL for WAV/16-bit PCM (stdlib
``wave``, wavpcm.py, fixture ``attach_fake_wav``); formats that need
codec libraries (JPEG/PNG via Pillow, MP3/AAC, video via ffmpeg) are
stubbed behind clearly-marked ``NotImplementedError`` gates since those
libs are not in this container. The deterministic feature extractors ``media_byte_features``
(raw bytes) and ``media_char_features`` (a REAL utf-8 decode step →
code points) are cross-checked by the DuckDB oracle for any text.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

import os

#: repo root (the package's parent), captured BY VALUE into every Arrow
#: worker closure below: a Python worker process does not inherit the
#: driver's sys.path, and capturing a package module object in a closure
#: pickles it by REFERENCE (cloudpickle re-imports it on the worker and
#: fails when the driver was launched outside the repo). Each closure
#: therefore bootstraps sys.path from this plain string and imports the
#: codec module inside the worker.
_PKG_PARENT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

#: typed metadata carried next to every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_fake_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media fixture: UTF-8 bytes of the text as the binary
    payload + a metadata struct. Stands in for real image/audio columns so
    the plumbing is exercised on shared fixtures."""
    return docs.select(
        id_col,
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            F.lit("txt").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


_FEATURES_SCHEMA = "doc_id bigint, byte_len bigint, first_byte int, byte_checksum bigint"


def media_byte_features(media: DataFrame) -> DataFrame:
    """Arrow-batched byte features over the binary column.

    The feature set (length, first byte, additive checksum mod 65536) is
    deliberately codec-free and deterministic → DuckDB-oracle-checkable,
    proving the mapInPandas path (schema in/out, batch shapes) without
    codec libs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    # nullable Int32: empty payloads yield NULL, and a
                    # plain int32 cast would crash on the resulting NaN
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else None
                    ).astype("Int32"),
                    "byte_checksum": payloads.map(
                        lambda b: int(sum(b) % 65536)
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=_FEATURES_SCHEMA)


def attach_fake_ppm(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PPM (P6) image fixture: dims and every pixel byte are
    closed-form in ``doc_id`` (ppm.fixture_dims / fixture_pixels), so a
    SQL oracle can recompute what a correct decode must produce without
    ever parsing bytes. Generated inside Arrow batches — no driver data."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import ppm

        for pdf in it:
            ids = pdf[id_col]
            payloads, widths, heights = [], [], []
            for doc_id in ids:
                w, h = ppm.fixture_dims(int(doc_id))
                payloads.append(
                    ppm.encode_ppm(w, h, ppm.fixture_pixels(int(doc_id), w, h))
                )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": ids.astype("int64"),
                    "media": payloads,
                    "meta": [
                        {
                            "format": "ppm",
                            "width": w,
                            "height": h,
                            "duration_ms": None,
                        }
                        for w, h in zip(widths, heights)
                    ],
                }
            )

    schema = (
        "doc_id bigint, media binary, "
        "meta struct<format:string,width:int,height:int,duration_ms:bigint>"
    )
    return docs.select(id_col).mapInPandas(batches, schema=schema)


_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, pixels binary"
)


def decode_image_batch(media: DataFrame) -> DataFrame:
    """Image decode via mapInPandas.

    REAL for PPM/P6 payloads (dependency-free parser in ppm.py, comment
    and whitespace grammar included); other codecs (JPEG/PNG/...) need
    Pillow, which is not in this container, and stay behind a
    clearly-marked ``NotImplementedError`` gate.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import ppm

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "channels": [],
                   "pixels": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(payload)
                if data[:2] == b"P6":
                    w, h, c, raster = ppm.decode_ppm(data)
                else:  # pragma: no cover - env-dependent
                    try:
                        from PIL import Image  # noqa: F401
                    except ImportError as exc:
                        raise NotImplementedError(
                            "non-PPM decode requires Pillow, not present "
                            "in this image"
                        ) from exc
                    raise NotImplementedError(
                        "wire Image.open for non-PPM formats here"
                    )
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["pixels"].append(raster)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=_DECODE_SCHEMA)


_FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def extract_frames_batch(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling for GENERIC containers (mp4/mkv) via
    mapInPandas. STUB — decoding arbitrary containers requires ffmpeg
    bindings, absent in this image; only the schema / partitioning /
    Arrow-batch contract is defined here. The REAL, dependency-free
    video path exists alongside: ``multimodal/video.py`` demuxes the
    PVS fixture container and samples/decodes frames end-to-end
    (q169_video_frames, q204_scene_cuts — pixel-level oracled), so
    frame sampling as a capability is implemented and gated; this stub
    is only the ffmpeg-backed generalization."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "frame extraction requires ffmpeg bindings, not present; "
            "schema/partitioning contract defined here"
        )
        yield  # pragma: no cover

    return media.mapInPandas(batches, schema=_FRAMES_SCHEMA)


_RESIZE_SCHEMA = "doc_id bigint, media binary, meta struct<format:string,width:int,height:int,duration_ms:bigint>"


def resize_image_batch(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize via mapInPandas: same (id, media, meta) shape out with
    meta.width/height updated — payload→payload, so it composes with
    decode/feature stages in either order.

    REAL for PPM/P6 (decode → nearest-neighbor resample → re-encode, all
    dependency-free); other codecs stay behind the Pillow gate."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import ppm

        for pdf in it:
            payloads, metas = [], []
            for payload in pdf["media"]:
                data = bytes(payload)
                if data[:2] != b"P6":  # pragma: no cover - env-dependent
                    raise NotImplementedError(
                        f"resize to {width}x{height} for non-PPM formats "
                        "requires Pillow, not present in this image"
                    )
                w, h, _, raster = ppm.decode_ppm(data)
                resized = ppm.resize_nearest(raster, w, h, width, height)
                payloads.append(ppm.encode_ppm(width, height, resized))
                metas.append(
                    {
                        "format": "ppm",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, schema=_RESIZE_SCHEMA)


def brighten_image_batch(media: DataFrame, delta: int) -> DataFrame:
    """Uniform brightness shift via mapInPandas: every pixel byte gets
    ``delta`` added with SATURATION at 255 (the standard image-editing
    semantic), payload→payload so it composes like resize. REAL for
    PPM/P6; other codecs stay behind the Pillow gate. This is the
    near-duplicate generator the perceptual-hash operator is measured
    against — a brightness-shifted copy has different bytes but (mostly)
    the same block-mean structure."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import ppm

        for pdf in it:
            payloads, metas = [], []
            for payload in pdf["media"]:
                data = bytes(payload)
                if data[:2] != b"P6":  # pragma: no cover - env-dependent
                    raise NotImplementedError(
                        "brightness shift for non-PPM formats requires "
                        "Pillow, not present in this image"
                    )
                w, h, _, raster = ppm.decode_ppm(data)
                arr = np.frombuffer(raster, dtype=np.uint8).astype(np.int32)
                # clip BOTH ends: a negative delta must saturate at 0,
                # not wrap through the uint8 cast (5 - 16 → 245)
                shifted = np.clip(arr + delta, 0, 255).astype(np.uint8)
                payloads.append(ppm.encode_ppm(w, h, shifted))
                metas.append(
                    {"format": "ppm", "width": w, "height": h,
                     "duration_ms": None}
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, schema=_RESIZE_SCHEMA)


_AHASH_SCHEMA = "doc_id bigint, ahash bigint"


def ahash_image_batch(
    media: DataFrame, grid_w: int = 4, grid_h: int = 3
) -> DataFrame:
    """Average-hash perceptual fingerprint, INTEGER-EXACT so an external
    oracle can replay it: the image divides into a grid_h × grid_w grid
    with the same floor mapping the resize kernel uses (cell(gy, gx)
    covers rows y with (y*grid_h)//h == gy); each cell's bit is 1 iff
    its byte-mean exceeds the whole-image byte-mean, compared by integer
    cross-multiplication ``cell_sum * total_n > total_sum * cell_n`` —
    no float division anywhere, so the hash is bit-identical in any
    engine. Bit (gy, gx) lands at position gy*grid_w + gx.

    The hash is invariant under uniform brightness shifts that don't
    saturate (both sides of the comparison move together) — the property
    that makes it a NEAR-duplicate key where a byte checksum is an
    exact-duplicate key. Cells narrower than one pixel (w < grid_w)
    contribute 0 bits, matching a SQL replay where the empty cell simply
    has no rows."""

    if grid_w * grid_h > 63:
        # bits pack into ONE signed int64 via left-shifts of the cell
        # index; cell 63 would shift into the sign bit and larger grids
        # are undefined shifts — fail loudly instead of returning
        # silently-garbage hashes (an 8x8 caller hits this)
        raise ValueError(
            f"grid_w*grid_h must be <= 63 to pack into int64, got "
            f"{grid_w}x{grid_h}={grid_w * grid_h}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import ppm

        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(payload)
                if data[:2] != b"P6":  # pragma: no cover - env-dependent
                    raise NotImplementedError(
                        "ahash for non-PPM formats requires Pillow, "
                        "not present in this image"
                    )
                w, h, c, raster = ppm.decode_ppm(data)
                arr = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                i = np.arange(arr.size)
                p = i // c
                gy = ((p // w) * grid_h) // h
                gx = ((p % w) * grid_w) // w
                cell = gy * grid_w + gx
                n_cells = grid_h * grid_w
                sums = np.bincount(cell, weights=arr, minlength=n_cells)
                ns = np.bincount(cell, minlength=n_cells)
                total_sum, total_n = int(arr.sum()), arr.size
                bits = (sums.astype(np.int64) * total_n) > (total_sum * ns)
                ids.append(int(doc_id))
                hashes.append(
                    int(
                        (
                            bits.astype(np.int64)
                            << np.arange(n_cells, dtype=np.int64)
                        ).sum()
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    return media.mapInPandas(batches, schema=_AHASH_SCHEMA)


def attach_fake_wav(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV/PCM audio fixture: channels, frame count and
    every sample are closed-form in ``doc_id`` (wavpcm.fixture_params /
    fixture_samples), so a SQL oracle can recompute what a correct
    decode must produce without parsing RIFF bytes. Generated inside
    Arrow batches — no driver data."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import wavpcm

        for pdf in it:
            ids = pdf[id_col]
            payloads, metas = [], []
            for doc_id in ids:
                ch, fr = wavpcm.fixture_params(int(doc_id))
                payloads.append(
                    wavpcm.encode_wav(
                        ch, wavpcm.fixture_samples(int(doc_id), fr * ch)
                    )
                )
                metas.append(
                    {
                        "format": "wav",
                        "width": None,
                        "height": None,
                        "duration_ms": fr * 1000 // wavpcm.SAMPLE_RATE,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": ids.astype("int64"), "media": payloads,
                 "meta": metas}
            )

    schema = (
        "doc_id bigint, media binary, "
        "meta struct<format:string,width:int,height:int,duration_ms:bigint>"
    )
    return docs.select(id_col).mapInPandas(batches, schema=schema)


def gain_audio_batch(media: DataFrame, factor: int) -> DataFrame:
    """Integer gain with int16 SATURATION (the standard audio-editing
    semantic), payload→payload so it composes like the image transforms.
    REAL for WAV/16-bit PCM; compressed codecs stay behind the decode
    gate. This is the near-duplicate generator the audio fingerprint
    operator is measured against — a gained copy has different bytes
    but the same energy ORDERING wherever saturation doesn't reshape a
    window's energy relative to its neighbor (gain scales every window
    energy by factor², preserving comparisons exactly)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import wavpcm

        for pdf in it:
            payloads, metas = [], []
            for payload in pdf["media"]:
                data = bytes(payload)
                if data[:4] != b"RIFF":  # pragma: no cover - env-dependent
                    raise NotImplementedError(
                        "gain for compressed audio requires codec libs "
                        "not present in this image; WAV/PCM is the real "
                        "path"
                    )
                ch, rate, frames, samples = wavpcm.decode_wav(data)
                scaled = np.clip(
                    samples.astype(np.int64) * factor, -32768, 32767
                ).astype(np.int16)
                payloads.append(wavpcm.encode_wav(ch, scaled, rate))
                metas.append(
                    {
                        "format": "wav",
                        "width": None,
                        "height": None,
                        "duration_ms": frames * 1000 // rate,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": payloads, "meta": metas}
            )

    schema = (
        "doc_id bigint, media binary, "
        "meta struct<format:string,width:int,height:int,duration_ms:bigint>"
    )
    return media.mapInPandas(batches, schema=schema)


_AUDIO_SCHEMA = (
    "doc_id bigint, n_channels int, sample_rate int, n_frames int, "
    "pcm binary"
)


def decode_audio_batch(media: DataFrame) -> DataFrame:
    """Audio decode via mapInPandas.

    REAL for WAV/16-bit PCM (stdlib ``wave``, wavpcm.py); compressed
    codecs (MP3/AAC/...) need native decoders not present in this image
    and stay behind a clearly-marked ``NotImplementedError`` gate."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import wavpcm

        for pdf in it:
            out = {"doc_id": [], "n_channels": [], "sample_rate": [],
                   "n_frames": [], "pcm": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(payload)
                if data[:4] != b"RIFF":  # pragma: no cover - env-dependent
                    raise NotImplementedError(
                        "compressed audio decode requires codec libs not "
                        "present in this image; WAV/PCM is the real path"
                    )
                ch, rate, frames, samples = wavpcm.decode_wav(data)
                out["doc_id"].append(doc_id)
                out["n_channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_frames"].append(frames)
                out["pcm"].append(samples.astype("<i2").tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=_AUDIO_SCHEMA)


_SAMPLE_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, first_sample int, peak int, "
    "sample_checksum bigint"
)


def audio_sample_features(decoded: DataFrame) -> DataFrame:
    """Value-space features over decoded PCM (the audio twin of
    media_byte_features): totals the ORACLE can recompute arithmetically
    for the fixture — sample count, first sample, signed peak, additive
    unsigned checksum mod 2^16."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "first_sample": [],
                   "peak": [], "sample_checksum": []}
            for doc_id, pcm in zip(pdf["doc_id"], pdf["pcm"]):
                s = np.frombuffer(bytes(pcm), dtype="<i2").astype(np.int64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(s))
                out["first_sample"].append(int(s[0]) if len(s) else None)
                out["peak"].append(int(s.max()) if len(s) else None)
                out["sample_checksum"].append(
                    int((s + 32768).sum() % 65536)
                )
            yield pd.DataFrame(out)

    return decoded.mapInPandas(batches, schema=_SAMPLE_FEATURES_SCHEMA)


_FRAME_FEATURES_SCHEMA = (
    "doc_id bigint, frame_idx int, energy bigint, zero_crossings bigint"
)


def audio_frame_features(
    decoded: DataFrame, frame_len: int = 8, hop: int = 4
) -> DataFrame:
    """Windowed analysis frames over decoded PCM: the audio-ML front-end
    shape (energy + zero-crossing rate per sliding window) with
    integer-exact math so the fixture's SQL oracle recomputes every value.

    Channels are downmixed by SUMMING (not averaging) so the mono signal
    stays integral; energy is the sum of squared mono samples and
    zero_crossings counts strict sign flips between adjacent samples
    inside the window. Runs in the same Arrow batches as the decode —
    payloads never leave the executors, output is one narrow row per
    analysis window (the explode happens Python-side, before Arrow
    serialization, so only the small frame rows cross into the JVM).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "energy": [],
                   "zero_crossings": []}
            for doc_id, ch, fr, pcm in zip(
                pdf["doc_id"], pdf["n_channels"], pdf["n_frames"], pdf["pcm"]
            ):
                s = np.frombuffer(bytes(pcm), dtype="<i2").astype(np.int64)
                mono = s.reshape(int(fr), int(ch)).sum(axis=1)
                n_windows = (len(mono) - frame_len) // hop + 1
                for j in range(max(n_windows, 0)):
                    seg = mono[j * hop : j * hop + frame_len]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(j)
                    out["energy"].append(int((seg * seg).sum()))
                    out["zero_crossings"].append(
                        int(((seg[:-1] * seg[1:]) < 0).sum())
                    )
            yield pd.DataFrame(out)

    return decoded.mapInPandas(batches, schema=_FRAME_FEATURES_SCHEMA)


_CHAR_FEATURES_SCHEMA = "doc_id bigint, n_chars int, first_cp int, cp_checksum bigint"


def media_char_features(media: DataFrame) -> DataFrame:
    """Decode-then-featurize: UTF-8 bytes → str (the REAL decode step of
    the multimodal contract) → code-point features. Unlike the raw byte
    features, these have an exact SQL twin for any text (DuckDB's
    ascii()/length() are code-point-based), so the oracle keeps
    validating the path even on non-ASCII corpora."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = pdf["media"].map(lambda b: bytes(b).decode("utf-8"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars": texts.map(len).astype("int32"),
                    "first_cp": texts.map(
                        lambda t: ord(t[0]) if t else None
                    ).astype("Int32"),
                    "cp_checksum": texts.map(
                        lambda t: sum(map(ord, t)) % 65536
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=_CHAR_FEATURES_SCHEMA)


def attach_fake_pvs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PVS (PPM video stream) fixture: fps, frame count,
    dims and every pixel byte of every frame are closed-form in
    ``doc_id`` (video.fixture_video_params / fixture_frame_pixels), so a
    SQL oracle can recompute what a correct demux+decode must produce.
    Generated inside Arrow batches — no driver data."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import video

        for pdf in it:
            ids = pdf[id_col]
            payloads, metas = [], []
            for doc_id in ids:
                doc_id = int(doc_id)
                fps, n_frames = video.fixture_video_params(doc_id)
                w, h = video.fixture_dims(doc_id)
                payloads.append(video.make_fixture_pvs(doc_id))
                metas.append(
                    {
                        "format": "pvs",
                        "width": w,
                        "height": h,
                        "duration_ms": 1000 * n_frames // fps,
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids.astype("int64"),
                    "media": payloads,
                    "meta": metas,
                }
            )

    schema = (
        "doc_id bigint, media binary, "
        "meta struct<format:string,width:int,height:int,duration_ms:bigint>"
    )
    return docs.select(id_col).mapInPandas(batches, schema=schema)


_VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, fps int, n_frames int, frame_idx int, "
    "width int, height int, first_byte int, byte_checksum bigint"
)


def sample_video_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """REAL video path: demux the PVS container, decode each P6 frame by
    parsing (not fixed offsets), keep every Nth frame, and emit per-frame
    features — the raster is dropped inside the batch, so downstream
    state is |sampled frames| x features, never bytes. This is the
    frame-sampling shape a 100 TB video corpus runs before any ML stage.
    """

    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import video

        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "fps", "n_frames", "frame_idx",
                "width", "height", "first_byte", "byte_checksum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                fps, frames = video.decode_pvs(bytes(payload))
                for f in range(0, len(frames), every):
                    w, h, raster = frames[f]
                    buf = np.frombuffer(raster, dtype=np.uint8)
                    rows["doc_id"].append(int(doc_id))
                    rows["fps"].append(fps)
                    rows["n_frames"].append(len(frames))
                    rows["frame_idx"].append(f)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["first_byte"].append(int(buf[0]))
                    rows["byte_checksum"].append(
                        int(buf.astype(np.int64).sum() % 65536)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "fps": pd.Series(rows["fps"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "first_byte": pd.Series(rows["first_byte"], dtype="int32"),
                    "byte_checksum": pd.Series(
                        rows["byte_checksum"], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=_VIDEO_FRAME_SCHEMA)


_SCENE_CUT_SCHEMA = (
    "doc_id bigint, frame_idx int, n_px int, sad bigint, is_cut boolean"
)


def video_scene_cuts(media: DataFrame, thr_num: int = 5389,
                     thr_den: int = 256) -> DataFrame:
    """Scene-change detection by frame differencing — the classic shot-
    boundary primitive (a cut is a frame whose sum of absolute pixel
    differences vs its predecessor exceeds a per-pixel threshold).
    Demuxes the PVS container by parsing, computes SAD per adjacent
    frame pair inside the Arrow batch, and drops both rasters
    immediately: downstream state is |frame pairs| x 4 integers, never
    bytes. The cut decision is an INTEGER cross-multiplication
    (sad * thr_den > thr_num * n_px, i.e. mean |diff| > thr_num/thr_den)
    so the flag is exact on both engines — no float threshold drift.
    At 100 TB this runs as the sampling front of a video-curation
    pipeline: per-document work is independent (embarrassingly
    parallel), and only cut metadata flows on."""

    if thr_den <= 0:
        raise ValueError(f"thr_den must be positive, got {thr_den}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-safe import: bootstrap sys.path by value (see
        # _PKG_PARENT) instead of capturing the module by reference
        import sys
        if _PKG_PARENT not in sys.path:
            sys.path.insert(0, _PKG_PARENT)
        from etl_job_applify_spark.multimodal import video

        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "frame_idx", "n_px", "sad", "is_cut",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                _, frames = video.decode_pvs(bytes(payload))
                prev = None
                for f, (w, h, raster) in enumerate(frames):
                    buf = np.frombuffer(raster, dtype=np.uint8).astype(
                        np.int64
                    )
                    if prev is not None:
                        sad = int(np.abs(buf - prev).sum())
                        n_px = len(buf)
                        rows["doc_id"].append(int(doc_id))
                        rows["frame_idx"].append(f)
                        rows["n_px"].append(n_px)
                        rows["sad"].append(sad)
                        rows["is_cut"].append(
                            sad * thr_den > thr_num * n_px
                        )
                    prev = buf
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "n_px": pd.Series(rows["n_px"], dtype="int32"),
                    "sad": pd.Series(rows["sad"], dtype="int64"),
                    "is_cut": pd.Series(rows["is_cut"], dtype="bool"),
                }
            )

    return media.mapInPandas(batches, schema=_SCENE_CUT_SCHEMA)
