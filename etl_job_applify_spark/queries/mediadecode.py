"""Multimodal image decode/resize queries (q137-q138).

The decode path is REAL (multimodal/ppm.py: dependency-free P6 parser —
comment/whitespace grammar and all) and oracle-checked the strong way:
the PPM fixture's dims and pixel bytes are closed-form arithmetic in
``doc_id`` (attach_fake_ppm), so DuckDB recomputes what a correct decode
must produce — width, height, byte length, first byte, additive checksum
— WITHOUT ever seeing the encoder or parsing a single byte. If the
encoder and parser disagreed anywhere (header grammar, raster offset,
truncation), the checksums break.

Scale: generation, decode, resample and featurization all run as
Arrow-batched mapInPandas; payloads never leave executors, and per-doc
work is independent → embarrassingly parallel at any corpus size. A real
100 TB corpus swaps attach_fake_ppm for read_binary + parquet-packed
shards; every stage downstream is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import (
    attach_fake_ppm,
    attach_fake_wav,
    audio_frame_features,
    audio_sample_features,
    decode_audio_batch,
    decode_image_batch,
    media_byte_features,
    resize_image_batch,
)
from ._util import tbl


def _pixel_features(decoded: DataFrame) -> DataFrame:
    """(width,height,channels) from the decode + byte features over the
    raw raster — one equi-join on doc_id (both sides partition-pruned by
    AQE; at corpus scale this is a co-partitioned shuffle on the id)."""
    feats = media_byte_features(
        decoded.select("doc_id", F.col("pixels").alias("media"))
    )
    return (
        decoded.select("doc_id", "width", "height", "channels")
        .join(feats, "doc_id")
        .select(
            "doc_id",
            "width",
            "height",
            "channels",
            "byte_len",
            "first_byte",
            "byte_checksum",
        )
    )


# --- q137: REAL image decode, arithmetic oracle ---------------------------

def q137_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    decoded = decode_image_batch(attach_fake_ppm(docs))
    return _pixel_features(decoded)


_Q137_SQL = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       3 AS channels,
       CAST(3 * w * h AS BIGINT) AS byte_len,
       CAST((doc_id * 7) % 256 AS INT) AS first_byte,
       CAST(list_sum(list_transform(range(0, 3 * w * h),
                     i -> (doc_id * 7 + i) % 256)) % 65536
            AS BIGINT) AS byte_checksum
FROM dims
"""


# --- q138: decode → nearest-neighbor resize → re-encode → decode ---------
# The oracle replays the floor mapping sy=(y*h)//th, sx=(x*w)//tw per
# output byte, so the whole decode→resample→encode→decode round trip is
# pinned, not just the happy path.

def q138_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    resized = resize_image_batch(attach_fake_ppm(docs), width=4, height=3)
    return _pixel_features(decode_image_batch(resized))


_Q138_SQL = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
)
SELECT doc_id,
       4 AS width,
       3 AS height,
       3 AS channels,
       CAST(36 AS BIGINT) AS byte_len,
       CAST((doc_id * 7) % 256 AS INT) AS first_byte,
       CAST(list_sum(list_transform(range(0, 36),
            i -> (doc_id * 7
                  + 3 * (((i // 12) * h // 3) * w + ((i % 12) // 3) * w // 4)
                  + i % 3) % 256)) % 65536
            AS BIGINT) AS byte_checksum
FROM dims
"""


# --- q143: REAL audio decode (WAV/16-bit PCM), arithmetic oracle ----------
# Second modality, same contract as q137: the RIFF/WAVE payload is
# encoded and decoded by independent stdlib code paths inside Arrow
# batches, and the oracle recomputes channel/frame counts, duration,
# first sample, signed peak and the additive checksum purely from doc_id
# arithmetic — any disagreement on header layout, interleaving,
# signedness or endianness breaks the hashes.

def q143_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    decoded = decode_audio_batch(attach_fake_wav(docs))
    feats = audio_sample_features(decoded)
    return (
        decoded.select("doc_id", "n_channels", "sample_rate", "n_frames")
        .join(feats, "doc_id")
        .select(
            "doc_id",
            "n_channels",
            "sample_rate",
            (
                F.col("n_frames") * 1000.0 / F.col("sample_rate")
            ).alias("duration_ms"),
            "n_samples",
            "first_sample",
            "peak",
            "sample_checksum",
        )
    )


_Q143_SQL = """
WITH params AS (
  SELECT doc_id, 1 + doc_id % 2 AS ch, 20 + doc_id % 11 AS fr
  FROM documents
)
SELECT doc_id,
       CAST(ch AS INT) AS n_channels,
       8000 AS sample_rate,
       fr * 1000.0 / 8000 AS duration_ms,
       CAST(fr * ch AS BIGINT) AS n_samples,
       CAST((doc_id * 13) % 65536 - 32768 AS INT) AS first_sample,
       CAST(list_max(list_transform(range(0, fr * ch),
                     i -> (doc_id * 13 + i * 17) % 65536 - 32768))
            AS INT) AS peak,
       CAST(list_sum(list_transform(range(0, fr * ch),
                     i -> (doc_id * 13 + i * 17) % 65536)) % 65536
            AS BIGINT) AS sample_checksum
FROM params
"""


# --- q148: audio analysis frames (windowed energy + zero crossings) -------
# The audio-ML front-end over q143's decode: sliding 8-sample windows with
# hop 4 over the channel-summed mono signal. All-integer math, so the
# oracle recomputes every window's energy and sign-flip count purely from
# doc_id arithmetic — pinning downmix interleave order, window placement
# and hop against the independent stdlib decode.

_Q148_W = 8
_Q148_H = 4


def q148_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    decoded = decode_audio_batch(attach_fake_wav(docs))
    return audio_frame_features(decoded, frame_len=_Q148_W, hop=_Q148_H)


_Q148_SQL = f"""
WITH params AS (
  SELECT doc_id, 1 + doc_id % 2 AS ch, 20 + doc_id % 11 AS fr
  FROM documents
),
mono AS (
  SELECT doc_id, fr,
         list_transform(range(0, fr), i ->
           list_sum(list_transform(range(0, ch),
             c -> (doc_id * 13 + (i * ch + c) * 17) % 65536 - 32768))) AS m
  FROM params
),
frames AS (
  SELECT doc_id, m,
         unnest(range(0, (fr - {_Q148_W}) // {_Q148_H} + 1)) AS j
  FROM mono
)
SELECT doc_id,
       CAST(j AS INT) AS frame_idx,
       CAST(list_sum(list_transform(range(0, {_Q148_W}),
             k -> m[j * {_Q148_H} + k + 1] * m[j * {_Q148_H} + k + 1]))
            AS BIGINT) AS energy,
       CAST(list_sum(list_transform(range(0, {_Q148_W} - 1),
             k -> CASE WHEN m[j * {_Q148_H} + k + 1]
                            * m[j * {_Q148_H} + k + 2] < 0
                       THEN 1 ELSE 0 END))
            AS BIGINT) AS zero_crossings
FROM frames
"""


# --- q169: REAL video demux + frame sampling (PVS), arithmetic oracle ----
# Third modality, same contract as q137/q143: the PVS container (a
# formalized Netpbm frame stream — what ffmpeg's image2pipe actually
# moves) is demuxed by PARSING each embedded P6 frame, every 2nd frame
# is kept, and per-frame features are emitted while the raster is
# dropped inside the Arrow batch. The oracle recomputes fps, frame
# count, sampled indices, dims, first byte and additive checksum of
# every sampled frame purely from doc_id arithmetic — a desync anywhere
# in the container math (header length, raster offset, frame order)
# breaks every downstream frame's checksum.

def q169_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import attach_fake_pvs, sample_video_frames

    docs = tbl(spark, sf_dir, "documents")
    return sample_video_frames(attach_fake_pvs(docs), every=2)


_Q169_SQL = """
WITH params AS (
  SELECT doc_id,
         2 + doc_id % 3 AS fps,
         3 + doc_id % 4 AS nf,
         4 + doc_id % 5 AS w,
         3 + doc_id % 4 AS h
  FROM documents
),
frames AS (
  SELECT doc_id, fps, nf, w, h, UNNEST(range(0, nf, 2)) AS f
  FROM params
)
SELECT doc_id,
       CAST(fps AS INT) AS fps,
       CAST(nf AS INT) AS n_frames,
       CAST(f AS INT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST((doc_id * 7 + f * 11) % 256 AS INT) AS first_byte,
       CAST(list_sum(list_transform(range(0, 3 * w * h),
                     i -> (doc_id * 7 + f * 11 + i) % 256)) % 65536
            AS BIGINT) AS byte_checksum
FROM frames
"""


# --- q192: perceptual image hashing + brightness-shift near-dups ----------
# Image-modality near-duplicate detection: every document's image gets a
# +16 brightness-shifted copy (different BYTES — a checksum dedup
# misses it), and both sides are fingerprinted with the integer-exact
# average hash (3×4 block-mean bits, multimodal/media.py
# ahash_image_batch). The hash is invariant under uniform shifts except
# where saturation at 255 reshapes a cell's mean relative to the global
# mean, so the per-lang match rate is high but not total — and the
# oracle recomputes EVERY pixel, both hashes, and the same match counts
# arithmetically from doc_id (the q137/q138 contract: Spark hashes real
# decoded payload bytes, SQL replays closed-form pixels; agreement pins
# decode + hash + variant generation end-to-end).
# Plan: two Arrow decode/hash passes (payloads never leave executors),
# one broadcast-sized join on doc_id, one group-by lang.

def q192_image_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import ahash_image_batch, brighten_image_batch

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    originals = attach_fake_ppm(docs)
    variants = brighten_image_batch(originals, 16)
    ho = ahash_image_batch(originals).withColumnRenamed("ahash", "ahash_o")
    hv = ahash_image_batch(variants).withColumnRenamed("ahash", "ahash_v")
    return (
        ho.join(hv, "doc_id")
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                (F.col("ahash_o") == F.col("ahash_v")).cast("int")
            ).cast("bigint").alias("n_hash_match"),
            F.countDistinct("ahash_o").cast("bigint").alias(
                "n_distinct_hashes"
            ),
        )
    )


_Q192_SQL = """
WITH dims AS (
  SELECT doc_id, lang, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents
),
px AS (
  SELECT doc_id, lang, w, h, i,
         (doc_id * 7 + i) % 256 AS b_o,
         LEAST(255, (doc_id * 7 + i) % 256 + 16) AS b_v
  FROM dims, UNNEST(range(0, 3 * w * h)) AS t(i)
),
cells AS (
  SELECT doc_id, lang,
         (((i // 3) // w) * 3) // h AS gy,
         (((i // 3) % w) * 4) // w AS gx,
         SUM(b_o) AS s_o, SUM(b_v) AS s_v, COUNT(*) AS n
  FROM px
  GROUP BY doc_id, lang, gy, gx, w, h
),
totals AS (
  SELECT doc_id, SUM(b_o) AS ts_o, SUM(b_v) AS ts_v, COUNT(*) AS tn
  FROM px GROUP BY doc_id
),
hashes AS (
  SELECT c.doc_id, c.lang,
         SUM(CASE WHEN s_o * tn > ts_o * n
                  THEN 1 << (gy * 4 + gx) ELSE 0 END) AS ahash_o,
         SUM(CASE WHEN s_v * tn > ts_v * n
                  THEN 1 << (gy * 4 + gx) ELSE 0 END) AS ahash_v
  FROM cells c JOIN totals USING (doc_id)
  GROUP BY c.doc_id, c.lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ahash_o = ahash_v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hash_match,
       CAST(COUNT(DISTINCT ahash_o) AS BIGINT) AS n_distinct_hashes
FROM hashes
GROUP BY lang
"""


# --- q204: video scene-change detection (frame differencing) --------------
# The shot-boundary step of a video-curation pipeline: demux the PVS
# container, SAD each adjacent frame pair inside the Arrow batch, flag
# cuts where mean |pixel diff| exceeds 5389/256 (~21.05 — right at the
# fixture's expected diff, so the flag genuinely splits: the exact SAD
# depends on how many wrap-around pixels each (doc, frame) offset hits).
# The cut decision is an integer cross-multiplication — no float
# threshold drift — and the oracle replays every pixel of both frames
# of every pair from doc_id arithmetic, so a demux desync or an
# off-by-one in the pairing breaks the SADs. Plan: one Arrow
# decode/diff pass, rasters never leave the batch; only |pairs| x 4
# integers flow on (the q169 sampling discipline).

def q204_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import attach_fake_pvs, video_scene_cuts

    docs = tbl(spark, sf_dir, "documents")
    return video_scene_cuts(attach_fake_pvs(docs))


_Q204_SQL = """
WITH params AS (
  SELECT doc_id,
         3 + doc_id % 4 AS nf,
         4 + doc_id % 5 AS w,
         3 + doc_id % 4 AS h
  FROM documents
),
pairs AS (
  SELECT doc_id, w, h, UNNEST(range(1, nf)) AS f
  FROM params
),
sads AS (
  SELECT doc_id,
         CAST(f AS INT) AS frame_idx,
         CAST(3 * w * h AS INT) AS n_px,
         CAST(list_sum(list_transform(range(0, 3 * w * h),
               i -> abs((doc_id * 7 + f * 11 + i) % 256
                        - (doc_id * 7 + (f - 1) * 11 + i) % 256)))
              AS BIGINT) AS sad
  FROM pairs
)
SELECT doc_id, frame_idx, n_px, sad,
       sad * 256 > 5389 * n_px AS is_cut
FROM sads
"""


# --- q221: audio energy-order fingerprint vs gained near-duplicates -------
# Audio-modality near-dup detection, the q192 contract transplanted to
# the WAV path: every document's audio gets a ×2 gained, int16-saturated
# copy (DIFFERENT BYTES everywhere — n_byte_match pins 0 via md5 on
# both engines' arithmetic), and both sides are fingerprinted with the
# energy-ORDER hash: bit j of the fingerprint is 1 iff window j+1's
# energy exceeds window j's (windows from q148's integer frame
# features). Gain scales every window energy by factor², preserving all
# comparisons exactly — so the fingerprint is provably gain-invariant
# even under this fixture's heavy saturation, and the oracle recomputes
# every sample, both energy sequences, both fingerprints and the match
# counts in closed form from doc_id (decode + gain + downmix + window +
# fingerprint pinned end to end).
# Plan: two Arrow decode/feature passes (payloads stay on executors),
# JVM-side fingerprint aggregation, one groupBy lang.

def _audio_fp(feats: DataFrame, alias: str) -> DataFrame:
    """Energy-order fingerprint per doc from (doc_id, frame_idx, energy)
    rows: packed sign bits of consecutive energy differences."""
    e1 = feats.select(
        "doc_id", F.col("frame_idx").alias("j"), F.col("energy").alias("e1")
    )
    e2 = feats.select(
        "doc_id",
        (F.col("frame_idx") - 1).alias("j"),
        F.col("energy").alias("e2"),
    )
    return (
        e1.join(e2, ["doc_id", "j"])
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN e2 > e1 THEN"
                " shiftleft(CAST(1 AS BIGINT), j)"
                " ELSE CAST(0 AS BIGINT) END) AS BIGINT)"
            ).alias(alias)
        )
    )


def q221_audio_gain_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import gain_audio_batch

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    orig = attach_fake_wav(docs)
    var = gain_audio_batch(orig, 2)
    fpo = _audio_fp(audio_frame_features(decode_audio_batch(orig)), "fp_o")
    fpv = _audio_fp(audio_frame_features(decode_audio_batch(var)), "fp_v")
    bo = orig.select("doc_id", F.md5("media").alias("h_o"))
    bv = var.select("doc_id", F.md5("media").alias("h_v"))
    return (
        fpo.join(fpv, "doc_id")
        .join(bo, "doc_id")
        .join(bv, "doc_id")
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("fp_o") == F.col("fp_v")).cast("int"))
            .cast("bigint")
            .alias("n_fp_match"),
            F.sum((F.col("h_o") == F.col("h_v")).cast("int"))
            .cast("bigint")
            .alias("n_byte_match"),
            F.countDistinct("fp_o").cast("bigint").alias("n_distinct_fp"),
        )
    )


# the oracle's byte-identity criterion: the gained payload equals the
# original iff EVERY sample is a fixed point of clip(2s) — s = 0 or
# s = -32768 (2·(-32768) saturates back to -32768); WAV headers are
# parameter-identical by construction, so sample equality IS byte
# equality (matching Spark's md5 compare of the real encoded payloads).
_Q221_SQL = """
WITH params AS (
  SELECT doc_id, lang, 1 + doc_id % 2 AS ch, 20 + doc_id % 11 AS fr
  FROM documents
),
mono AS (
  SELECT doc_id, lang, fr,
    list_transform(range(0, fr), t ->
      list_sum(list_transform(range(0, ch), c ->
        (doc_id * 13 + (t * ch + c) * 17) % 65536 - 32768))) AS m,
    list_transform(range(0, fr), t ->
      list_sum(list_transform(range(0, ch), c ->
        LEAST(32767, GREATEST(-32768,
          2 * ((doc_id * 13 + (t * ch + c) * 17) % 65536 - 32768)))))) AS mg,
    list_sum(list_transform(range(0, fr * ch), i ->
      CASE WHEN LEAST(32767, GREATEST(-32768,
                 2 * ((doc_id * 13 + i * 17) % 65536 - 32768)))
                = (doc_id * 13 + i * 17) % 65536 - 32768
           THEN 0 ELSE 1 END)) AS n_changed
  FROM params
),
en AS (
  SELECT doc_id, lang, n_changed, (fr - 8) // 4 + 1 AS nw,
    list_transform(range(0, (fr - 8) // 4 + 1), j ->
      list_sum(list_transform(range(0, 8), t ->
        m[j * 4 + t + 1] * m[j * 4 + t + 1]))) AS e,
    list_transform(range(0, (fr - 8) // 4 + 1), j ->
      list_sum(list_transform(range(0, 8), t ->
        mg[j * 4 + t + 1] * mg[j * 4 + t + 1]))) AS eg
  FROM mono
),
fp AS (
  SELECT doc_id, lang,
    list_sum(list_transform(range(0, nw - 1), j ->
      CASE WHEN e[j + 2] > e[j + 1] THEN 1 << j ELSE 0 END)) AS f_o,
    list_sum(list_transform(range(0, nw - 1), j ->
      CASE WHEN eg[j + 2] > eg[j + 1] THEN 1 << j ELSE 0 END)) AS f_v,
    CASE WHEN n_changed = 0 THEN 1 ELSE 0 END AS byte_same
  FROM en
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f_o = f_v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fp_match,
       CAST(SUM(byte_same) AS BIGINT) AS n_byte_match,
       CAST(COUNT(DISTINCT f_o) AS BIGINT) AS n_distinct_fp
FROM fp
GROUP BY lang
"""


QUERIES = {
    "q137_ppm_decode": q137_ppm_decode,
    "q138_ppm_resize": q138_ppm_resize,
    "q143_wav_decode": q143_wav_decode,
    "q148_audio_frames": q148_audio_frames,
    "q169_video_frames": q169_video_frames,
    "q192_image_ahash_near_dup": q192_image_ahash_near_dup,
    "q204_scene_cuts": q204_scene_cuts,
    "q221_audio_gain_near_dup": q221_audio_gain_near_dup,
}

ORACLE = {
    "q137_ppm_decode": _Q137_SQL,
    "q138_ppm_resize": _Q138_SQL,
    "q143_wav_decode": _Q143_SQL,
    "q148_audio_frames": _Q148_SQL,
    "q169_video_frames": _Q169_SQL,
    "q192_image_ahash_near_dup": _Q192_SQL,
    "q204_scene_cuts": _Q204_SQL,
    "q221_audio_gain_near_dup": _Q221_SQL,
}
