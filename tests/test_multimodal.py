"""Multimodal plumbing: binary payloads + metadata structs through
Arrow-batched mapInPandas; codec stubs are gated, byte features are real."""

from __future__ import annotations

import numpy as np
import pytest

from etl_job_applify_spark.multimodal import (
    attach_fake_media,
    decode_image_batch,
    extract_frames_batch,
    media_byte_features,
)
from etl_job_applify_spark.queries._util import tbl

from conftest import SF_SMOKE


def test_media_schema(spark):
    media = attach_fake_media(tbl(spark, SF_SMOKE, "documents"))
    types = dict(media.dtypes)
    assert types["media"] == "binary"
    assert types["meta"].startswith("struct<format:string,width:int")


def test_byte_features_match_python(spark):
    docs = tbl(spark, SF_SMOKE, "documents").limit(20)
    media = attach_fake_media(docs)
    feats = {r["doc_id"]: r for r in media_byte_features(media).collect()}
    for row in docs.collect():
        raw = row["text"].encode("utf-8")
        f = feats[row["doc_id"]]
        assert f["byte_len"] == len(raw)
        assert f["first_byte"] == raw[0]
        assert f["byte_checksum"] == sum(raw) % 65536


def test_decode_stub_is_gated(spark):
    media = attach_fake_media(tbl(spark, SF_SMOKE, "documents").limit(2))
    with pytest.raises(Exception) as ei:
        decode_image_batch(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frames_stub_is_gated(spark):
    media = attach_fake_media(tbl(spark, SF_SMOKE, "documents").limit(2))
    with pytest.raises(Exception):
        extract_frames_batch(media).collect()


def test_pandas_scalar_udf_matches_expression(spark):
    """The Arrow-vectorized scalar UDF path (pandas_udf) must agree with
    the pure-expression quality score — kept as the documented escape
    hatch when logic outgrows SQL expressions."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from etl_job_applify_spark.functions.text import quality_score_expr

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark can't resolve 'pd.Series' from a local import
    @F.pandas_udf(DoubleType())
    def quality_py(text):
        toks = text.str.split(" ")
        nt = toks.map(len).astype("float64")
        distinct_ratio = toks.map(lambda t: len(set(t))) / nt
        return nt.div(100.0).clip(upper=1.0) * distinct_ratio

    docs = tbl(spark, SF_SMOKE, "documents").limit(100)
    both = docs.select(
        quality_score_expr("text").alias("expr_score"),
        quality_py("text").alias("udf_score"),
    ).collect()
    for r in both:
        assert abs(r["expr_score"] - r["udf_score"]) < 1e-12


def test_resize_stub_is_gated(spark):
    from etl_job_applify_spark.multimodal.media import resize_image_batch

    media = attach_fake_media(tbl(spark, SF_SMOKE, "documents").limit(2))
    with pytest.raises(Exception):
        resize_image_batch(media, 224, 224).collect()


def test_byte_features_handle_empty_payload(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "x"), (2, "")], "doc_id long, text string")
    media = df.select("doc_id", F.encode("text", "utf-8").alias("media"))
    feats = {r["doc_id"]: r for r in media_byte_features(media).collect()}
    assert feats[2]["byte_len"] == 0
    assert feats[2]["first_byte"] is None
    assert feats[2]["byte_checksum"] == 0


def test_char_features_survive_non_ascii(spark):
    """The decode-based features must stay oracle-equivalent beyond ASCII
    (code points, not bytes)."""
    from etl_job_applify_spark.multimodal import media_char_features
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "héllo"), (2, "的是"), (3, "")], "doc_id long, text string"
    )
    media = df.select("doc_id", F.encode("text", "utf-8").alias("media"))
    feats = {r["doc_id"]: r for r in media_char_features(media).collect()}
    assert feats[1]["n_chars"] == 5 and feats[1]["first_cp"] == ord("h")
    assert feats[2]["n_chars"] == 2 and feats[2]["first_cp"] == ord("的")
    assert feats[3]["first_cp"] is None and feats[3]["cp_checksum"] == 0


def test_binary_reader_feeds_media_features(spark, tmp_path):
    """Composability: files ingested via read_binary flow through the
    Arrow-batched feature extractor unchanged."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.multimodal.media import media_byte_features
    from etl_job_applify_spark.sources import read_binary

    p = tmp_path / "imgs"
    p.mkdir()
    (p / "a.jpg").write_bytes(bytes([1, 2, 3, 4]))
    (p / "b.jpg").write_bytes(bytes([9, 9]))
    media = read_binary(spark, str(p), glob="*.jpg").select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("media"),
    )
    feats = {r["byte_len"] for r in media_byte_features(media).collect()}
    assert feats == {4, 2}


# --- PPM codec: the REAL decode path -------------------------------------


def test_ppm_roundtrip_pure():
    import numpy as np

    from etl_job_applify_spark.multimodal import ppm

    px = ppm.fixture_pixels(11, 5, 4)
    data = ppm.encode_ppm(5, 4, px)
    w, h, c, raster = ppm.decode_ppm(data)
    assert (w, h, c) == (5, 4, 3)
    assert np.array_equal(np.frombuffer(raster, dtype=np.uint8), px)


def test_ppm_decoder_handles_header_grammar():
    """Comments and arbitrary whitespace between tokens are legal P6."""
    from etl_job_applify_spark.multimodal import ppm

    raster = bytes(range(2 * 1 * 3))
    data = b"P6 # trailing comment\n#line comment\n 2\t1 #again\n  255\n" + raster
    w, h, c, out = ppm.decode_ppm(data)
    assert (w, h, c) == (2, 1, 3) and out == raster


def test_ppm_decoder_rejects_garbage():
    import pytest as _pytest

    from etl_job_applify_spark.multimodal import ppm

    with _pytest.raises(ValueError):
        ppm.decode_ppm(b"P5\n1 1\n255\nx")  # grayscale magic
    with _pytest.raises(ValueError):
        ppm.decode_ppm(b"P6\n4 4\n255\nshort")  # truncated raster


def test_ppm_resize_nearest_exact():
    """2x2 -> 4x4 nearest must replicate each source pixel 2x2."""
    import numpy as np

    from etl_job_applify_spark.multimodal import ppm

    src = np.arange(2 * 2 * 3, dtype=np.uint8).tobytes()
    out = np.frombuffer(ppm.resize_nearest(src, 2, 2, 4, 4), dtype=np.uint8)
    img = out.reshape(4, 4, 3)
    srcimg = np.frombuffer(src, dtype=np.uint8).reshape(2, 2, 3)
    for y in range(4):
        for x in range(4):
            assert np.array_equal(img[y, x], srcimg[y * 2 // 4, x * 2 // 4])


def test_decode_image_batch_real_for_ppm(spark):
    from etl_job_applify_spark.multimodal import (
        attach_fake_ppm,
        decode_image_batch,
    )
    from etl_job_applify_spark.multimodal import ppm

    docs = tbl(spark, SF_SMOKE, "documents").limit(8)
    rows = {
        r["doc_id"]: r
        for r in decode_image_batch(attach_fake_ppm(docs)).collect()
    }
    assert rows
    for doc_id, r in rows.items():
        w, h = ppm.fixture_dims(doc_id)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        expect = ppm.fixture_pixels(doc_id, w, h).tobytes()
        assert bytes(r["pixels"]) == expect


def test_resize_image_batch_real_for_ppm(spark):
    from etl_job_applify_spark.multimodal import (
        attach_fake_ppm,
        decode_image_batch,
        resize_image_batch,
    )

    docs = tbl(spark, SF_SMOKE, "documents").limit(8)
    resized = resize_image_batch(attach_fake_ppm(docs), width=4, height=3)
    out = decode_image_batch(resized).collect()
    assert out and all(
        (r["width"], r["height"], len(bytes(r["pixels"]))) == (4, 3, 36)
        for r in out
    )
    metas = resized.select("meta.width", "meta.height").distinct().collect()
    assert [(m[0], m[1]) for m in metas] == [(4, 3)]


# --- WAV/PCM codec: the second REAL decode path --------------------------


def test_wav_roundtrip_pure():
    import numpy as np

    from etl_job_applify_spark.multimodal import wavpcm

    ch, fr = wavpcm.fixture_params(11)
    samples = wavpcm.fixture_samples(11, fr * ch)
    data = wavpcm.encode_wav(ch, samples)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    ch2, rate, fr2, out = wavpcm.decode_wav(data)
    assert (ch2, rate, fr2) == (ch, wavpcm.SAMPLE_RATE, fr)
    assert np.array_equal(out, samples)


def test_wav_decoder_rejects_unsupported_width():
    import io
    import wave

    import pytest as _pytest

    from etl_job_applify_spark.multimodal import wavpcm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit PCM: not the supported profile
        w.setframerate(8000)
        w.writeframes(bytes(10))
    with _pytest.raises(ValueError, match="16-bit"):
        wavpcm.decode_wav(buf.getvalue())


def test_wav_decode_pipeline_matches_fixture(spark):
    """Spark-side plumbing end-to-end: attach → decode → features, with
    stereo interleaving preserved (odd ids are 2-channel)."""
    from etl_job_applify_spark.multimodal import (
        attach_fake_wav,
        audio_sample_features,
        decode_audio_batch,
        wavpcm,
    )

    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    decoded = decode_audio_batch(attach_fake_wav(docs))
    rows = {
        r["doc_id"]: r
        for r in decoded.join(
            audio_sample_features(decoded), "doc_id"
        ).collect()
    }
    assert len(rows) == 8
    for doc_id, r in rows.items():
        ch, fr = wavpcm.fixture_params(doc_id)
        samples = wavpcm.fixture_samples(doc_id, fr * ch)
        assert r["n_channels"] == ch and r["n_frames"] == fr
        assert r["n_samples"] == fr * ch
        assert r["first_sample"] == int(samples[0])
        assert r["peak"] == int(samples.max())
        assert r["sample_checksum"] == int(
            (samples.astype("int64") + 32768).sum() % 65536
        )


def test_audio_frame_features_hand_computed(spark):
    """Frames over a hand-built stereo WAV: downmix is the channel SUM,
    windows are [j*hop, j*hop+frame_len), energy and sign flips match a
    by-hand trace."""
    import numpy as np

    from etl_job_applify_spark.multimodal import (
        audio_frame_features,
        decode_audio_batch,
    )
    from etl_job_applify_spark.multimodal.wavpcm import encode_wav

    # stereo, 6 frames; mono sums: [3, -3, 3, -3, 3, -3]
    interleaved = np.array(
        [1, 2, -1, -2, 1, 2, -1, -2, 1, 2, -1, -2], dtype=np.int16
    )
    payload = encode_wav(2, interleaved)
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, media binary"
    )
    out = audio_frame_features(
        decode_audio_batch(media), frame_len=4, hop=2
    ).collect()
    # windows: idx 0 → mono[0:4], idx 1 → mono[2:6]; energy 4*9=36 each,
    # 3 adjacent sign flips each
    assert [(r["frame_idx"], r["energy"], r["zero_crossings"]) for r in out] \
        == [(0, 36, 3), (1, 36, 3)]


def test_audio_frame_features_short_signal_yields_no_frames(spark):
    import numpy as np

    from etl_job_applify_spark.multimodal import (
        audio_frame_features,
        decode_audio_batch,
    )
    from etl_job_applify_spark.multimodal.wavpcm import encode_wav

    payload = encode_wav(1, np.array([5, -5, 5], dtype=np.int16))
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, media binary"
    )
    assert audio_frame_features(
        decode_audio_batch(media), frame_len=8, hop=4
    ).count() == 0


# --- PVS video container --------------------------------------------------


def test_pvs_roundtrip_pure():
    from etl_job_applify_spark.multimodal.video import (
        decode_pvs,
        encode_ppm,
        encode_pvs,
    )

    frames = [
        encode_ppm(2, 2, bytes(range(12))),
        encode_ppm(2, 2, bytes(range(100, 112))),
    ]
    data = encode_pvs(3, frames)
    fps, out = decode_pvs(data)
    assert fps == 3
    assert [(w, h) for w, h, _ in out] == [(2, 2), (2, 2)]
    assert out[0][2] == bytes(range(12))
    assert out[1][2] == bytes(range(100, 112))


def test_pvs_rejects_bad_streams():
    from etl_job_applify_spark.multimodal.video import (
        decode_pvs,
        encode_ppm,
        encode_pvs,
    )

    with pytest.raises(ValueError, match="not a PVS"):
        decode_pvs(b"P6\n1 1\n255\nabc")
    ok = encode_pvs(2, [encode_ppm(2, 2, bytes(12))])
    with pytest.raises(ValueError, match="truncated"):
        decode_pvs(ok[:-3])
    with pytest.raises(ValueError, match="trailing"):
        decode_pvs(ok + b"xx")


def test_pvs_fixture_matches_closed_form():
    from etl_job_applify_spark.multimodal.video import (
        decode_pvs,
        fixture_dims,
        fixture_video_params,
        make_fixture_pvs,
    )

    for doc_id in (0, 1, 7, 42):
        fps, frames = decode_pvs(make_fixture_pvs(doc_id))
        exp_fps, exp_n = fixture_video_params(doc_id)
        w, h = fixture_dims(doc_id)
        assert (fps, len(frames)) == (exp_fps, exp_n)
        for f, (fw, fh, raster) in enumerate(frames):
            assert (fw, fh) == (w, h)
            assert raster[0] == (doc_id * 7 + f * 11) % 256
            assert raster[-1] == (doc_id * 7 + f * 11 + 3 * w * h - 1) % 256


def test_sample_video_frames_every_n(spark):
    from etl_job_applify_spark.multimodal import (
        attach_fake_pvs,
        sample_video_frames,
    )
    from etl_job_applify_spark.multimodal.video import fixture_video_params

    docs = tbl(spark, SF_SMOKE, "documents").limit(20)
    out = sample_video_frames(attach_fake_pvs(docs), every=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        _, n = fixture_video_params(doc_id)
        assert sorted(idxs) == list(range(0, n, 3))


def test_ahash_brightness_invariance_and_saturation(spark):
    """The average hash must be EXACTLY invariant under a uniform
    brightness shift that never saturates (both sides of every
    cell-vs-global comparison move together), and must change bytes
    either way — the property that makes it a near-duplicate key where
    a checksum is an exact-duplicate key."""
    import numpy as np

    from etl_job_applify_spark.multimodal import (
        ahash_image_batch,
        brighten_image_batch,
    )
    from etl_job_applify_spark.multimodal.ppm import encode_ppm

    # low-range pixels (all <= 100): +16 cannot saturate
    w, h = 8, 6
    rows = []
    for doc_id in range(5):
        px = ((doc_id * 13 + np.arange(3 * w * h)) % 101).astype(np.uint8)
        rows.append((doc_id, bytearray(encode_ppm(w, h, px)),
                     {"format": "ppm", "width": w, "height": h,
                      "duration_ms": None}))
    from etl_job_applify_spark.multimodal import MEDIA_META_SCHEMA
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ])
    media = spark.createDataFrame(rows, schema)
    shifted = brighten_image_batch(media, 16)
    h0 = {r["doc_id"]: r["ahash"] for r in ahash_image_batch(media).collect()}
    h1 = {r["doc_id"]: r["ahash"] for r in ahash_image_batch(shifted).collect()}
    assert h0 == h1  # exact invariance without saturation
    # but the payload bytes did change
    b0 = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    b1 = {r["doc_id"]: bytes(r["media"]) for r in shifted.collect()}
    assert all(b0[d] != b1[d] for d in b0)
    # saturating shift breaks invariance for a high-range image
    px = (155 + (np.arange(3 * w * h) % 101)).astype(np.uint8)
    hot = spark.createDataFrame(
        [(99, bytearray(encode_ppm(w, h, px)),
          {"format": "ppm", "width": w, "height": h, "duration_ms": None})],
        schema,
    )
    hhot = ahash_image_batch(hot).collect()[0]["ahash"]
    hsat = ahash_image_batch(brighten_image_batch(hot, 100)).collect()[0]["ahash"]
    assert hhot != hsat  # clamp at 255 flattens cells differently
    # negative delta saturates at 0 — never wraps through uint8 (a dark
    # pixel must not become nearly white)
    from etl_job_applify_spark.multimodal import decode_image_batch

    dark = brighten_image_batch(media, -200)
    for r in decode_image_batch(dark).collect():
        arr = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8)
        assert arr.max() <= 55  # original <= 255; all shifted down, none wrapped


def test_ahash_rejects_grids_past_int64_capacity(spark):
    """bits pack into one signed int64 — an 8x8 grid would shift into
    the sign bit and beyond (undefined), so the call must fail loudly
    instead of returning silently-garbage hashes."""
    import pytest

    from etl_job_applify_spark.multimodal.media import (
        ahash_image_batch,
        attach_fake_ppm,
    )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    media = attach_fake_ppm(docs)
    with pytest.raises(ValueError, match="<= 63"):
        ahash_image_batch(media, grid_w=8, grid_h=8)
    # 63 bits (9x7) is the documented maximum and still works
    assert ahash_image_batch(media, grid_w=9, grid_h=7).count() == 1


def test_video_scene_cuts_matches_numpy_reference(spark):
    """SAD per adjacent frame pair must equal an independent recompute
    from the fixture arithmetic, and the cut flag must follow the exact
    integer cross-multiplication rule."""
    from etl_job_applify_spark.multimodal import attach_fake_pvs, video_scene_cuts
    from etl_job_applify_spark.multimodal.video import (
        fixture_frame_pixels,
        fixture_video_params,
    )
    from etl_job_applify_spark.multimodal.ppm import fixture_dims

    ids = [3, 7, 12, 25]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {
        (r["doc_id"], r["frame_idx"]): r
        for r in video_scene_cuts(attach_fake_pvs(docs)).collect()
    }
    n_pairs = 0
    for d in ids:
        _, nf = fixture_video_params(d)
        w, h = fixture_dims(d)
        for f in range(1, nf):
            cur = fixture_frame_pixels(d, f, w, h).astype(np.int64)
            prev = fixture_frame_pixels(d, f - 1, w, h).astype(np.int64)
            sad = int(np.abs(cur - prev).sum())
            r = out[(d, f)]
            assert r["sad"] == sad
            assert r["n_px"] == 3 * w * h
            assert r["is_cut"] == (sad * 256 > 5389 * 3 * w * h)
            n_pairs += 1
    assert len(out) == n_pairs


def test_video_scene_cuts_rejects_bad_threshold(spark):
    import pytest

    from etl_job_applify_spark.multimodal import attach_fake_pvs, video_scene_cuts

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="thr_den"):
        video_scene_cuts(attach_fake_pvs(docs), thr_den=0)


def test_codec_closures_import_from_foreign_cwd():
    """Round-7 regression: multimodal mapInPandas closures must work
    when the DRIVER process is launched outside the repo (spark-submit
    from another directory, a notebook, the driver harness) — worker
    processes don't inherit the driver's sys.path, so each closure
    bootstraps it from a by-value string. A captured module object
    would pickle by reference and die with ModuleNotFoundError on the
    worker; this drives one decode query end-to-end from /tmp in a
    fresh interpreter to pin the fix."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.ui.enabled', 'false')\n"
        "         .config('spark.sql.session.timeZone', 'UTC')"
        ".getOrCreate())\n"
        "from etl_job_applify_spark.queries.mediadecode import"
        " q204_scene_cuts\n"
        "n = q204_scene_cuts(spark, '/root/testdata/sf0.001').count()\n"
        "assert n > 0, n\n"
        "print('FOREIGN_CWD_OK', n)\n"
        "spark.stop()\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "FOREIGN_CWD_OK" in out.stdout, out.stderr[-2000:]


def test_gain_audio_batch_roundtrip(spark):
    """decode(gain(encode)) must produce exactly the int16-saturated
    scaled samples, channel layout preserved."""
    import numpy as np

    from etl_job_applify_spark.multimodal import (
        attach_fake_wav,
        decode_audio_batch,
        gain_audio_batch,
    )
    from etl_job_applify_spark.multimodal import wavpcm

    docs = spark.createDataFrame([(3,), (8,)], "doc_id bigint")
    gained = decode_audio_batch(gain_audio_batch(attach_fake_wav(docs), 2))
    rows = {r.doc_id: r for r in gained.collect()}
    for doc_id in (3, 8):
        ch, fr = wavpcm.fixture_params(doc_id)
        want = np.clip(
            wavpcm.fixture_samples(doc_id, fr * ch).astype(np.int64) * 2,
            -32768,
            32767,
        ).astype("<i2")
        got = np.frombuffer(bytes(rows[doc_id].pcm), dtype="<i2")
        assert rows[doc_id].n_channels == ch
        assert rows[doc_id].n_frames == fr
        assert np.array_equal(got, want)
