"""Multimodal column plumbing: schema, Arrow-batched decode/feature UDF
shapes, frame-sampling explode, and the stub gate for real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    from knowledge_graph_spark.beyond.multimodal import synthesize_media
    from knowledge_graph_spark.io import read_table

    return synthesize_media(read_table(spark, SF_SMALL, "documents")).cache()


def test_media_schema_and_pruning(media):
    assert dict(media.dtypes)["data"] == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # metadata-only projection never deserializes payloads
    assert media.select("media_id", "kind", "mime").count() == media.count()


def test_decode_metadata(media):
    from knowledge_graph_spark.beyond.multimodal import decode_metadata

    dec = decode_metadata(media)
    rows = dec.collect()
    assert len(rows) == media.count()
    # doc 0 is an IMAGE: a real PPM, w = 0%96+8, h = 0%12+4, 1 frame
    r0 = next(r for r in rows if r.media_id == 0)
    assert (r0.width, r0.height, r0.n_frames) == (8, 4, 1)
    assert r0.payload_bytes == 8 * 4 * 3  # actual pixel byte count
    # doc 1 is AUDIO: a real RIFF/WAVE, rate = 8000+1*1000, frames = 1%2000+100
    r1 = next(r for r in rows if r.media_id == 1)
    assert (r1.sample_rate, r1.n_frames) == (9000, 101)
    assert r1.width is None and r1.payload_bytes == 101 * 2
    # doc 2 is VIDEO via the synthetic KGMM header
    r2 = next(r for r in rows if r.media_id == 2)
    assert (r2.width, r2.height, r2.n_frames) == (18, 18, 3)
    assert all(r.payload_bytes > 0 for r in rows)


def test_ppm_codec_roundtrip(media):
    """IMAGE rows are genuine binary PPMs: the header parses with a
    reference-independent parser and every pixel carries the doc-derived
    byte; resize does a real nearest-neighbor resample of those bytes."""
    from knowledge_graph_spark.beyond.multimodal import resize_media

    img = next(
        r
        for r in media.collect()
        if r.media_id % 3 == 0 and r.media_id % 96 + 8 > 64
    )
    b = bytes(img.data)
    assert b.startswith(b"P6\n")
    nl1 = b.index(b"\n", 3)
    w, h = (int(x) for x in b[3:nl1].split())
    off = b.index(b"\n", nl1 + 1) + 1
    assert len(b) - off == w * h * 3
    expected_px = 32 + img.media_id % 64
    assert all(c == expected_px for c in b[off:])
    assert w > 64  # wide enough that resize actually resamples
    out = {
        r.media_id: r
        for r in resize_media(media, max_width=64).collect()
        if r.media_id == img.media_id
    }[img.media_id]
    assert out.resized and out.width == 64 and out.height == max(1, h * 64 // w)
    nb = bytes(out.data)
    noff = nb.index(b"\n255\n") + 5
    assert len(nb) - noff == out.width * out.height * 3
    # uniform source image -> every resampled pixel keeps the same byte
    assert all(c == expected_px for c in nb[noff:])


def test_real_decoder_is_gated(media):
    from knowledge_graph_spark.beyond.multimodal import decode_metadata

    with pytest.raises(NotImplementedError, match="pillow"):
        decode_metadata(media, decoder="pillow")


def test_extract_features_joinable_with_similarity(media, spark):
    from knowledge_graph_spark.beyond.multimodal import extract_features
    from knowledge_graph_spark.beyond.similarity import cosine_topk

    feats = extract_features(media, dim=16)
    assert dict(feats.dtypes)["feature"] == "array<float>"
    qv = [float(v) for v in feats.orderBy("media_id").limit(1).collect()[0]["feature"]]
    emb_like = feats.select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").alias("embedding"),
        F.lit(0).alias("label"),
    )
    top = cosine_topk(emb_like, qv, k=3).collect()
    assert top[0].vec_id == 0 and abs(top[0].cosine - 1.0) < 1e-9


def test_frame_sample_explode(media):
    from knowledge_graph_spark.beyond.multimodal import frame_sample

    frames = frame_sample(media, every_n=10)
    assert frames.filter(F.col("frame_idx") % 10 != 0).count() == 0
    per = frames.groupBy("media_id").count().collect()
    assert per and all(r["count"] >= 1 for r in per)


def test_resize_media(media):
    from knowledge_graph_spark.beyond.multimodal import decode_metadata, resize_media

    out = resize_media(media, max_width=64).cache()
    assert out.count() == media.count()
    # audio passes through untouched
    assert out.filter((F.col("kind") == "audio") & F.col("resized")).count() == 0
    wide = decode_metadata(media).filter(
        (F.col("kind") != "audio") & (F.col("width") > 64)
    )
    resized = out.filter(F.col("resized"))
    assert resized.count() == wide.count()
    rows = resized.collect()
    assert rows and all(r.width == 64 for r in rows)
    # header dims were rewritten in the payload itself
    r0 = rows[0]
    b = bytes(r0.data)
    assert int(b[5:10]) == 64 and int(b[10:15]) == r0.height
    # payload shrank with the area
    orig = {r.media_id: r for r in media.collect()}
    assert all(len(bytes(r.data)) <= len(bytes(orig[r.media_id].data)) for r in rows)
    out.unpersist()


def test_resize_gated(media):
    from knowledge_graph_spark.beyond.multimodal import resize_media

    with pytest.raises(NotImplementedError, match="pillow"):
        resize_media(media, decoder="pillow")


def test_wav_codec_roundtrip(media):
    """Audio rows are REAL RIFF/WAVE files: the stdlib `wave` module (an
    independent parser) opens them and agrees with our chunk-walk decode."""
    import io
    import wave

    from knowledge_graph_spark.beyond.multimodal import decode_metadata

    dec = {r.media_id: r for r in decode_metadata(media).collect()}
    rows = media.filter(F.col("kind") == "audio").limit(5).collect()
    assert rows
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.data))) as w:
            assert w.getframerate() == dec[r.media_id].sample_rate
            assert w.getnframes() == dec[r.media_id].n_frames
            assert w.getnchannels() == 1 and w.getsampwidth() == 2


def test_downsample_audio_golden(media):
    """Decimation downsample: every audio row faster than max_rate is
    re-encoded at rate//k with ceil(n/k) frames, and the output is a valid
    WAV per the stdlib parser; slower rows and non-audio pass through."""
    import io
    import wave

    from knowledge_graph_spark.beyond.multimodal import downsample_audio

    out = downsample_audio(media, max_rate=9000).collect()
    for r in out:
        if r.kind != "audio":
            assert not r.resampled
            continue
        doc = r.media_id
        orig_rate = 8000 + (doc % 8) * 1000
        orig_n = doc % 2000 + 100
        with wave.open(io.BytesIO(bytes(r.data))) as w:
            if orig_rate <= 9000:
                assert not r.resampled and w.getframerate() == orig_rate
                assert w.getnframes() == orig_n
            else:
                k = -(-orig_rate // 9000)
                assert r.resampled and w.getframerate() == orig_rate // k
                assert w.getnframes() == (orig_n + k - 1) // k
