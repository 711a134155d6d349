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
    # doc 2 is VIDEO: a real YUV4MPEG2 stream, w=(2%48+8)*2, h=(2%6+2)*2,
    # n_frames = 2%12+1, payload = n*w*h*3/2 planar YUV bytes
    r2 = next(r for r in rows if r.media_id == 2)
    assert (r2.width, r2.height, r2.n_frames) == (20, 8, 3)
    assert r2.payload_bytes == 3 * 20 * 8 * 3 // 2
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
    # resized payloads are VALID containers with the new dims written in:
    # PPM header or Y4M stream header (per-plane resample, frame count kept)
    from knowledge_graph_spark.beyond.multimodal import _parse_ppm, _parse_y4m

    orig = {r.media_id: r for r in media.collect()}
    for r in rows:
        b = bytes(r.data)
        if b.startswith(b"P6"):
            w, h, _ = _parse_ppm(b)
        else:
            w, h, nf, _ = _parse_y4m(b)
            assert nf == orig[r.media_id].media_id % 12 + 1  # frames preserved
        assert (w, h) == (64, r.height)
        # payload shrank with the area
        assert len(b) <= len(bytes(orig[r.media_id].data))
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


def test_y4m_codec_roundtrip(media):
    """Video rows are REAL YUV4MPEG2 streams: header tokens parse, body
    length is exactly n_frames C420 frames, every FRAME marker is in place,
    and the resample emits a stream obeying the same arithmetic."""
    from knowledge_graph_spark.beyond.multimodal import _parse_y4m, resize_media

    rows = media.filter(F.col("kind") == "video").limit(5).collect()
    assert rows
    for r in rows:
        b = bytes(r.data)
        doc = r.media_id
        w, h, nf, off = _parse_y4m(b)
        assert (w, h) == ((doc % 48 + 8) * 2, (doc % 6 + 2) * 2)
        assert nf == doc % 12 + 1
        fs = 6 + w * h * 3 // 2
        assert len(b) - off == nf * fs  # exact C420 frame arithmetic
        for i in range(nf):
            assert b[off + i * fs : off + i * fs + 6] == b"FRAME\n"
        # uniform source -> every plane byte carries the doc-derived value
        assert all(c == 32 + doc % 64 for c in b[off + 6 : off + fs])
    # real per-plane resample: pick a wide video and downscale
    wide = next(r for r in media.collect()
                if r.kind == "video" and (r.media_id % 48 + 8) * 2 > 32)
    out = {o.media_id: o for o in resize_media(media, max_width=32).collect()}[
        wide.media_id
    ]
    nb = bytes(out.data)
    nw, nh, nnf, noff = _parse_y4m(nb)
    assert out.resized and nw == 32 and nnf == wide.media_id % 12 + 1
    nfs = 6 + nw * nh * 3 // 2
    assert len(nb) - noff == nnf * nfs
    # uniform source image -> resampled planes keep the same byte
    assert all(c == 32 + wide.media_id % 64 for c in nb[noff + 6 : noff + nfs])
