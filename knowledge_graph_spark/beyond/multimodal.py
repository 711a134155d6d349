"""Multimodal columns — image/audio/video as opaque ``binary`` columns with
typed metadata (north-star component).

The Spark-side plumbing is real: schema, partition-friendly batch shapes,
Arrow-batched ``mapInPandas`` UDF signatures identical to what a production
decode would use. The IMAGE path is a REAL codec: binary PPM (P6) files are
synthesized with actual pixel bytes, and decode/resize parse and
nearest-neighbor-resample them in pure Python (no external libs needed for
this format). Audio/video remain STUBBED behind the synthetic KGMM header —
this container ships no audio/video libraries — with ``decoder=`` hooks:
passing ``decoder="pillow"`` (etc.) raises ``NotImplementedError`` with the
swap instructions.

At 100 TB: binary payloads dominate row size — media tables are stored one
row per asset with metadata in columns so pruning (`select` without `data`)
never touches the bytes; ``spark.sql.files.maxPartitionBytes`` bounds task
input; feature extraction shuffles nothing (narrow mapInPandas).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("data", BinaryType(), True),
        StructField("source_doc_id", LongType(), True),
    ]
)

_MAGIC = b"KGMM"  # synthetic header: KGMM | kind(1B) | width u16 | height u16 | n_frames u16


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media derived from the documents table — gives the
    pipeline real binary payloads with parseable headers for tests/benches.

    IMAGE rows are REAL binary PPM (P6) files — a valid, externally-viewable
    format with actual pixel bytes (w = doc_id%96+8, h = doc_id%12+4, every
    pixel channel the same doc-derived byte), so the decode/resize path
    below operates on a genuine container, not just the KGMM fake. Audio
    and video keep the synthetic KGMM header (no dependency-free container
    is that simple for them)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    header = F.concat(
        F.lit(_MAGIC),
        F.encode(F.substring(kind, 1, 1), "utf-8"),
        # width/height/frames encoded as zero-padded ascii (simple + portable)
        F.encode(F.lpad((F.col("doc_id") % 640 + 16).cast("string"), 5, "0"), "utf-8"),
        F.encode(F.lpad((F.col("doc_id") % 480 + 16).cast("string"), 5, "0"), "utf-8"),
        F.encode(F.lpad((F.col("doc_id") % 120 + 1).cast("string"), 5, "0"), "utf-8"),
    )
    w_img = (F.col("doc_id") % 96 + 8).cast("string")
    h_img = (F.col("doc_id") % 12 + 4).cast("string")
    ppm = F.encode(
        F.concat(
            F.lit("P6\n"), w_img, F.lit(" "), h_img, F.lit("\n255\n"),
            # pixel bytes: printable ASCII (1 byte/char under UTF-8)
            F.expr(
                "repeat(char(32 + doc_id % 64), "
                "CAST((doc_id % 96 + 8) * (doc_id % 12 + 4) * 3 AS INT))"
            ),
        ),
        "utf-8",
    )
    data = F.when(kind == "image", ppm).otherwise(
        F.concat(header, F.encode(F.col("text"), "utf-8"))
    )
    mime = F.when(kind == "image", F.lit("image/x-portable-pixmap")).otherwise(
        F.concat(F.lit("x-kg/"), kind)
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        data.alias("data"),
        F.col("doc_id").alias("source_doc_id"),
    )


def _parse_ppm(b: bytes) -> tuple[int, int, int]:
    """(width, height, pixel_offset) of a binary P6 PPM. Raises on garbage —
    callers treat that as an undecodable asset."""
    nl1 = b.index(b"\n", 3)
    w, h = (int(x) for x in b[3:nl1].split())
    nl2 = b.index(b"\n", nl1 + 1)  # maxval line
    return w, h, nl2 + 1


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("payload_bytes", LongType(), True),
    ]
)


def decode_metadata(media: DataFrame, decoder: str = "synthetic") -> DataFrame:
    """Decode step: parse typed metadata out of the binary column.

    The default decoder handles two containers: REAL binary PPM (P6) images
    — an actual pure-Python parse of the header and pixel payload — and the
    synthetic KGMM header for audio/video (this container ships no
    audio/video libraries). Any other codec name raises NotImplementedError
    — swap in a Pillow/ffmpeg batch decode with the identical mapInPandas
    signature; the Spark plan, batch shape, and output schema do not change.
    """
    if decoder != "synthetic":
        raise NotImplementedError(
            f"decoder '{decoder}' needs an image/audio library not present in "
            "this environment; implement it inside `run` below with the same "
            "(Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame] contract"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                b = bytes(data)
                if b.startswith(b"P6"):
                    try:
                        w, h, off = _parse_ppm(b)
                        out.append((mid, kind, w, h, 1, len(b) - off))
                    except (ValueError, IndexError):
                        out.append((mid, kind, None, None, None, len(b)))
                    continue
                if not b.startswith(_MAGIC):
                    out.append((mid, kind, None, None, None, len(b)))
                    continue
                w = int(b[5:10])
                h = int(b[10:15])
                nf = int(b[15:20])
                out.append((mid, kind, w, h, nf, len(b) - 20))
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA]
            )

    return media.select("media_id", "kind", "data").mapInPandas(run, DECODED_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction (STUB model): deterministic hash-derived embedding
    per asset — the real model swap point; plumbing (Arrow batches, array
    column output, joinable by media_id with beyond.similarity) is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                digest = hashlib.sha256(bytes(data)).digest()
                vec = [
                    struct.unpack("<h", digest[2 * i : 2 * i + 2])[0] / 32768.0
                    for i in range(dim)
                ]
                rows.append((mid, vec))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.select("media_id", "data").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan (STUB decode): one output row per sampled
    frame index — the explode shape a real ffmpeg sampler would produce."""
    decoded = decode_metadata(media)
    frames = decoded.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
    return frames


def resize_media(
    media: DataFrame, max_width: int = 64, decoder: str = "synthetic"
) -> DataFrame:
    """Resize step (STUB codec): downscale every image/video wider than
    ``max_width``, preserving aspect ratio; smaller assets pass through.

    The synthetic transform rewrites the KGMM header dimensions and truncates
    the payload proportionally to the area change — deterministic, so tests
    can assert exact output sizes. A real implementation swaps the body of
    ``run`` for a Pillow/ffmpeg batch resize with the identical
    (Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame] contract; schema,
    partitioning, and batch shape are unchanged.

    At 100 TB this is the canonical narrow transform: no shuffle, payload
    bytes stream through Arrow batches, and column pruning means a metadata-
    only consumer never reads ``data`` at all.
    """
    if decoder != "synthetic":
        raise NotImplementedError(
            f"decoder '{decoder}' needs an image library not present in this "
            "environment; implement it inside `run` below with the same "
            "(Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame] contract"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                b = bytes(data)
                if b.startswith(b"P6"):
                    # REAL image resize: nearest-neighbor resample of actual
                    # PPM pixel bytes, re-encoded as a valid smaller PPM
                    try:
                        w, h, off = _parse_ppm(b)
                    except (ValueError, IndexError):
                        rows.append((mid, kind, None, None, b, False))
                        continue
                    if w <= max_width:
                        rows.append((mid, kind, w, h, b, False))
                        continue
                    nw = max_width
                    nh = max(1, (h * max_width) // w)
                    px = b[off:]
                    out_px = bytearray()
                    for y2 in range(nh):
                        sy = y2 * h // nh
                        for x2 in range(nw):
                            sx = x2 * w // nw
                            p = (sy * w + sx) * 3
                            out_px += px[p : p + 3]
                    nb = f"P6\n{nw} {nh}\n255\n".encode() + bytes(out_px)
                    rows.append((mid, kind, nw, nh, nb, True))
                    continue
                if kind == "audio" or not b.startswith(_MAGIC):
                    rows.append((mid, kind, None, None, b, False))
                    continue
                w, h = int(b[5:10]), int(b[10:15])
                if w <= max_width:
                    rows.append((mid, kind, w, h, b, False))
                    continue
                nw = max_width
                nh = max(1, (h * max_width) // w)
                payload = b[20:]
                keep = max(1, (len(payload) * nw * nh) // max(1, w * h))
                nb = (
                    b[:5]
                    + str(nw).zfill(5).encode()
                    + str(nh).zfill(5).encode()
                    + b[15:20]
                    + payload[:keep]
                )
                rows.append((mid, kind, nw, nh, nb, True))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "data", "resized"],
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("data", BinaryType(), True),
            StructField("resized", BooleanType(), False),
        ]
    )
    return media.select("media_id", "kind", "data").mapInPandas(run, schema)
