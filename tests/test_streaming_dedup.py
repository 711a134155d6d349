"""Streaming dedup: first-seen kept across microbatches, duplicates counted,
consistent with the batch exact_duplicates operator."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def test_stream_dedup_across_batches(spark, tmp_path):
    from knowledge_graph_spark.streaming.dedup import dedup_stream

    src = tmp_path / "in"
    src.mkdir()
    # batch 1: two distinct docs + one dup of doc 1
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "alpha beta gamma delta epsilon one"},
                {"doc_id": 2, "text": "zeta eta theta iota kappa two"},
                {"doc_id": 3, "text": "alpha beta gamma delta epsilon three"},
            ]
        )
    )
    # batch 2 arrives later: another dup of doc 1's prefix + a new doc
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 9, "text": "alpha beta gamma delta epsilon nine"},
                {"doc_id": 4, "text": "lambda mu nu xi omicron four"},
            ]
        )
    )
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        dedup_stream(stream, prefix_tokens=5)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup_out").collect()
    # final view per fingerprint: keep the max n_duplicates_so_far
    latest = {}
    for r in rows:
        cur = latest.get(r.fingerprint)
        if cur is None or r.n_duplicates_so_far > cur[1]:
            latest[r.fingerprint] = (r.first_doc_id, r.n_duplicates_so_far)
    assert len(latest) == 3  # three distinct prefixes
    dup_fp = [v for v in latest.values() if v[1] > 0]
    assert dup_fp == [(1, 2)]  # docs 3 and 9 suppressed, doc 1 kept
