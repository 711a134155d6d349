"""Custom stateful streaming operator (applyInPandasWithState sessionizer)
against its batch oracle (analytics.sessionize)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    from knowledge_graph_spark.queries.analytics import sessionize
    from knowledge_graph_spark.streaming.sessions import sessionize_stream

    rows = [
        # user 1: session A (2 events), session B (1), open session C
        {"user_id": 1, "ts": "2024-01-01T10:00:00", "value": 1.5},
        {"user_id": 1, "ts": "2024-01-01T10:05:00", "value": 2.0},
        {"user_id": 1, "ts": "2024-01-01T11:30:00", "value": 4.25},
        {"user_id": 1, "ts": "2024-01-01T13:00:00", "value": 8.0},
        # user 2: one closed session, open tail
        {"user_id": 2, "ts": "2024-01-01T09:00:00", "value": 1.0},
        {"user_id": 2, "ts": "2024-01-01T16:00:00", "value": 1.0},
    ]
    src = tmp_path / "stream-in"
    src.mkdir()
    (src / "events.json").write_text("\n".join(json.dumps(r) for r in rows))

    schema = "user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.table("sessions_out").collect()
    }

    batch_df = spark.createDataFrame(
        [(r["user_id"], r["ts"].replace("T", " "), r["value"]) for r in rows],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    batch = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in sessionize(batch_df, gap_minutes=30).collect()
    }

    # the stream emits only CLOSED sessions (a later event arrived past the
    # gap); open tails stay in state — every closed session must match batch
    assert streamed
    assert len(streamed) == 3  # user1: A,B; user2: first session
    for key, vals in streamed.items():
        assert batch[key] == vals, (key, vals, batch.get(key))
    # and the open tails are exactly the batch sessions not yet emitted
    open_tails = set(batch) - set(streamed)
    assert {k[0] for k in open_tails} == {1, 2}
