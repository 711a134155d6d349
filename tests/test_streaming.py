"""Streaming layer: debounce-window job coalescing (ST1/ST4/ST5) and
batch-equivalence of the streaming event rollup (exactly-once windowed agg)."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_debounced_jobs_coalesce_and_split_changes(spark, tmp_path):
    from knowledge_graph_spark.streaming import watcher as W

    watch = tmp_path / "events"
    watch.mkdir()
    rows = [
        {"project": "alpha", "path": "a.py", "change_type": "modified",
         "event_time": "2024-01-01T00:00:00.500"},
        {"project": "alpha", "path": "b.py", "change_type": "created",
         "event_time": "2024-01-01T00:00:01.200"},
        {"project": "alpha", "path": "a.py", "change_type": "modified",
         "event_time": "2024-01-01T00:00:02.000"},
        {"project": "alpha", "path": "gone.py", "change_type": "deleted",
         "event_time": "2024-01-01T00:00:02.500"},
        {"project": "beta", "path": "x.ts", "change_type": "modified",
         "event_time": "2024-01-01T00:00:01.000"},
        # next debounce window
        {"project": "alpha", "path": "late.py", "change_type": "modified",
         "event_time": "2024-01-01T00:00:05.000"},
    ]
    (watch / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    jobs: list = []
    q = W.run_debounced_reindex(
        spark,
        str(watch),
        on_job=lambda project, changed, deleted: jobs.append((project, changed, deleted)),
        query_name="test-watcher",
        available_now=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    got = sorted(jobs)
    assert ("alpha", ["a.py", "b.py"], ["gone.py"]) in got  # window 0-3s, dedup'd
    assert ("alpha", ["late.py"], []) in got  # window 3-6s
    assert ("beta", ["x.ts"], []) in got


def test_streaming_rollup_equals_batch(spark):
    from knowledge_graph_spark.queries import analytics as A
    from knowledge_graph_spark.io import read_table
    from knowledge_graph_spark.streaming.watcher import streaming_event_rollup

    agg = streaming_event_rollup(spark, SF_SMALL)
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("stream_rollup").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in A.event_hourly_rollup(read_table(spark, SF_SMALL, "events"))
        .drop("n_users")
        .collect()
    }
    assert streamed == batch


def test_debounce_drops_excluded_dirs(spark):
    """Events under .git / node_modules never schedule a job (watcher.rs:27)."""
    from knowledge_graph_spark.streaming import watcher as W

    rows = [
        ("alpha", ".git/objects/ab", "modified"),
        ("alpha", "vendor/node_modules/x/index.js", "created"),
        ("alpha", "src/__pycache__/m.pyc", "modified"),
        ("alpha", "src/main.py", "modified"),
    ]
    events = spark.createDataFrame(
        [(p, f, c, __import__("datetime").datetime(2024, 1, 1)) for p, f, c in rows],
        W.FILE_EVENT_SCHEMA,
    )
    jobs = W.debounced_jobs(events).collect()
    assert len(jobs) == 1
    assert list(jobs[0].changed_paths) == ["src/main.py"]


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream containment join (availableNow) must equal the batch
    bucketized interval join on the same data."""
    import json

    from knowledge_graph_spark.operators.range_join import interval_join
    from knowledge_graph_spark.streaming.joins import interval_join_stream

    points = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01T10:02:00"},
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01T11:00:00"},  # no interval
        {"event_id": 3, "user_id": 2, "ts": "2024-01-01T10:30:00"},
        {"event_id": 4, "user_id": 1, "ts": "2024-01-01T10:10:00"},  # boundary end
    ]
    intervals = [
        {"user_id": 1, "session_seq": 1,
         "session_start": "2024-01-01T10:00:00", "session_end": "2024-01-01T10:10:00"},
        {"user_id": 2, "session_seq": 1,
         "session_start": "2024-01-01T10:00:00", "session_end": "2024-01-01T10:45:00"},
        {"user_id": 1, "session_seq": 2,
         "session_start": "2024-01-01T12:00:00", "session_end": "2024-01-01T12:30:00"},
    ]
    pdir, idir = tmp_path / "points", tmp_path / "intervals"
    pdir.mkdir(); idir.mkdir()
    (pdir / "p.json").write_text("\n".join(json.dumps(r) for r in points))
    (idir / "i.json").write_text("\n".join(json.dumps(r) for r in intervals))

    p_schema = "event_id long, user_id long, ts timestamp"
    i_schema = ("user_id long, session_seq long, "
                "session_start timestamp, session_end timestamp")
    ps = spark.readStream.schema(p_schema).json(str(pdir))
    es = spark.readStream.schema(i_schema).json(str(idir))
    q = (
        interval_join_stream(ps, es)
        .writeStream.format("memory")
        .queryName("sij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.event_id, r.session_seq) for r in spark.table("sij_out").collect()
    }

    pb = spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["ts"].replace("T", " ")) for r in points],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    ib = spark.createDataFrame(
        [(r["user_id"], r["session_seq"], r["session_start"].replace("T", " "),
          r["session_end"].replace("T", " ")) for r in intervals],
        "user_id long, session_seq long, ss string, se string",
    ).select("user_id", "session_seq",
             F.col("ss").cast("timestamp").alias("session_start"),
             F.col("se").cast("timestamp").alias("session_end"))
    batch = {
        (r.event_id, r.session_seq) for r in interval_join(pb, ib).collect()
    }
    assert streamed == batch == {(1, 1), (4, 1), (3, 1)}


def test_debounce_drops_excluded_dir_entry_events(spark):
    """A delete/rename event for the excluded dir ITSELF (path ends at the
    segment) must not schedule a job either."""
    from knowledge_graph_spark.streaming import watcher as W

    rows = [
        ("alpha", ".git", "deleted"),
        ("alpha", "src/node_modules", "deleted"),
        ("alpha", "src/app.py", "modified"),
    ]
    events = spark.createDataFrame(
        [(p, f, c, __import__("datetime").datetime(2024, 1, 1)) for p, f, c in rows],
        W.FILE_EVENT_SCHEMA,
    )
    jobs = W.debounced_jobs(events).collect()
    assert len(jobs) == 1
    assert list(jobs[0].changed_paths) == ["src/app.py"]
    assert list(jobs[0].deleted_paths) == []


def test_priority_queue_supersede(spark):
    """ST3 priorities: a High-priority dispatch cancels every still-queued
    job of the same (workspace, job_type) — dispatch.rs:88-91 +
    worker.rs:122-138 — scoped by type, and Normal/Low never cancel."""
    from knowledge_graph_spark.streaming.watcher import (
        JOB_INDEX_WORKSPACE,
        JOB_REINDEX_PROJECT,
        PRIORITY_HIGH,
        PRIORITY_LOW,
        PRIORITY_NORMAL,
        prioritized_queue,
        queue_lifecycle_events,
    )

    log = spark.createDataFrame(
        [
            # background Normal reindex queued first...
            ("ws1", JOB_REINDEX_PROJECT, PRIORITY_NORMAL, 10),
            ("ws1", JOB_REINDEX_PROJECT, PRIORITY_LOW, 20),
            # ...then a user-triggered High reindex → both above cancelled
            ("ws1", JOB_REINDEX_PROJECT, PRIORITY_HIGH, 30),
            # queued AFTER the High job → survives
            ("ws1", JOB_REINDEX_PROJECT, PRIORITY_NORMAL, 40),
            # different type, same workspace → untouched (type-scoped)
            ("ws1", JOB_INDEX_WORKSPACE, PRIORITY_NORMAL, 15),
            # different workspace → untouched (queue per workspace)
            ("ws2", JOB_REINDEX_PROJECT, PRIORITY_NORMAL, 5),
            # Normal after Low does NOT cancel (only High supersedes)
            ("ws2", JOB_REINDEX_PROJECT, PRIORITY_LOW, 6),
            ("ws2", JOB_REINDEX_PROJECT, PRIORITY_NORMAL, 7),
        ],
        "project string, job_type string, priority int, seq long",
    )
    out = {
        (r["project"], r["job_type"], r["seq"]): r["status"]
        for r in prioritized_queue(log).collect()
    }
    assert out[("ws1", JOB_REINDEX_PROJECT, 10)] == "Cancelled"
    assert out[("ws1", JOB_REINDEX_PROJECT, 20)] == "Cancelled"
    assert out[("ws1", JOB_REINDEX_PROJECT, 30)] == "Pending"  # the High job itself
    assert out[("ws1", JOB_REINDEX_PROJECT, 40)] == "Pending"
    assert out[("ws1", JOB_INDEX_WORKSPACE, 15)] == "Pending"
    assert out[("ws2", JOB_REINDEX_PROJECT, 5)] == "Pending"
    assert out[("ws2", JOB_REINDEX_PROJECT, 6)] == "Pending"
    assert out[("ws2", JOB_REINDEX_PROJECT, 7)] == "Pending"

    events = queue_lifecycle_events(prioritized_queue(log)).collect()
    cancelled = [e for e in events if e["event_type"] == "JobCancelled"]
    assert len(cancelled) == 2
    assert {e["at_seq"] for e in cancelled} == {10, 20}
