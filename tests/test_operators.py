"""Skew utilities + bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark):
    from knowledge_graph_spark.operators.skew import salted_join

    large = spark.range(0, 10000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k long, label string")
    plain = large.join(small, "k").select("k", "payload", "label")
    salted = salted_join(large, small, "k", salt=8).select("k", "payload", "label")
    assert salted.count() == plain.count() == 10000
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()
    # the salted plan spreads each hot key across multiple partitions
    parts = (
        salted.withColumn("p", F.spark_partition_id())
        .groupBy("k")
        .agg(F.countDistinct("p").alias("np"))
        .agg(F.min("np"))
        .collect()[0][0]
    )
    assert parts >= 1


def test_key_skew_profile(spark):
    from knowledge_graph_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [("hot",)] * 90 + [("cold",)] * 10, "k string"
    )
    prof = key_skew_profile(df, "k").collect()
    assert prof[0].k == "hot" and abs(prof[0].share - 0.9) < 1e-9


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from knowledge_graph_spark.io import write_bucketed

    nodes = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("x"))
    edges = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("src"), F.col("id").alias("eid")
    )
    write_bucketed(nodes, "t_nodes_b", ["id"], num_buckets=8)
    write_bucketed(edges, "t_edges_b", ["src"], num_buckets=8)
    n = spark.table("t_nodes_b")
    e = spark.table("t_edges_b")
    joined = e.join(n, e.src == n.id)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == 5000
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    spark.sql("DROP TABLE t_nodes_b")
    spark.sql("DROP TABLE t_edges_b")


def test_interval_join_matches_brute_force(spark):
    """Bucketized interval join ≡ the naive theta join, including boundary
    inclusivity, multi-bucket spans, and points outside every interval."""
    from knowledge_graph_spark.operators.range_join import interval_join

    intervals = spark.createDataFrame(
        [
            (1, 100, 250, "a"),     # spans buckets 1-2 at B=100
            (1, 300, 300, "b"),     # zero-length
            (1, 240, 320, "c"),     # overlaps 'a' and 'b'
            (2, 0, 1000, "d"),      # long interval, many buckets
        ],
        "user_id long, session_start long, session_end long, tag string",
    )
    points = spark.createDataFrame(
        [(i, 1, i * 10) for i in range(40)] + [(100, 2, 500), (101, 3, 50)],
        "event_id long, user_id long, ts long",
    )
    got = {
        (r.event_id, r.tag)
        for r in interval_join(points, intervals, bucket_seconds=100).collect()
    }
    expect = {
        (p.event_id, i.tag)
        for p in points.collect()
        for i in intervals.collect()
        if p.user_id == i.user_id and i.session_start <= p.ts <= i.session_end
    }
    assert got == expect and got  # non-trivial


def test_interval_join_is_equi_join(spark):
    """The composition must plan as a hash/sort-merge equi-join — never the
    BroadcastNestedLoopJoin a raw BETWEEN predicate degenerates to."""
    from knowledge_graph_spark.operators.range_join import interval_join

    intervals = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        (F.col("id") * 50).alias("session_start"),
        (F.col("id") * 50 + 40).alias("session_end"),
    )
    points = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        (F.col("id") * 7).alias("ts"),
    )
    plan = (
        interval_join(points, intervals)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan, plan[:2000]
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan[:2000]


def test_write_sorted_layout_enables_pruning(spark, tmp_path):
    """write_sorted must produce files with narrow, non-overlapping key
    ranges (checked against the parquet footers with pyarrow) — the property
    that lets a range filter skip files via min/max stats."""
    import glob

    import pyarrow.parquet as pq

    from knowledge_graph_spark.io import write_sorted

    df = spark.range(100_000).select(
        (F.xxhash64("id") % 1000000).alias("k"), F.col("id").alias("payload")
    )
    out = str(tmp_path / "sorted")
    write_sorted(df, out, ["k"], num_files=8)
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files


def test_interval_join_clamps_corrupt_spans(spark):
    """One epoch-0..now interval must not explode the job: the bucket
    sequence is clamped at max_buckets_per_interval."""
    from knowledge_graph_spark.operators.range_join import interval_join

    intervals = spark.createDataFrame(
        [(1, 0, 1_700_000_000, "corrupt"), (1, 500, 700, "ok")],
        "user_id long, session_start long, session_end long, tag string",
    )
    points = spark.createDataFrame(
        [(1, 1, 600), (2, 1, 50)], "event_id long, user_id long, ts long"
    )
    got = {
        (r.event_id, r.tag)
        for r in interval_join(
            points, intervals, bucket_seconds=100, max_buckets_per_interval=3
        ).collect()
    }
    # 'ok' matches point 600; the corrupt interval still matches points inside
    # its first 3 buckets (ts=50) but not beyond the clamp (ts=600)
    assert got == {(1, "ok"), (2, "corrupt")}
