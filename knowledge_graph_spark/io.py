"""IO kernel: parquet read/write + deterministic dense ID assignment.

Reference behaviors re-expressed:
- Parquet/SNAPPY columnar at rest (crates/indexer/src/writer.rs:96-98). Spark
  writes parquet natively; there is no separate "COPY ... FROM parquet" bulk
  load step (connection.rs:114-200) — the parquet IS the queryable table.
- Dense sequential ids per node table, keyed by path (dirs/files) or
  (file_path, start_byte, end_byte) (defs/imports)
  (crates/indexer/src/mutation/utils.rs:23-163), with resume-from-max(id)
  on incremental runs (mutation/changes.rs:150-192).

Scale note: ``row_number`` over a single unpartitioned window is a
single-reducer bottleneck at 100 TB. ``assign_dense_ids`` therefore uses
``zipWithIndex``-equivalent two-phase numbering, entirely JVM-side: local
indexes come from ``monotonically_increasing_id``'s low 33 bits, partition
offsets from a tiny count aggregation + exclusive prefix sum broadcast back.
Ordering stays deterministic because rows are first repartitioned by range
on the key (stable total order).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on, applied defensively — the driver
    may hand us a vanilla session (no session.py builder): TIMESTAMP(NANOS)
    parquet reads need nanosAsLong, and timestamp window semantics must be
    UTC to agree with the (timezone-naive) DuckDB oracle."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # a vanilla session defaults to 200 shuffle partitions — severe
        # overhead at test scale; AQE coalescing makes 32 safe at any scale
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # cached plans are excluded from AQE unless this is set — without
        # it every cache() in the build pipeline runs shuffles at full
        # static width (see session.py)
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        from knowledge_graph_spark.session import default_parallelism

        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:
        pass  # static-conf rejection: session.py already set them at build


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # TIMESTAMP(NANOS) parquet columns vary by Spark version: epoch-nanos
    # longs under nanosAsLong (≤ some 4.x builds) or TIMESTAMP_NTZ (current).
    # Normalize both to a session-UTC TIMESTAMP so downstream epoch casts
    # (cast as long) stay legal — NTZ forbids them. Long path uses integer
    # division (a double division loses precision above 2^53 ns).
    for field in df.schema:
        if field.name != "ts":
            continue
        if field.dataType.typeName() == "long":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif field.dataType.typeName() == "timestamp_ntz":
            # wall clock reinterpreted in the session tz (UTC) — the same
            # instant the naive DuckDB oracle sees
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TPCH_TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """writer.rs:96-98 analog — snappy parquet, overwrite semantics (M4)."""
    w = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table for shuffle-free co-located joins.

    Two tables bucketed the same way on their join key (e.g. edges on
    source_id and nodes on id, both 32 buckets) join with NO shuffle on
    either side — the big win for the repeated node⋈edge joins of the query
    library at 100 TB. Bucketing requires saveAsTable (metastore-tracked
    bucket metadata); plain parquet files cannot carry it.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def assign_dense_ids(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    start: int = 1,
    size_hint: int | None = None,
) -> DataFrame:
    """Assign dense sequential ids ordered by ``key_cols``.

    Mirrors NodeIdGenerator (mutation/utils.rs:23-163): dense, deterministic,
    resumable via ``start`` = max(id)+1 of the previous snapshot (M3).

    Implementation is two-phase (no global single-reducer sort):
    1. range-repartition by key → partitions hold contiguous key ranges;
    2. row_number within each partition (parallel) + exclusive prefix sum of
       partition counts (driver-side, one long per partition).

    ``size_hint`` (optional, an upper bound on the row count the caller
    already knows) makes the partition count SCALE-ADAPTIVE (guide §2:
    derive partitioning from input size, not a constant): a corpus of a few
    thousand rows range-partitions into 1 partition — skipping the range
    sampler's full extra pass over the input and the 32-near-empty-task
    stages — while anything ≥ ~250k rows/partition-worth keeps the full
    two-phase parallel path. The assigned ids are partitioning-independent
    (numbering is key-order only — pinned by tests against the
    single-window oracle), so the hint changes cost, never values.
    """
    # Range partition gives a deterministic global order across partitions.
    parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    if size_hint is not None:
        parts = max(1, min(parts, 1 + size_hint // 250_000))
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in key_cols])
    ranged = ranged.sortWithinPartitions(*key_cols)

    # JVM-only two-phase numbering (no Python RDD — every row would be
    # pickled twice on the 100 TB indexing hot path otherwise):
    # monotonically_increasing_id() carries the record number WITHIN each
    # partition in its lower 33 bits, computed in the same stage as the
    # sort, so the local index needs no window (and no extra shuffle).
    local_mask = (1 << 33) - 1
    with_mid = ranged.select(
        F.spark_partition_id().alias("_pid"),
        F.monotonically_increasing_id().bitwiseAND(F.lit(local_mask)).alias("_local"),
        *df.columns,
    )
    # MATERIALIZE before branching: RangePartitioner's sample seed includes
    # the RDD id, so if the counts branch and the join branch each evaluated
    # the exchange independently they could see DIFFERENT partition bounds —
    # offsets computed for one layout applied to another yields duplicate /
    # gapped ids (observed at 10k rows: max id 10005 over 10000 rows). The
    # eager local checkpoint pins one layout for both branches; it also
    # stands in for the write stage this numbering precedes in the reference
    # (writer.rs:120-126 assigns ids while materializing parquet).
    from knowledge_graph_spark.persist import tracked_local_checkpoint

    with_mid = tracked_local_checkpoint(with_mid)
    # Per-partition counts are one row per partition — the exclusive prefix
    # sum over them is a tiny single-partition window, then broadcast-joined
    # back so the big side never moves again.
    counts = with_mid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        (F.coalesce(F.sum("_n").over(w_off), F.lit(0)) + F.lit(start)).alias("_off"),
    )
    out = with_mid.join(F.broadcast(offsets), "_pid").withColumn(
        id_col, (F.col("_off") + F.col("_local")).cast("long")
    )
    return out.select(id_col, *[c for c in df.columns])


def assign_dense_ids_window(
    df: DataFrame, key_cols: list[str], id_col: str = "id", start: int = 1
) -> DataFrame:
    """Single-window variant (fine below ~10M rows; used by unit tests as the
    semantics oracle for ``assign_dense_ids``)."""
    w = Window.orderBy(*[F.col(c) for c in key_cols])
    return df.withColumn(id_col, F.row_number().over(w) + F.lit(start - 1)).select(
        id_col, *df.columns
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Range-partition + sort the data by ``sort_cols`` before writing — the
    data-layout half of predicate pushdown.

    Parquet footers carry per-file and per-row-group min/max stats; readers
    skip whole files/row groups whose range cannot match a filter. Stats are
    only selective when the data is clustered: after this write, each file
    owns a disjoint key range, so a point or range filter on the sort key
    touches O(1) files instead of all of them. At 100 TB this is the
    difference between a metadata-only planning step and a full scan — the
    same reason the reference keeps one parquet file per table/pair sorted by
    write order (writer.rs:107-298); here the layout is explicit and keyed.
    """
    parts = num_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    out = df.repartitionByRange(parts, *[F.col(c) for c in sort_cols])
    out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").option("compression", "snappy").parquet(path)
