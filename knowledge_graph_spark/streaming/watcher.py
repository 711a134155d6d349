"""Structured Streaming analog of the reference's real-time loop.

Reference mapping (SURVEY §2.10):
- ST1 FS watcher with processing-time debounce: 3000 ms windows, ≤8192
  events/window, per-project coalescing (http-server-desktop/src/watcher.rs:
  23-28,66-69) → file-source stream of change events + tumbling ``window()``
  aggregation per project; the cap is a ``slice`` on the collected path set.
- ST4 FileChanges derivation {changed, deleted} per window.
- ST5 diff apply under ``foreachBatch`` → incremental.apply_file_changes.
- ST6 typed lifecycle events (event-bus/src/lib.rs:44-53) → an events sink
  (memory/console/kafka — any Spark sink).
- ST2 periodic forced reindex → ``trigger(processingTime=...)`` scheduling is
  the driver's choice; exposed via the ``trigger`` arg.

The reference has no event-time semantics (no watermarks); we use event-time
windows + a watermark anyway — at 100 TB the event source is a distributed
log, and processing-time grouping is not reproducible there. A 0-delay
watermark reproduces the reference's behavior for in-order event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FILE_EVENT_SCHEMA = StructType(
    [
        StructField("project", StringType(), False),
        StructField("path", StringType(), False),
        StructField("change_type", StringType(), False),  # created|modified|deleted
        StructField("event_time", TimestampType(), False),
    ]
)

MAX_EVENTS_PER_WINDOW = 8192  # watcher.rs:26
DEBOUNCE_WINDOW = "3 seconds"  # watcher.rs:25
# watcher.rs:27 excluded dirs — events under these never trigger a reindex
EXCLUDED_DIR_SEGMENTS = (".git", "node_modules", "target", ".venv", "__pycache__")


def watch_event_stream(
    spark: SparkSession, watch_dir: str, clean_source: str | None = None
) -> DataFrame:
    """File-source stream of change events (one JSON object per line).

    ``clean_source="delete"`` removes spool files once their micro-batch
    commits — the long-lived server's watcher would otherwise accumulate
    one file per poll forever AND re-list the whole dir every trigger
    (listing cost grows linearly with server uptime). Default off: batch
    replays (tests, availableNow reruns) need the files to persist."""
    reader = spark.readStream.schema(FILE_EVENT_SCHEMA).option("maxFilesPerTrigger", 64)
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
    return reader.json(watch_dir)


def debounced_jobs(
    events: DataFrame,
    window: str = DEBOUNCE_WINDOW,
    max_events: int = MAX_EVENTS_PER_WINDOW,
    watermark: str = "0 seconds",
) -> DataFrame:
    """ST1: coalesce bursts into one reindex job per (project, window).

    Output: project, window_start/end, n_events (pre-cap), changed_paths and
    deleted_paths (each capped — the reference drops events past 8192/window).

    Events under excluded dirs (editor caches, VCS internals — watcher.rs:27)
    are dropped before windowing so a .git churn burst never schedules a job.
    """
    for seg in EXCLUDED_DIR_SEGMENTS:
        # four forms: inside the dir, dir at path root, the dir entry itself
        # (delete/rename events arrive for '.git' or 'src/node_modules' proper)
        events = events.filter(
            ~F.col("path").contains(f"/{seg}/")
            & ~F.col("path").startswith(f"{seg}/")
            & ~F.col("path").endswith(f"/{seg}")
            & (F.col("path") != seg)
        )
    w = events.withWatermark("event_time", watermark).groupBy(
        F.col("project"), F.window("event_time", window).alias("win")
    )
    agg = w.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.slice(
            F.sort_array(
                F.collect_set(
                    F.when(F.col("change_type") != "deleted", F.col("path"))
                )
            ),
            1,
            max_events,
        ).alias("changed_paths"),
        F.slice(
            F.sort_array(
                F.collect_set(
                    F.when(F.col("change_type") == "deleted", F.col("path"))
                )
            ),
            1,
            max_events,
        ).alias("deleted_paths"),
    )
    return agg.select(
        "project",
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "n_events",
        "changed_paths",
        "deleted_paths",
    )


def run_debounced_reindex(
    spark: SparkSession,
    watch_dir: str,
    on_job,
    query_name: str = "kg-watcher",
    available_now: bool = False,
    checkpoint_dir: str | None = None,
):
    """ST5: drive the debounced job stream through ``foreachBatch``.

    ``on_job(project, changed_paths, deleted_paths)`` is invoked per job row —
    wire it to ``incremental.apply_file_changes`` + ``KnowledgeGraph.write``
    for the full reindex loop, exactly the reference's queue worker
    (queue/worker.rs) minus the hand-rolled queue: Structured Streaming's
    exactly-once foreachBatch replaces it.
    """
    jobs = debounced_jobs(watch_event_stream(spark, watch_dir))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():
            on_job(row["project"], list(row["changed_paths"]), list(row["deleted_paths"]))

    # update mode: a window emits as soon as its content changes, like the
    # reference's fire-after-quiet debounce — append mode would hold the
    # trailing window until later events advance the watermark past it.
    # Re-emission of a window (more events arrived) re-runs the job; reindex
    # is idempotent (M4 overwrite), matching the reference's periodic-reindex
    # tolerance. Consumers needing exactly-once keep the last job per
    # (project, window_start).
    writer = jobs.writeStream.outputMode("update").foreachBatch(handle).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=DEBOUNCE_WINDOW)
    return writer.start()


# -- ST3 job-queue priorities + cancellation ---------------------------------
# queue/job.rs:12-17: Low=0 < Normal=1 < High=2 (Normal is the default).
PRIORITY_LOW, PRIORITY_NORMAL, PRIORITY_HIGH = 0, 1, 2

# queue/job.rs:48-52 — the three job variants routed to workspace queues.
JOB_INDEX_WORKSPACE = "IndexWorkspaceFolder"
JOB_REINDEX_WORKSPACE = "ReindexWorkspaceFolderWithWatchedFiles"
JOB_REINDEX_PROJECT = "ReindexProjectFolderWithWatchedFiles"


def prioritized_queue(log: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Apply the reference's supersede rule to a dispatch log.

    dispatch.rs:88-91: a High-priority dispatch first sends
    ``CancelJobsOfType(job_type)`` to the workspace's queue;
    worker.rs:122-138 then drops every still-queued job of that type
    (whatever its own priority). Declaratively: a job is **Cancelled** iff
    a High-priority job with the same ``(project, job_type)`` appears later
    in the dispatch order, else **Pending**. Already-running jobs are not in
    the worker's queue and hence not in this frame — the rule only ever
    sees queued work, exactly like the reference.

    One shuffle on the queue key ``(project, job_type)``; the "is any later
    job High?" existence test is a single descending-ordered window max, so
    the operator stays linear at any log size.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("project", "job_type")
        .orderBy(F.col(seq_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    later_high = F.max(
        F.when(F.col("priority") == PRIORITY_HIGH, F.col(seq_col))
    ).over(w)
    return log.withColumn(
        "status",
        F.when(later_high.isNotNull(), F.lit("Cancelled")).otherwise(F.lit("Pending")),
    )


def queue_lifecycle_events(log_with_status: DataFrame) -> DataFrame:
    """JobStatus vocabulary rows (job.rs:131-138): one event per queue
    decision — Cancelled jobs surface to the event bus like the reference's
    'Cancelling job {} ({})' lifecycle logging (worker.rs:126-133)."""
    return log_with_status.select(
        F.concat(F.lit("Job"), F.col("status")).alias("event_type"),
        "project",
        "job_type",
        F.col("priority"),
        F.col("seq").alias("at_seq"),
    )


def lifecycle_events(jobs: DataFrame) -> DataFrame:
    """ST6: typed lifecycle event rows from job aggregates (the event-bus
    vocabulary: {Project} × {Indexing,Reindexing} × {Started,Completed})."""
    return jobs.select(
        F.lit("ProjectReindexingStarted").alias("event_type"),
        F.col("project"),
        F.col("window_start").alias("at"),
        F.col("n_events"),
    )


def streaming_event_rollup(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of analytics.event_hourly_rollup: the same hourly
    per-type aggregate as an event-time windowed stream over the events
    parquet. With ``availableNow`` the final result must equal the batch
    rollup — tests assert that equivalence (exactly-once + watermark sanity).
    """
    # The file-stream source requires a directory; expose the single events
    # parquet through a scratch dir of symlinks (sf_dir holds other tables
    # with different schemas, so it cannot be the source itself).
    import hashlib
    import os
    import tempfile

    link_dir = os.path.join(
        tempfile.gettempdir(),
        "kg-stream-events-" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)

    # raw schema: ts arrives as epoch-nanos long (see io.read_table)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(link_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # current Spark surfaces TIMESTAMP(NANOS) as NTZ; align with
        # io.read_table's session-UTC TIMESTAMP normalization
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("string")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return agg
