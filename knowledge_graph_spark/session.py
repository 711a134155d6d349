"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
configuration names are what you would set on a 1000-executor cluster —
nothing here is local-mode-specific except the master URL.

Scale rationale (100 TB target):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces hand-tuned partition counts when data volume varies 1000x.
- ``autoBroadcastJoinThreshold`` left at default (10 MB) — the graph's
  dimension-like tables (directories, small node sets) broadcast; the
  query library additionally broadcasts explicitly where the reference
  keys a hash-map build side (SURVEY J7).
- Arrow execution on: every pandas_udf / mapInPandas interchange is
  Arrow-batched (SURVEY §2.11 extractors, beyond-parity ops).
- UTC session timezone: deterministic timestamp semantics vs the DuckDB
  correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "knowledge-graph-spark", master: str | None = None) -> SparkSession:
    cpus = default_parallelism()
    # local mode runs driver+executors in one JVM; the 1g default heap evicts
    # localCheckpoint blocks under load ("Block rdd_N does not exist") and
    # thrashes GC. Sized for the 128 GiB test box; harmless on a cluster
    # where spark-submit overrides it.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # by default AQE is DISABLED for any plan under a cache() —
        # canChangeCachedPlanOutputPartitioning=false pins the cached
        # layout, so the graph build's cached intermediates ran every
        # shuffle at full width (32 near-empty tasks per stage on small
        # corpora). Allowing AQE to re-plan cached output costs nothing
        # at scale (coalescing only merges sub-target partitions) and
        # collapses the small-corpus indexing fixed overhead.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # The events table is written as TIMESTAMP(NANOS) parquet. Depending
        # on the Spark build it surfaces as epoch-nanos long (this legacy
        # conf, older 4.x) or TIMESTAMP_NTZ (current 4.1, conf ignored);
        # io.read_table normalizes both to a session-UTC TIMESTAMP.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 128 MB input splits: at 100 TB this yields ~800k tasks, the right
        # granularity for a 1000-executor cluster; harmless locally.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # Long sessions (the 84-query bench, the full pytest run) compile
        # thousands of whole-stage-codegen classes; the JVM's default
        # 240 MB reserved code cache fills mid-session, HotSpot stops JIT
        # compilation, and every later query runs interpreted (the observed
        # uniform 2-4x late-session slowdown). 1 GB + flushing keeps the
        # JIT alive for the whole session; on a cluster the same flag
        # belongs in spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        # status-store listeners retain per-execution plan graphs and task
        # metrics for a UI we run disabled; trim the retention so hundreds
        # of queries don't accrete driver heap
        .config("spark.sql.ui.retainedExecutions", "20")
        # env-tunable so profiling runs (scripts/profile_jobs.py) can read
        # full job attribution from the REST API; default stays trimmed
        .config("spark.ui.retainedJobs", os.environ.get("SPARK_GRAFT_RETAINED_JOBS", "100"))
        .config("spark.ui.retainedStages", os.environ.get("SPARK_GRAFT_RETAINED_JOBS", "100"))
        .config("spark.ui.retainedTasks", "2000")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
