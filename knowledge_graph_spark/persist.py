"""Persisted-block hygiene for multi-pass operators.

Operators that cache or checkpoint intermediates (iterative graph loops,
inverted indexes scanned by several subplans) must not leak those blocks: in
a long-lived session (service daemon, bench loop) leaked blocks accumulate
until the block manager starts evicting and repeat calls degrade ~2×.

Pattern: snapshot persisted RDD ids on entry, materialize the final result
to its own checkpoint, release everything added since the snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set:
    """Ids of every RDD currently persisted in the JVM (caches + local
    checkpoints)."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def release_persisted_since(spark: SparkSession, before: set, keep: set) -> None:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in set(jmap.keySet().toArray()) - before - keep:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def pin_small(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint for a BOUNDED-size frame that several subplans
    re-read (a paged result, a top-k, a per-doc fingerprint table): without
    the pin every consumer re-executes the whole upstream DAG. Pass-through
    in plan-capture mode so .explain shows the live computation."""
    import os

    if os.environ.get("KG_PLAN_CAPTURE"):
        return df
    return df.localCheckpoint(eager=True)


def checkpoint_and_release(spark: SparkSession, before: set, result: DataFrame) -> DataFrame:
    """Materialize `result` to its own checkpoint, then drop every block the
    caller pinned along the way (its consumer only ever needs the result)."""
    import os

    if os.environ.get("KG_PLAN_CAPTURE"):
        # plan-capture mode (scripts/capture_plans.py only): return the live
        # plan so .explain shows the computation, not a checkpoint scan
        return result
    pre_final = persistent_rdd_ids(spark)
    out = result.localCheckpoint(eager=True)
    keep = persistent_rdd_ids(spark) - pre_final
    release_persisted_since(spark, before, keep)
    return out
