"""Persisted-block hygiene for multi-pass operators.

Operators that cache or checkpoint intermediates (iterative graph loops,
inverted indexes scanned by several subplans) must not leak those blocks: in
a long-lived session (service daemon, bench loop) leaked blocks accumulate
until the block manager starts evicting and repeat calls degrade ~2×.

Pattern: snapshot persisted RDD ids on entry, materialize the final result
to its own checkpoint, release everything added since the snapshot.
"""

from __future__ import annotations

import contextlib
import threading

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


def release_ids(spark: SparkSession, ids: set) -> None:
    """Unpersist exactly the given RDD ids (already-gone ids are skipped)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


# -- scoped pin tracking (r9, ADVICE r8) -------------------------------------
# A long-running server thread (the live watcher's reindex cycle) must
# release the blocks ITS work pinned without sweeping blocks that concurrent
# query threads on the same SparkSession pinned mid-query: localCheckpoint
# truncates lineage, so a foreign release fails those queries with
# missing-block errors instead of a recompute. Thread-locals don't work here
# (the build pipeline pins from ThreadPoolExecutor workers), so trackers are
# process-global: every library-internal eager checkpoint registers the RDD
# ids it just created with every active tracker. A tracker therefore still
# over-collects if an UNRELATED thread happens to run a tracked checkpoint
# concurrently — but only checkpoint-sized windows race (microseconds), not
# the whole multi-minute cycle the r8 diff-sweep exposed.
_TRACKERS: list[set] = []
_TRACKER_LOCK = threading.Lock()


@contextlib.contextmanager
def track_pins():
    """Collect the RDD ids of every tracked checkpoint created while active.
    Yields the (mutable) id set; release with :func:`release_ids`."""
    ids: set = set()
    with _TRACKER_LOCK:
        _TRACKERS.append(ids)
    try:
        yield ids
    finally:
        with _TRACKER_LOCK:
            _TRACKERS.remove(ids)


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` that registers the new block ids
    with any active :func:`track_pins` scope. The before/after snapshot pair
    is only taken while a tracker is active — zero overhead otherwise."""
    with _TRACKER_LOCK:
        tracking = bool(_TRACKERS)
    if not tracking:
        return df.localCheckpoint(eager=True)
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    new = persistent_rdd_ids(spark) - before
    with _TRACKER_LOCK:
        for s in _TRACKERS:
            s.update(new)
    return out


def pin_small(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint for a BOUNDED-size frame that several subplans
    re-read (a paged result, a top-k, a per-doc fingerprint table): without
    the pin every consumer re-executes the whole upstream DAG. Pass-through
    in plan-capture mode so .explain shows the live computation."""
    import os

    if os.environ.get("KG_PLAN_CAPTURE"):
        return df
    return tracked_local_checkpoint(df)


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
