"""Range / interval join — bucketized equi-join composition.

Spark has no interval-join operator: a raw ``p.ts BETWEEN i.start AND i.end``
predicate plans as BroadcastNestedLoopJoin (O(|P|·|I|) per key — unusable at
100 TB). The distributed form used here is time bucketing:

1. pick a bucket width B;
2. each interval row is exploded to one row per covered bucket
   (``sequence(floor(start/B), floor(end/B))``);
3. points compute their single bucket ``floor(ts/B)``;
4. equi-join on (key, bucket) — hash join, AQE-broadcastable, skew-splittable
   like any other equi-join;
5. re-check the exact containment predicate post-join.

Each (point, interval) pair can meet in at most ONE bucket (the point's), so
the composition introduces no duplicates. Cost = |I| · avg_buckets_per_interval
extra rows on the build side; pick B near the typical interval length so the
expansion factor stays small. Long-tail intervals fatten single keys — at
scale, split them by capping ``max_buckets_per_interval`` upstream or rely on
AQE skew-join handling of the (key, bucket) hash join.

This is the general form of the "sessions containing event" / IP-range lookup
/ effective-dated dimension join family of training-pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    point_ts: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join each point row to every interval row of the same ``key``
    with ``start <= ts <= end`` (inclusive both ends, matching SQL BETWEEN).
    All point and interval columns survive; duplicate-named columns must be
    disambiguated by the caller beforehand.

    ``max_buckets_per_interval`` clamps the per-row explode: one corrupt
    interval (epoch-0 start next to a current-time end) would otherwise
    expand to millions of rows or trip Spark's sequence-length limit and
    fail the whole job. Points falling beyond ``start + cap·bucket_seconds``
    of a clamped interval are not matched — pick the cap so that legitimate
    intervals stay under it."""
    b = F.lit(int(bucket_seconds))
    start_bucket = F.floor(F.col(start_col).cast("long") / b)
    end_bucket = F.least(
        F.floor(F.col(end_col).cast("long") / b),
        start_bucket + F.lit(int(max_buckets_per_interval) - 1),
    )
    i = intervals.withColumn("_bucket", F.explode(F.sequence(start_bucket, end_bucket)))
    p = points.withColumn("_bucket", F.floor(F.col(point_ts).cast("long") / b))
    joined = p.join(i, [key, "_bucket"]).filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")


# DuckDB twin of the session-attribution query entry: purchases joined into
# their containing 30-min-gap session via a plain containment join — the
# oracle engine is free to nested-loop it at sf0.01; the Spark side must not.
SESSION_INTERVAL_ATTRIBUTION_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 30 * 60
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
ids AS (
  -- CAST: DuckDB SUM(int) is HUGEINT → float64 in pandas; Spark emits BIGINT
  SELECT user_id, ts,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
  FROM ids GROUP BY user_id, session_seq
)
SELECT p.event_id, p.user_id, p.ts, s.session_seq, s.n_events
FROM events p
JOIN sessions s ON p.user_id = s.user_id AND p.ts BETWEEN s.session_start AND s.session_end
WHERE p.event_type = 'purchase'
ORDER BY p.event_id, s.session_seq
"""
