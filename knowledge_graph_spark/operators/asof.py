"""As-of (nearest-earlier) join — a union + running-window composition.

Spark has no ASOF JOIN operator (DuckDB/QuestDB/kdb expose one natively; the
oracle uses DuckDB's). The idiomatic distributed form used here:

1. tag left rows (side=1) and right rows (side=0),
2. union them — right rows carry their payload, left rows carry nulls,
3. ONE shuffle into (key)-partitioned windows ordered by (ts, side),
4. a running ``last(payload, ignorenulls=True)`` carries the latest right
   payload forward onto every subsequent row,
5. keep only left rows.

Cost = one shuffle of |L|+|R| rows and one sort per partition — no join
explosion and no quadratic range-join blowup, and it scales to any key
cardinality because nothing is ever broadcast or collected. Equal
timestamps match (``right.ts <= left.ts``): right sorts before left within
a timestamp via the side tag — the same tie rule as DuckDB's
``ASOF LEFT JOIN ON l.ts >= r.ts``.

Contract: ``right`` must be unique per (key, ts) — pre-aggregate duplicates
(e.g. ``max_by``) or the carried payload at a tied timestamp is undefined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    carry: tuple[str, ...] = ("event_id", "ts", "value"),
    prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[ts_col] <= left[ts_col]`` for the same ``key`` (nulls when no
    prior right row exists). ``carry`` lists right columns to attach, each
    emitted as ``prefix + name``."""
    r = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(prefix + c) for c in carry],
    )
    u = left.withColumn("_side", F.lit(1)).unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carry:
        u = u.withColumn(prefix + c, F.last(prefix + c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")


# DuckDB twin: the engine-native ASOF JOIN (same >= tie rule as the window
# composition above); the right side is deduped per (user_id, ts) with
# max/arg_max so tied timestamps carry a deterministic payload.
ASOF_LAST_CLICK_SQL = """
WITH purchases AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, max(event_id) AS event_id, arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT l.event_id, l.ts, l.user_id, l.value,
       r.event_id AS matched_event_id, r.ts AS matched_ts, r.value AS matched_value
FROM purchases l
ASOF LEFT JOIN clicks r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""
