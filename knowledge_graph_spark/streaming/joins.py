"""Stream-stream interval join — watermark-bounded containment matching.

The streaming twin of ``operators.range_join.interval_join``: match point
events against interval rows (sessions, validity windows) as BOTH arrive on
streams. Spark's stream-stream join keeps each side in state until the
watermark proves no future match is possible; the containment predicate
(``start <= ts <= end``) relates the two event-time columns, which is exactly
the time-range condition Spark needs to derive state expiry — without it the
join state grows forever.

At 100 TB-scale ingest the state store is the resource to watch: the
watermark delay bounds it to (events within the delay) per side, and the key
equality clause partitions state by key, so sizing follows the hot-key
distribution, not total throughput (same skew story as any keyed join —
AQE does not apply to streaming state, so salt hot keys upstream if needed).

The reference has no streaming joins at all (SURVEY §2.10: its incremental
loop is processing-time debounce only); this is north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    point_ts: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join streaming ``points`` to streaming ``intervals`` of the same
    ``key`` with ``start <= ts <= end`` (inclusive, matching the batch
    operator and SQL BETWEEN). Both inputs must be streaming DataFrames with
    event-time columns; ``watermark`` bounds lateness AND join state."""
    p = points.withWatermark(point_ts, watermark).alias("p")
    i = intervals.withWatermark(end_col, watermark).alias("i")
    cond = (
        (F.col(f"p.{key}") == F.col(f"i.{key}"))
        & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_col}"))
        & (F.col(f"p.{point_ts}") <= F.col(f"i.{end_col}"))
    )
    others = [c for c in intervals.columns if c != key]
    return p.join(i, cond, "inner").select("p.*", *[F.col(f"i.{c}") for c in others])
