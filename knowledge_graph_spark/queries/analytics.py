"""Relational analytics over the base tables — the aggregation / join / sort
operator inventory (SURVEY §2.3-2.6) exercised at TPC-H query shapes, plus the
event-stream rollups that back the streaming layer's batch equivalence tests.

These are also the bench headliners: each query is the plan shape that
dominates a 100 TB run (wide scan + partial agg; filtered dim broadcast into
fact join; multi-way join with two small broadcast dims; left-outer + two-level
agg; anti join).

Float determinism contract (shared with the DuckDB oracles): every monetary
aggregate is computed as ``sum(cast(x as decimal(18,4)))`` — exact, order-
insensitive — and only the final scalar is cast back to double. Averages are
exact-sum / count. This makes value hashes engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _dec(c: str):
    return F.col(c).cast(DEC)


def _dsum(expr) -> F.Column:
    return F.sum(expr)


def pricing_summary(li: DataFrame, cutoff: str = "2000-01-01") -> DataFrame:
    """TPC-H Q1 shape: full-scan partial aggregation (A6, map-side combine).

    At scale: one wide scan, hash partial agg per partition, tiny shuffle of
    (flag, status) groups — the canonical 'agg pushed to the data' plan.
    """
    disc_price = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(
        "decimal(26,8)"
    )
    charge = (
        _dec("l_extendedprice")
        * (F.lit(1).cast(DEC) - _dec("l_discount"))
        * (F.lit(1).cast(DEC) + _dec("l_tax"))
    ).cast("decimal(32,12)")
    g = (
        li.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("string").cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("string").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("string").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("string").cast("double").alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return g.orderBy("l_returnflag", "l_linestatus")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(26,8))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(32,12))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_revenue_orders(
    cust: DataFrame, orders: DataFrame, li: DataFrame, segment: str = "BUILDING", k: int = 20
) -> DataFrame:
    """TPC-H Q3 shape: filtered dim → broadcast into fact joins → top-k (J1, O2).

    ``F.broadcast`` pins the build side the way the reference's in-memory
    definition_map lookup join does (SURVEY J7); AQE would usually pick this
    anyway, we make it load-bearing.
    """
    c = cust.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    revenue = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(
        "decimal(26,8)"
    )
    # Broadcast only the filtered customer dim; orders⋈lineitem stays a
    # shuffle join on the (already co-partitionable) order key — the side
    # that scales with the fact data must never be broadcast.
    oc = orders.join(F.broadcast(c), orders.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("string").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(k)
    )


TOP_REVENUE_ORDERS_SQL = """
SELECT l_orderkey AS o_orderkey, o_orderdate,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(26,8))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT {k}
"""


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    cust: DataFrame,
    orders: DataFrame,
    li: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: multi-way join, two broadcast dims, co-located customer
    and supplier nation check (J1 chain; the n_nationkey equality is the
    reference's 'same-file' co-location predicate analog)."""
    revenue = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(
        "decimal(26,8)"
    )
    r = region.filter(F.col("r_name") == region_name)
    dim = F.broadcast(
        nation.join(r, nation.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(dim, F.col("s_nationkey") == dim.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("string").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


REGIONAL_REVENUE_SQL = """
SELECT n_name,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(26,8))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{region_name}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def customer_order_distribution(cust: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: left outer join + two-level aggregation (J4 at scale:
    the one shuffle-heavy outer join in the inventory; AQE handles the c_count
    skew at 0)."""
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) cc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def parts_not_recently_shipped(
    part: DataFrame, li: DataFrame, since: str = "2001-01-01"
) -> DataFrame:
    """Left-anti join — the reference's incremental 'deleted definitions' diff
    semantics (J10, mutation/changes.rs:223-288) as a relational operator:
    rows of the old set with no match in the (filtered) new set. The shipdate
    filter is pushed into the lineitem scan before the anti join."""
    recent = li.filter(F.col("l_shipdate") >= F.lit(since).cast("timestamp")).select(
        "l_partkey"
    ).distinct()
    return (
        part.join(recent, part.p_partkey == recent.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


PARTS_NOT_RECENTLY_SHIPPED_SQL = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '{since} 00:00:00'
)
ORDER BY p_partkey
"""


def supplier_nation_rollup(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Broadcast dim join + group-by rollup (A6: files-by-language analog)."""
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).cast("string").cast("double").alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


SUPPLIER_NATION_ROLLUP_SQL = """
SELECT n_name, COUNT(*) AS n_suppliers,
  CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Event rollups (batch equivalents of the streaming layer; ST1 debounce window
# analog = processing-time tumbling window → here event-time tumbling window)
# ---------------------------------------------------------------------------


def event_hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type: count + exact sum.

    Streaming twin: ``streaming.watcher.debounced_stream`` uses the same
    ``window()`` aggregation under a watermark; this batch form is the
    correctness oracle for it (same groupBy keys, same aggregates).
    """
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("string").cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


EVENT_HOURLY_ROLLUP_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def event_type_stats(events: DataFrame) -> DataFrame:
    """Per-type global stats incl. JSON prop extraction (P10 param/JSON analog:
    get_json_object stays JVM-side; props are `{"k": int}`)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


EVENT_TYPE_STATS_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(MIN(value) AS DOUBLE) AS min_value,
  CAST(MAX(value) AS DOUBLE) AS max_value,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Window-function operators (beyond reference parity — SURVEY §2.12 notes the
# reference has none; Spark gives them natively and a 100 TB training-data
# pipeline needs them for sessionization and per-group sampling)
# ---------------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: per-user sessions split at inactivity gaps.

    lag + cumulative-sum-of-boundaries — two window passes over one shuffle
    on user_id. The streaming twin (streaming/sessions.py) holds the same
    semantics as a custom stateful operator; this batch form is its oracle.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.lag("ts").over(w)
    new_session = (
        F.col("ts").cast("long") - F.coalesce(gap.cast("long"), F.lit(0))
        > gap_minutes * 60
    ) | gap.isNull()
    with_ids = events.withColumn(
        "session_seq", F.sum(new_session.cast("int")).over(w)
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("string").cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > {gap_minutes} * 60
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
ids AS (
  -- CAST: DuckDB SUM(int) yields HUGEINT, which pandas renders as float64;
  -- Spark's sum(int) is BIGINT. The driver hashes rendered values, so the
  -- types must agree ("3" vs "3.0").
  SELECT user_id, ts, value,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
  min(ts) AS session_start,
  max(ts) AS session_end,
  count(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM ids GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def top_events_per_type(events: DataFrame, k: int = 5) -> DataFrame:
    """Top-k rows per group via ranking window — per-group sampling for
    training-data curation (dedup keeps `keeper`, this keeps `top-k`)."""
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("event_type", "rk", "event_id", "user_id", F.col("value").alias("value"))
        .orderBy("event_type", "rk")
    )


TOP_EVENTS_PER_TYPE_SQL = """
SELECT event_type, rk, event_id, user_id, value FROM (
  SELECT event_type, event_id, user_id, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
  FROM events
) t WHERE rk <= {k}
ORDER BY event_type, rk
"""


def user_value_running_total(events: DataFrame, limit_users: int = 20) -> DataFrame:
    """Per-user running total over event time (frame-bounded analytic
    window); decimal-exact cumulative sums so both engines agree."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        events.filter(F.col("user_id") < limit_users)
        .withColumn(
            "running_value",
            F.sum(_dec("value")).over(w).cast("string").cast("double"),
        )
        .select("user_id", "event_id", "ts", "running_value")
        .orderBy("user_id", "ts", "event_id")
    )
    return out


USER_VALUE_RUNNING_TOTAL_SQL = """
SELECT user_id, event_id, ts,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
    AS running_value
FROM events
WHERE user_id < {limit_users}
ORDER BY user_id, ts, event_id
"""


def order_priority_rollup(orders: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP aggregation (status → priority → grand total).

    Beyond reference parity: SURVEY §2.12 records that the reference has no
    grouping sets / cube / rollup anywhere — Spark's ``rollup`` gives the
    whole lattice in ONE pass (partial aggs reused across grouping sets),
    where the naive alternative is three scans + a union. At 100 TB that is
    the difference between one shuffle and three.

    Super-aggregate rows surface their grouped-out keys as NULL in both
    engines; they are coalesced to the sentinel 'ALL' so ordering and value
    hashing are engine-independent.
    """
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("string").cast("double").alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "sum_total",
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


ORDER_PRIORITY_ROLLUP_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_total
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def approx_user_counts(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Approximate distinct users per event type (HyperLogLog++) next to the
    exact count.

    The scale operator for cardinality at 100 TB: ``approx_count_distinct``
    aggregates a fixed-size sketch per partition (no shuffle of the distinct
    key set), where exact COUNT(DISTINCT) shuffles every distinct value.
    Rows-only for the driver (sketches are implementation-defined across
    engines); pytest bounds the relative error against the exact column.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


def small_quantity_revenue(li: DataFrame, part: DataFrame, name_word: str = "ring") -> DataFrame:
    """TPC-H Q17 shape: filter facts against a PER-GROUP aggregate (orders of
    unusually small quantity for their part), then aggregate the survivors.

    The plan family this adds: aggregate-subquery join — pre-aggregate the
    fact table per key (map-side combinable, output is |parts| rows), join
    the tiny aggregate back onto the facts, filter, final agg. At 100 TB the
    per-part average table is dimension-sized, so the join broadcasts; the
    fact table is scanned twice but shuffled at most once (the pre-agg) —
    the naive correlated-subquery form would re-scan per row.

    Threshold arithmetic is double computed from an exact decimal sum and an
    exact count — bit-identical across engines, so boundary rows agree.
    """
    avg_q = (
        li.groupBy("l_partkey")
        .agg(
            (
                F.sum(_dec("l_quantity")).cast("string").cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty")
        )
    )
    p = part.filter(F.col("p_name").contains(name_word)).select("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(_dec("l_extendedprice")).cast("string").cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH avg_q AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_q USING (l_partkey)
WHERE contains(p_name, '{name_word}')
  AND l_quantity < 0.2 * avg_qty
"""
