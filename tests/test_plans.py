"""Plan-shape regression tests: the library's point lookups must keep filter
pushdown into the parquet scans and broadcast-hash joins (no sort-merge) on
the materialized graph — the properties that make them O(probe) at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def parquet_kg(spark, tmp_path_factory):
    from knowledge_graph_spark.adapters import tpch

    out = str(tmp_path_factory.mktemp("plan-graph"))
    return tpch.build_and_write(spark, SF_SMALL, out)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pushed_scan_count(plan: str) -> int:
    return sum(
        1
        for line in plan.split("\n")
        if "PushedFilters: [" in line and "PushedFilters: []" not in line
    )


def test_point_lookup_pushdown_and_broadcast(parquet_kg):
    from knowledge_graph_spark.queries import library as L

    for df, min_pushed in [
        (L.file_definitions(parquet_kg, "orders/o1.py"), 2),
        (L.get_references(parquet_kg, "red_bolt"), 2),
        (L.import_usage(parquet_kg, ["standard"]), 2),
        (L.definition_at(parquet_kg, "orders/o1.py", 1, 3), 3),
        (L.callers_of(parquet_kg, "red_bolt"), 2),
    ]:
        plan = _plan(df)
        assert _pushed_scan_count(plan) >= min_pushed, plan[:1500]
        assert "BroadcastHashJoin" in plan, plan[:1500]
        assert "SortMergeJoin" not in plan, plan[:1500]


def test_search_union_pushes_contains_to_every_scan(parquet_kg):
    from knowledge_graph_spark.queries import library as L

    plan = _plan(L.search_nodes(parquet_kg, "ro"))
    # all four node-table scans carry the Contains filter
    assert plan.count("Contains(lower(") >= 4, plan[:2000]


def test_column_pruning_on_projection(parquet_kg):
    plan = _plan(parquet_kg.definitions.select("fqn", "name"))
    scan_lines = [l for l in plan.split("\n") if "FileScan parquet" in l]
    assert scan_lines and "primary_start_byte" not in scan_lines[0], scan_lines


def _exchange_count(plan: str) -> int:
    # physical shuffle boundaries only (not broadcast exchanges)
    return sum(1 for line in plan.split("\n") if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line)


def test_asof_join_single_shuffle(spark):
    """The as-of composition must cost ONE hash shuffle (the window) — if a
    join sneaks in, the plan regresses to range-join territory."""
    from knowledge_graph_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 1.0)], "user_id long, ts long, value double")
    right = spark.createDataFrame(
        [(1, 5, 2, 2.0)], "user_id long, ts long, event_id long, value double"
    )
    plan = _plan(asof_join(left, right))
    assert _exchange_count(plan) == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_stratified_sample_single_shuffle(spark):
    from knowledge_graph_spark.beyond.sampling import stratified_sample
    from knowledge_graph_spark.io import read_table

    df = stratified_sample(read_table(spark, SF_SMALL, "documents"), k=5)
    plan = _plan(df)
    # one shuffle for the per-stratum window; the final orderBy is a range
    # exchange over the ≤ k·|strata| survivors — no join, no extra hash pass
    assert _exchange_count(plan) <= 2, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_pagerank_adjacency_single_exchange(spark):
    """Dedup + 1/out-degree weighting must ride ONE hash exchange (src
    clustering satisfies both window specs) — the property that keeps every
    pagerank iteration shuffle-reuse-able at 100 TB."""
    from knowledge_graph_spark.graph.algorithms import _weighted_adjacency

    e = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    plan = _plan(_weighted_adjacency(e))
    assert _exchange_count(plan) == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]

    rows = {(r.src, r.dst): r.w for r in _weighted_adjacency(e).collect()}
    assert rows == {(1, 2): 0.5, (1, 3): 0.5, (2, 3): 1.0}


def test_deterministic_sample_is_take_ordered(spark):
    """Global hash sample must compile to TakeOrderedAndProject (per-partition
    top-k + k-row driver merge), NEVER a full global sort."""
    from knowledge_graph_spark.beyond.sampling import deterministic_sample
    from knowledge_graph_spark.io import read_table

    plan = _plan(deterministic_sample(read_table(spark, SF_SMALL, "documents"), k=10))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Exchange rangepartitioning" not in plan, plan[:2000]


def test_rollup_is_single_pass(spark):
    """ROLLUP must compute the whole grouping lattice from ONE scan (Expand +
    shared partial aggs) — not one scan per grouping set."""
    from knowledge_graph_spark.io import read_table
    from knowledge_graph_spark.queries.analytics import order_priority_rollup

    plan = _plan(order_priority_rollup(read_table(spark, SF_SMALL, "orders")))
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "Expand" in plan, plan[:2000]


def test_assign_dense_ids_stays_jvm_side(spark):
    """D9 at 100 TB: the dense-ID numbering must not route rows through
    Python (pickle per row) — the plan may contain no Python eval nodes."""
    from knowledge_graph_spark.io import assign_dense_ids

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.concat(F.lit("p"), F.col("id")).alias("path")
    )
    plan = _plan(assign_dense_ids(df, ["k", "path"]))
    for marker in ("BatchEvalPython", "PythonRDD", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_search_with_context_stays_broadcast(parquet_kg):
    """Snippet enrichment joins the tiny hit set against the line inventory:
    must plan as broadcast-hash with the range predicate as join filter,
    never a nested loop."""
    from knowledge_graph_spark.queries import library as L

    plan = _plan(L.search_with_context(parquet_kg, ["red", "bolt"]))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]


def test_search_xml_wellformed_and_broadcast(parquet_kg):
    """The XML render must stay a Catalyst string pipeline over the same
    broadcast enrichment join, and the document must parse as XML (escaping
    correct) with the reference's element vocabulary (xml.rs:124-148)."""
    import xml.etree.ElementTree as ET

    from knowledge_graph_spark.queries import shaping

    df = shaping.search_definitions_xml(parquet_kg, ["red", "bolt"], page_size=5)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    row = df.collect()[0]
    root = ET.fromstring(row["xml"])
    assert root.tag == "ToolResponse"
    defs = root.find("definitions")
    kids = list(defs)
    assert kids and all(k.tag == "definition" for k in kids)
    names = {c.tag for c in kids[0]}
    assert names == {"name", "fqn", "definition-type", "location", "context"}
    # full page of 5 → next-page token present and matches the column
    assert row["next_page"] == 2
    assert root.find("next-page").text == "2"
    assert "Decision Framework:" in row["system_message"]


def test_decontaminate_broadcasts_test_side(spark):
    """The eval-set shingle index must be the BROADCAST side — a shuffled
    join here would co-partition the whole corpus by shingle for nothing."""
    from knowledge_graph_spark.beyond.dedup import decontaminate

    train = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
    test = spark.createDataFrame([(9, "a b c d e f g h")], "doc_id long, text string")
    plan = _plan(decontaminate(train, test, n=8))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_gopher_filter_is_single_narrow_pass(spark):
    """All rules are per-row array expressions: no join, and the only
    exchange is the final sort's range partitioning."""
    from knowledge_graph_spark.beyond.text import gopher_filter
    from knowledge_graph_spark.io import read_table

    plan = _plan(gopher_filter(read_table(spark, SF_SMALL, "documents")))
    assert "Join" not in plan, plan[:2000]
    assert _exchange_count(plan) <= 1, plan[:2000]


def test_dup_ngram_stats_stays_on_hashes(spark, monkeypatch):
    """The doc-frequency shuffle must move xxhash64 longs, not n-word gram
    strings, and nothing in the plan leaves the JVM. KG_PLAN_CAPTURE makes
    the operator return its live plan instead of the r8 result checkpoint
    (persist.checkpoint_and_release pass-through) so the pin still sees the
    computation."""
    from knowledge_graph_spark.beyond.dedup import dup_ngram_stats
    from knowledge_graph_spark.io import read_table

    monkeypatch.setenv("KG_PLAN_CAPTURE", "1")
    plan = _plan(dup_ngram_stats(read_table(spark, SF_SMALL, "documents")))
    assert "xxhash64" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "PythonRDD" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_xml_tool_renders_broadcast_the_page(spark):
    """The four MCP tool renders must broadcast their page/hit set against
    the line inventory — no sort-merge join, nothing Python-side."""
    import __spark_entry__ as mod
    from knowledge_graph_spark.queries.shaping import (
        get_references_xml,
        import_usage_xml,
        read_definitions_xml,
    )

    kg = mod._graph(spark, SF_SMALL)
    paths = [
        r["import_path"]
        for r in kg.imports.select("import_path").distinct().orderBy("import_path").limit(2).collect()
    ]
    d = kg.definitions.orderBy("id").limit(1).collect()[0]
    for df in (
        import_usage_xml(kg, paths),
        get_references_xml(kg, d["name"], d["primary_file_path"]),
        read_definitions_xml(kg, [(d["name"], d["primary_file_path"])]),
    ):
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, plan[:1500]
        assert "SortMergeJoin" not in plan, plan[:1500]
        assert "BatchEvalPython" not in plan and "PythonRDD" not in plan


def test_xml_tool_renders_broadcast_without_cache_stats(spark):
    """r9 regression: the tool renders' definitions/imports lookups must be
    broadcast-shaped on an UNCACHED graph too. The session-scoped graph
    cache can lose its blocks to another query's persist hygiene mid-
    session; the un-materialized definitions plan then carries a join-
    inflated size estimate over the auto-broadcast threshold, and the
    un-hinted lookup in get_references_xml flipped to SortMergeJoin
    (observed as an order-dependent full-suite flake). The bounded side —
    the page/hit set every render already broadcasts downstream — is now
    hinted explicitly, so the plan no longer depends on cache state."""
    from knowledge_graph_spark.adapters import tpch
    from knowledge_graph_spark.queries.shaping import (
        get_references_xml,
        import_usage_xml,
        read_definitions_xml,
    )

    kg = tpch.build_graph(spark, SF_SMALL)  # no .cache(): raw plan stats
    paths = [
        r["import_path"]
        for r in kg.imports.select("import_path").distinct().orderBy("import_path").limit(2).collect()
    ]
    d = kg.definitions.orderBy("id").limit(1).collect()[0]
    for df in (
        import_usage_xml(kg, paths),
        get_references_xml(kg, d["name"], d["primary_file_path"]),
        read_definitions_xml(kg, [(d["name"], d["primary_file_path"])]),
    ):
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, plan[:1500]
        assert "SortMergeJoin" not in plan, plan[:1500]


def test_xml_export_is_distributed(spark):
    """The corpus-wide export must not collapse to one row or one
    partition — it is a per-definition frame whose fragments match the
    paged render's elements byte-for-byte."""
    import __spark_entry__ as mod
    from knowledge_graph_spark.queries.shaping import (
        search_definitions_xml,
        xml_export,
    )

    kg = mod._graph(spark, SF_SMALL)
    exp = xml_export(kg)
    # one fragment per distinct rendered identity (duplicate-fqn rows at
    # the same location collapse, exactly like the paged render's groupBy)
    assert exp.count() == kg.definitions.select(
        "fqn", "name", "definition_type", "primary_file_path",
        "start_line", "end_line",
    ).distinct().count()
    plan = _plan(exp)
    assert "BatchEvalPython" not in plan and "PythonRDD" not in plan
    # fragment parity with the paged render: a term-filtered page's
    # fragments all appear verbatim in the export
    paged = search_definitions_xml(kg, ["blue"], page=1, page_size=5).collect()[0]
    frags = {
        r.fragment
        for r in exp.filter(F.lower(F.col("fqn")).contains("blue")).collect()
    }
    for block in paged.xml.split("    <definition>\n")[1:]:
        body = "    <definition>\n" + block.split("    </definition>")[0] + "    </definition>"
        assert body in frags or paged.n_results == 0
