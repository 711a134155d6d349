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
