"""Deterministic TPC-H → code-knowledge-graph derivation.

The correctness harness (driver + tests) has only the TPC-H-ish tables as
shared ground truth between Spark and the DuckDB oracle. This adapter derives
the reference's graph schema (FIXTURES.md / schema/init.rs:4-144) from those
tables with *pure deterministic column arithmetic*, so the exact same graph
exists on both engines:

- ``build_graph(spark, sf_dir)``  — DataFrame derivation (the engine side).
- ``GRAPH_CTES``                  — the same derivation as SQL CTEs, prefixed
                                    onto every graph-query oracle.

Entity mapping (ids disjoint per node table, dense-ish, collision-free):

| graph table            | source        | id                                |
|------------------------|---------------|-----------------------------------|
| directory_nodes        | region        | r_regionkey + 1        (1..5)     |
| directory_nodes        | nation        | n_nationkey + 11       (11..35)   |
| directory_nodes        | customer      | c_custkey + 1000                  |
| file_nodes             | orders        | o_orderkey                        |
| definition_nodes       | lineitem⋈part | l_orderkey*10 + l_linenumber      |
| imported_symbol_nodes  | part          | p_partkey                         |

Edges: region→nation→customer DIR_CONTAINS_DIR, customer→order
DIR_CONTAINS_FILE, order→lineitem FILE_DEFINES, order→part FILE_IMPORTS
(distinct), lineitem→lineitem CLASS_TO_* hierarchy, lineitem→part
CALLS/AMBIGUOUSLY_CALLS/PROPERTY_REFERENCE with call-site locations,
part→def/file/part IMPORTED_SYMBOL_TO_*.

Every expression uses integer arithmetic or string ops with identical
semantics in Spark SQL and DuckDB (no double→int casts on non-integral
values, no float math), so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_graph_spark.graph.model import KnowledgeGraph
from knowledge_graph_spark.io import read_table

# Language/extension from order priority — mixed-language corpus (D3 grouping).
_LANG_CASE_SQL = """CASE o_orderpriority
    WHEN '1-URGENT' THEN 'Python'
    WHEN '2-HIGH' THEN 'Ruby'
    WHEN '3-MEDIUM' THEN 'TypeScript'
    WHEN '4-NOT SPECIFIED' THEN 'Java'
    ELSE 'Rust' END"""
_EXT_CASE_SQL = """CASE o_orderpriority
    WHEN '1-URGENT' THEN 'py'
    WHEN '2-HIGH' THEN 'rb'
    WHEN '3-MEDIUM' THEN 'ts'
    WHEN '4-NOT SPECIFIED' THEN 'java'
    ELSE 'rs' END"""

# Definition kind from line number — exercises the CLASS_TO_* hierarchy
# vocabulary (graph/relationship.rs:5-115).
_DEF_TYPE_CASE_SQL = """CASE l_linenumber
    WHEN 1 THEN 'Class'
    WHEN 2 THEN 'Method'
    WHEN 3 THEN 'Method'
    WHEN 4 THEN 'Property'
    WHEN 5 THEN 'Lambda'
    WHEN 6 THEN 'Proc'
    ELSE 'Interface' END"""

_REF_TYPE_CASE_SQL = """CASE l_linenumber % 3
    WHEN 0 THEN 'AMBIGUOUSLY_CALLS'
    WHEN 1 THEN 'CALLS'
    ELSE 'PROPERTY_REFERENCE' END"""

_IMPORT_TYPE_CASE_SQL = """CASE p_size % 3
    WHEN 0 THEN 'from-import'
    WHEN 1 THEN 'aliased'
    ELSE 'wildcard' END"""

# ---------------------------------------------------------------------------
# The single source of truth for the derivation, as SQL snippets that BOTH
# engines execute (Spark via spark.sql-compatible selectExpr, DuckDB as CTEs).
# ---------------------------------------------------------------------------

_SQL_DIR_NODES = f"""
SELECT CAST(r_regionkey + 1 AS BIGINT) AS id,
       lower(replace(r_name, ' ', '_')) AS path,
       '/repo/' || lower(replace(r_name, ' ', '_')) AS absolute_path,
       'tpch' AS repository_name,
       lower(replace(r_name, ' ', '_')) AS name
FROM region
UNION ALL
SELECT CAST(n_nationkey + 11 AS BIGINT) AS id,
       lower(replace(r_name, ' ', '_')) || '/' || lower(replace(n_name, ' ', '_')) AS path,
       '/repo/' || lower(replace(r_name, ' ', '_')) || '/' || lower(replace(n_name, ' ', '_')) AS absolute_path,
       'tpch' AS repository_name,
       lower(replace(n_name, ' ', '_')) AS name
FROM nation JOIN region ON n_regionkey = r_regionkey
UNION ALL
SELECT CAST(c_custkey + 1000 AS BIGINT) AS id,
       lower(replace(n_name, ' ', '_')) || '/c' || c_custkey AS path,
       '/repo/' || lower(replace(n_name, ' ', '_')) || '/c' || c_custkey AS absolute_path,
       'tpch' AS repository_name,
       'c' || c_custkey AS name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""

_SQL_FILE_NODES = f"""
SELECT CAST(o_orderkey AS BIGINT) AS id,
       'orders/o' || o_orderkey || '.' || {_EXT_CASE_SQL} AS path,
       '/repo/orders/o' || o_orderkey || '.' || {_EXT_CASE_SQL} AS absolute_path,
       {_LANG_CASE_SQL} AS language,
       'tpch' AS repository_name,
       {_EXT_CASE_SQL} AS extension,
       'o' || o_orderkey || '.' || {_EXT_CASE_SQL} AS name
FROM orders
"""

_SQL_DEF_NODES = f"""
SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
       'o' || l_orderkey || '.L' || l_linenumber || '.' || replace(p_name, ' ', '_') AS fqn,
       replace(p_name, ' ', '_') AS name,
       {_DEF_TYPE_CASE_SQL} AS definition_type,
       'orders/o' || l_orderkey || '.' || {_EXT_CASE_SQL} AS primary_file_path,
       CAST(l_orderkey * 1000 + l_linenumber * 100 AS BIGINT) AS primary_start_byte,
       CAST(l_orderkey * 1000 + l_linenumber * 100 + CAST(l_quantity AS BIGINT) * 10 + 1 AS BIGINT) AS primary_end_byte,
       CAST(l_linenumber AS INT) AS start_line,
       CAST(l_linenumber + CAST(l_quantity AS BIGINT) % 5 AS INT) AS end_line,
       CAST(0 AS INT) AS start_col,
       CAST(CAST(l_quantity AS BIGINT) AS INT) AS end_col,
       CAST(1 AS INT) AS total_locations
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
"""

_SQL_IMP_NODES = f"""
SELECT CAST(p_partkey AS BIGINT) AS id,
       {_IMPORT_TYPE_CASE_SQL} AS import_type,
       lower(replace(p_type, ' ', '.')) AS import_path,
       replace(p_name, ' ', '_') AS name,
       CASE WHEN p_size % 2 = 0 THEN p_brand ELSE NULL END AS alias,
       'orders/o' || mo.min_orderkey || '.' || {_EXT_CASE_SQL} AS file_path,
       CAST(p_partkey * 100 AS BIGINT) AS start_byte,
       CAST(p_partkey * 100 + p_size AS BIGINT) AS end_byte,
       CAST(p_size AS INT) AS start_line,
       CAST(p_size AS INT) AS end_line,
       CAST(0 AS INT) AS start_col,
       CAST(length(replace(p_name, ' ', '_')) AS INT) AS end_col
FROM part
JOIN (SELECT l_partkey, min(l_orderkey) AS min_orderkey FROM lineitem GROUP BY l_partkey) mo
  ON p_partkey = mo.l_partkey
JOIN orders ON mo.min_orderkey = o_orderkey
"""

_NULL_LOC = """CAST(NULL AS BIGINT) AS source_start_byte, CAST(NULL AS BIGINT) AS source_end_byte,
       CAST(NULL AS INT) AS source_start_line, CAST(NULL AS INT) AS source_end_line,
       CAST(NULL AS INT) AS source_start_col, CAST(NULL AS INT) AS source_end_col"""

_SQL_DIR_EDGES = f"""
SELECT CAST(n_regionkey + 1 AS BIGINT) AS source_id,
       CAST(n_nationkey + 11 AS BIGINT) AS target_id,
       'directory_nodes' AS source_table, 'directory_nodes' AS target_table,
       'DIR_CONTAINS_DIR' AS type, {_NULL_LOC}
FROM nation
UNION ALL
SELECT CAST(c_nationkey + 11 AS BIGINT) AS source_id,
       CAST(c_custkey + 1000 AS BIGINT) AS target_id,
       'directory_nodes' AS source_table, 'directory_nodes' AS target_table,
       'DIR_CONTAINS_DIR' AS type, {_NULL_LOC}
FROM customer
UNION ALL
SELECT CAST(o_custkey + 1000 AS BIGINT) AS source_id,
       CAST(o_orderkey AS BIGINT) AS target_id,
       'directory_nodes' AS source_table, 'file_nodes' AS target_table,
       'DIR_CONTAINS_FILE' AS type, {_NULL_LOC}
FROM orders
"""

_SQL_FILE_EDGES = f"""
SELECT CAST(l_orderkey AS BIGINT) AS source_id,
       CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS target_id,
       'file_nodes' AS source_table, 'definition_nodes' AS target_table,
       'FILE_DEFINES' AS type, {_NULL_LOC}
FROM lineitem
UNION ALL
SELECT CAST(l_orderkey AS BIGINT) AS source_id,
       CAST(l_partkey AS BIGINT) AS target_id,
       'file_nodes' AS source_table, 'imported_symbol_nodes' AS target_table,
       'FILE_IMPORTS' AS type, {_NULL_LOC}
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) fi
"""

_SQL_DEF_EDGES = f"""
SELECT CAST(l_orderkey * 10 + 1 AS BIGINT) AS source_id,
       CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS target_id,
       'definition_nodes' AS source_table, 'definition_nodes' AS target_table,
       'CLASS_TO_' || upper({_DEF_TYPE_CASE_SQL}) AS type, {_NULL_LOC}
FROM lineitem WHERE l_linenumber > 1
UNION ALL
SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS source_id,
       CAST(l_partkey AS BIGINT) AS target_id,
       'definition_nodes' AS source_table, 'imported_symbol_nodes' AS target_table,
       {_REF_TYPE_CASE_SQL} AS type,
       CAST(l_orderkey * 1000 + l_linenumber * 100 AS BIGINT) AS source_start_byte,
       CAST(l_orderkey * 1000 + l_linenumber * 100 + CAST(l_quantity AS BIGINT) * 10 AS BIGINT) AS source_end_byte,
       CAST(l_linenumber AS INT) AS source_start_line,
       CAST(l_linenumber AS INT) AS source_end_line,
       CAST(l_suppkey % 50 AS INT) AS source_start_col,
       CAST(l_suppkey % 50 + CAST(l_quantity AS BIGINT) AS INT) AS source_end_col
FROM lineitem
"""

_SQL_IMP_EDGES = f"""
SELECT CAST(l_partkey AS BIGINT) AS source_id,
       CAST(min(l_orderkey * 10 + l_linenumber) AS BIGINT) AS target_id,
       'imported_symbol_nodes' AS source_table, 'definition_nodes' AS target_table,
       'IMPORTED_SYMBOL_TO_DEFINITION' AS type, {_NULL_LOC}
FROM lineitem GROUP BY l_partkey
UNION ALL
SELECT CAST(l_partkey AS BIGINT) AS source_id,
       CAST(min(l_orderkey) AS BIGINT) AS target_id,
       'imported_symbol_nodes' AS source_table, 'file_nodes' AS target_table,
       'IMPORTED_SYMBOL_TO_FILE' AS type, {_NULL_LOC}
FROM lineitem GROUP BY l_partkey
UNION ALL
SELECT CAST(a.p_partkey AS BIGINT) AS source_id,
       CAST(b.p_partkey AS BIGINT) AS target_id,
       'imported_symbol_nodes' AS source_table, 'imported_symbol_nodes' AS target_table,
       'IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL' AS type, {_NULL_LOC}
FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
WHERE a.p_partkey % 4 IN (1, 2)
"""

# Per-file source-text inventory (path, line_no, line_text) — deterministic
# "file contents" so context-snippet queries join REAL line text, the same
# derivation on both engines. One line per (order, linenumber).
_SQL_FILE_LINES = f"""
SELECT 'orders/o' || l_orderkey || '.' || {_EXT_CASE_SQL} AS path,
       CAST(l_linenumber AS INT) AS line_no,
       CASE WHEN l_linenumber = 1
            THEN 'class ' || replace(p_name, ' ', '_') || ':  # ' || lower(replace(p_type, ' ', '.'))
            ELSE '    def ' || replace(p_name, ' ', '_') || '_' || l_linenumber
                 || '(self): return ' || CAST(l_quantity AS BIGINT)
       END AS line_text
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
"""

_TABLE_SQL: dict[str, str] = {
    "directory_nodes": _SQL_DIR_NODES,
    "file_nodes": _SQL_FILE_NODES,
    "definition_nodes": _SQL_DEF_NODES,
    "imported_symbol_nodes": _SQL_IMP_NODES,
    "directory_relationships": _SQL_DIR_EDGES,
    "file_relationships": _SQL_FILE_EDGES,
    "definition_relationships": _SQL_DEF_EDGES,
    "imported_symbol_relationships": _SQL_IMP_EDGES,
    "file_lines": _SQL_FILE_LINES,
}

#: CTE block for DuckDB oracles: ``f"WITH {GRAPH_CTES} SELECT ..."``.
GRAPH_CTES = ",\n".join(f"{name} AS ({sql})" for name, sql in _TABLE_SQL.items())


def oracle(select_sql: str, extra_ctes: str = "", recursive: bool = False) -> str:
    """Wrap a graph-query SELECT with the derivation CTEs for DuckDB.

    ``recursive=True`` emits WITH RECURSIVE so an extra CTE may
    self-reference (DuckDB allows mixing plain CTEs under it)."""
    extra = f", {extra_ctes}" if extra_ctes else ""
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} {GRAPH_CTES}{extra}\n{select_sql}"


_BASE_TABLES = ("region", "nation", "customer", "orders", "lineitem", "part")


def build_graph(spark: SparkSession, sf_dir: str) -> KnowledgeGraph:
    """Derive the graph on Spark by executing the same SQL against temp views.

    Running the identical SQL text on both engines removes any chance of
    Spark-vs-DuckDB expression drift. Catalyst still plans these as ordinary
    scans/joins/aggregations with pushdown — at 100 TB you would materialize
    the result once via ``KnowledgeGraph.write`` (parquet, partitioned) and
    query the materialization, which ``build_and_write`` does.
    """
    for t in _BASE_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    nodes: dict[str, DataFrame] = {}
    edges: dict[str, DataFrame] = {}
    file_lines: DataFrame | None = None
    for name, sql in _TABLE_SQL.items():
        df = spark.sql(sql)
        if name == "file_lines":
            file_lines = df
        elif name.endswith("_nodes"):
            nodes[name] = df
        else:
            edges[name] = df
    return KnowledgeGraph(
        spark, nodes, edges, repository_name="tpch", file_lines=file_lines
    )


def build_and_write(spark: SparkSession, sf_dir: str, out_dir: str) -> KnowledgeGraph:
    kg = build_graph(spark, sf_dir)
    kg.write(out_dir)
    return KnowledgeGraph.read(spark, out_dir, repository_name="tpch")
