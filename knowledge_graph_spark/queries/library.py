"""The query library — every template of the reference's querying/library.rs
and MCP repositories as a DataFrame-builder function over a KnowledgeGraph.

Each function mirrors a Cypher template (citation in its docstring) and obeys
these engine-wide rules:

- **Determinism**: every LIMIT/pagination is preceded by a total ORDER BY
  (reference queries order by line/fqn/name; we add id tie-breaks).
- **Broadcast the probe keys**: point-lookup filters (file path, fqn) reduce
  one side to O(1) rows — Spark's AQE broadcasts it automatically; we assert
  this shape by filtering BEFORE joining so Catalyst pushes the predicate
  into the parquet scan (PushedFilters) and prunes columns.
- **No Python UDFs** anywhere in this module — all expressions are
  Catalyst built-ins inside whole-stage codegen.

Companion ``*_SQL`` strings are the DuckDB-oracle equivalents, phrased over
the graph CTE views (see adapters/tpch.py ``oracle``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledge_graph_spark import schema as S
from knowledge_graph_spark.graph.model import KnowledgeGraph

# ---------------------------------------------------------------------------
# File-scoped lookups (Phase-1 slice)
# ---------------------------------------------------------------------------


def file_definitions(kg: KnowledgeGraph, file_path: str, limit: int = 100) -> DataFrame:
    """Definitions of one file, ordered by start_line.

    Reference: library.rs:334-373 (get_file_definitions) —
    ``MATCH (f:FileNode {path: $path})-[:FILE_DEFINES]->(d:DefinitionNode)
    RETURN d... ORDER BY d.start_line LIMIT $limit``.
    """
    files = kg.files.filter(F.col("path") == file_path).select(F.col("id").alias("_fid"))
    defines = kg.edge("file_relationships", (S.FILE_DEFINES,))
    return (
        files.join(defines, files._fid == defines.source_id)
        .join(kg.definitions, defines.target_id == kg.definitions.id)
        .select(
            "fqn",
            "name",
            "definition_type",
            "primary_file_path",
            "start_line",
            "end_line",
        )
        .orderBy("start_line", "fqn")
        .limit(limit)
    )


FILE_DEFINITIONS_SQL = """
SELECT d.fqn, d.name, d.definition_type, d.primary_file_path, d.start_line, d.end_line
FROM file_nodes f
JOIN file_relationships r ON r.source_id = f.id AND r.type = 'FILE_DEFINES'
JOIN definition_nodes d ON d.id = r.target_id
WHERE f.path = {file_path}
ORDER BY d.start_line, d.fqn LIMIT {limit}
"""


def read_definitions(
    kg: KnowledgeGraph, requests: list[tuple[str, str]], limit: int = 100
) -> DataFrame:
    """Batch definition lookup by exact (name, primary_file_path) pairs —
    the read_definitions MCP tool.

    Reference: read_definitions/repository.rs:42-75 runs ONE query PER
    request (``d.name = $name AND d.primary_file_path = $path ORDER BY
    start_line``) in a driver-side loop. Spark-first difference: the whole
    request batch is a single broadcast hash semi-join against the
    definitions table — one scan total, however many requests, which is the
    shape that survives 100 TB (N sequential point queries would re-scan or
    re-seek per request)."""
    req = kg.spark.createDataFrame(
        list(dict.fromkeys(requests)), "name string, primary_file_path string"
    )
    return (
        kg.definitions.join(F.broadcast(req), ["name", "primary_file_path"])
        .select(
            "name", "fqn", "definition_type", "primary_file_path",
            "start_line", "end_line",
        )
        .orderBy("primary_file_path", "start_line", "name", "fqn")
        .limit(limit)
    )


READ_DEFINITIONS_SQL = """
SELECT d.name, d.fqn, d.definition_type, d.primary_file_path, d.start_line, d.end_line
FROM definition_nodes d
JOIN ({requests}) q ON q.name = d.name AND q.primary_file_path = d.primary_file_path
ORDER BY d.primary_file_path, d.start_line, d.name, d.fqn LIMIT {limit}
"""


def file_imports(kg: KnowledgeGraph, file_path: str, limit: int = 50) -> DataFrame:
    """Imports of one file. Reference: library.rs:377-385 (get_file_imports)."""
    files = kg.files.filter(F.col("path") == file_path).select(F.col("id").alias("_fid"))
    imps = kg.edge("file_relationships", (S.FILE_IMPORTS,))
    return (
        files.join(imps, files._fid == imps.source_id)
        .join(kg.imports, imps.target_id == kg.imports.id)
        .select("import_path", "name", "alias", "import_type", "file_path")
        .orderBy("import_path", "name")
        .limit(limit)
    )


FILE_IMPORTS_SQL = """
SELECT i.import_path, i.name, i.alias, i.import_type, i.file_path
FROM file_nodes f
JOIN file_relationships r ON r.source_id = f.id AND r.type = 'FILE_IMPORTS'
JOIN imported_symbol_nodes i ON i.id = r.target_id
WHERE f.path = {file_path}
ORDER BY i.import_path, i.name LIMIT {limit}
"""


# ---------------------------------------------------------------------------
# Import usage (OPTIONAL MATCH / left outer join)
# ---------------------------------------------------------------------------


def import_usage(kg: KnowledgeGraph, import_paths: list[str], limit: int = 500) -> DataFrame:
    """Imports matched case-insensitively by path, with their referencing
    definitions when any (left outer join).

    Reference: library.rs:50-151 (import_usage) —
    ``MATCH (imp:ImportedSymbolNode) WHERE toLower(imp.import_path) IN $paths
    OPTIONAL MATCH (imp)<-[r]-(src:DefinitionNode)
    WHERE r IS NULL OR r.type IN [CALLS, AMBIGUOUSLY_CALLS, PROPERTY_REFERENCE]
    RETURN ..., COALESCE(r.source_start_line, src.start_line)`` (P3, P6, J4).
    """
    paths_lc = [p.lower() for p in import_paths]
    imps = kg.imports.filter(F.lower(F.col("import_path")).isin(paths_lc))
    refs = (
        kg.edge("definition_relationships", S.REFERENCE_EDGE_TYPES)
        .filter(F.col("target_table") == "imported_symbol_nodes")
        .alias("r")
    )
    defs = kg.definitions.alias("src")
    joined = (
        imps.alias("imp")
        .join(refs, F.col("imp.id") == F.col("r.target_id"), "left_outer")
        .join(defs, F.col("r.source_id") == F.col("src.id"), "left_outer")
    )
    return joined.select(
        F.col("imp.import_path").alias("import_path"),
        F.col("imp.name").alias("import_name"),
        F.col("imp.file_path").alias("import_file_path"),
        F.col("src.fqn").alias("ref_fqn"),
        F.col("src.definition_type").alias("ref_type"),
        F.coalesce(F.col("r.source_start_line"), F.col("src.start_line")).alias("ref_line"),
    ).orderBy(
        "import_path", "import_name", F.col("ref_fqn").asc_nulls_first(), "ref_line"
    ).limit(limit)


IMPORT_USAGE_SQL = """
SELECT i.import_path,
       i.name AS import_name,
       i.file_path AS import_file_path,
       src.fqn AS ref_fqn,
       src.definition_type AS ref_type,
       COALESCE(r.source_start_line, src.start_line) AS ref_line
FROM imported_symbol_nodes i
LEFT JOIN definition_relationships r
  ON r.target_id = i.id AND r.target_table = 'imported_symbol_nodes'
 AND r.type IN ('CALLS','AMBIGUOUSLY_CALLS','PROPERTY_REFERENCE')
LEFT JOIN definition_nodes src ON src.id = r.source_id
WHERE lower(i.import_path) IN ({paths})
ORDER BY i.import_path, import_name, ref_fqn NULLS FIRST, ref_line LIMIT {limit}
"""


# ---------------------------------------------------------------------------
# References (reverse-direction match + offset pagination)
# ---------------------------------------------------------------------------


def get_references(
    kg: KnowledgeGraph, symbol_name: str, page: int = 1, page_size: int = 50
) -> DataFrame:
    """Definitions that reference (call / property-read) a symbol, paginated.

    Reference: get_references/repository.rs:36-54 —
    ``MATCH (src:DefinitionNode)-[r]->(t) WHERE t.name = $name AND r.type IN
    [CALLS, AMBIGUOUSLY_CALLS, PROPERTY_REFERENCE] ... SKIP $skip LIMIT $limit``
    (J2 reverse match, O5 offset pagination, page math at repository.rs:78-81).
    """
    targets = kg.imports.filter(F.col("name") == symbol_name).select(
        F.col("id").alias("_tid"), F.col("name").alias("symbol_name")
    )
    refs = kg.edge("definition_relationships", S.REFERENCE_EDGE_TYPES).filter(
        F.col("target_table") == "imported_symbol_nodes"
    )
    out = (
        targets.join(refs, targets._tid == refs.target_id)
        .join(kg.definitions, refs.source_id == kg.definitions.id)
        .select(
            "symbol_name",
            F.col("fqn").alias("ref_fqn"),
            F.col("definition_type").alias("ref_type"),
            F.col("primary_file_path").alias("ref_file"),
            F.col("source_start_line").alias("call_line"),
            F.col("source_start_col").alias("call_col"),
        )
        .orderBy("ref_fqn", "call_line", "call_col")
    )
    return out.offset((page - 1) * page_size).limit(page_size)


GET_REFERENCES_SQL = """
SELECT t.name AS symbol_name,
       d.fqn AS ref_fqn,
       d.definition_type AS ref_type,
       d.primary_file_path AS ref_file,
       r.source_start_line AS call_line,
       r.source_start_col AS call_col
FROM imported_symbol_nodes t
JOIN definition_relationships r
  ON r.target_id = t.id AND r.target_table = 'imported_symbol_nodes'
 AND r.type IN ('CALLS','AMBIGUOUSLY_CALLS','PROPERTY_REFERENCE')
JOIN definition_nodes d ON d.id = r.source_id
WHERE t.name = {name}
ORDER BY ref_fqn, call_line, call_col
LIMIT {limit} OFFSET {offset}
"""


# ---------------------------------------------------------------------------
# Go-to-definition (anchored two-constraint pattern + interval predicate)
# ---------------------------------------------------------------------------


def definition_at(kg: KnowledgeGraph, file_path: str, line: int, col: int) -> DataFrame:
    """Resolve the symbol at (file, line, col) to its target definition/import.

    Reference: get_definition/repository.rs:20-154 — 4 UNIONed variants of
    ``MATCH (src {primary_file_path:$p})-[r]->(target) WHERE
    r.source_start_line = $line AND r.source_start_col <= $col AND
    r.source_end_col >= $col`` (J5 anchored pattern + P9 interval containment,
    P7 CAST normalization, P8 per-branch target_type constant). Our graph has
    call-site locations on def→imp reference edges; the def→def branch is
    kept for parity and contributes when hierarchy edges carry locations.
    """
    src = kg.definitions.filter(F.col("primary_file_path") == file_path).select(
        F.col("id").alias("_sid"), F.col("fqn").alias("src_fqn")
    )
    refs = kg.edges["definition_relationships"].filter(
        (F.col("source_start_line") == line)
        & (F.col("source_start_col") <= col)
        & (F.col("source_end_col") >= col)
    )
    base = src.join(refs, src._sid == refs.source_id)

    to_def = (
        base.filter(F.col("target_table") == "definition_nodes")
        .join(kg.definitions, F.col("target_id") == kg.definitions.id)
        .select(
            "src_fqn",
            F.lit("definition").alias("target_kind"),
            F.col("fqn").alias("target_name"),
            F.col("primary_file_path").alias("target_file"),
            F.col("start_line").cast("long").alias("target_line"),
        )
    )
    to_imp = (
        base.filter(F.col("target_table") == "imported_symbol_nodes")
        .join(kg.imports, F.col("target_id") == kg.imports.id)
        .select(
            "src_fqn",
            F.lit("imported_symbol").alias("target_kind"),
            F.col("name").alias("target_name"),
            F.col("file_path").alias("target_file"),
            F.col("start_line").cast("long").alias("target_line"),
        )
    )
    return to_def.unionByName(to_imp).orderBy(
        "target_kind", "target_name", "src_fqn"
    ).limit(100)


DEFINITION_AT_SQL = """
SELECT * FROM (
  SELECT s.fqn AS src_fqn,
         'definition' AS target_kind,
         t.fqn AS target_name,
         t.primary_file_path AS target_file,
         CAST(t.start_line AS BIGINT) AS target_line
  FROM definition_nodes s
  JOIN definition_relationships r ON r.source_id = s.id AND r.target_table = 'definition_nodes'
  JOIN definition_nodes t ON t.id = r.target_id
  WHERE s.primary_file_path = {file_path}
    AND r.source_start_line = {line}
    AND r.source_start_col <= {col} AND r.source_end_col >= {col}
  UNION ALL
  SELECT s.fqn AS src_fqn,
         'imported_symbol' AS target_kind,
         t.name AS target_name,
         t.file_path AS target_file,
         CAST(t.start_line AS BIGINT) AS target_line
  FROM definition_nodes s
  JOIN definition_relationships r ON r.source_id = s.id AND r.target_table = 'imported_symbol_nodes'
  JOIN imported_symbol_nodes t ON t.id = r.target_id
  WHERE s.primary_file_path = {file_path}
    AND r.source_start_line = {line}
    AND r.source_start_col <= {col} AND r.source_end_col >= {col}
) u ORDER BY target_kind, target_name, src_fqn LIMIT 100
"""


# ---------------------------------------------------------------------------
# Text search (P4/P5, U2 padded unions, G7)
# ---------------------------------------------------------------------------


def list_matches(kg: KnowledgeGraph, term: str, limit: int = 100) -> DataFrame:
    """Definitions whose fqn case-insensitively contains a term, by fqn.

    Reference: library.rs:413-426 (list_matching_definitions) —
    ``WHERE toLower(d.fqn) CONTAINS toLower($term) ORDER BY d.fqn LIMIT``.
    """
    return (
        kg.definitions.filter(F.lower(F.col("fqn")).contains(term.lower()))
        .select("fqn", "name", "definition_type", "primary_file_path")
        .orderBy("fqn")
        .limit(limit)
    )


LIST_MATCHES_SQL = """
SELECT fqn, name, definition_type, primary_file_path
FROM definition_nodes
WHERE contains(lower(fqn), lower({term}))
ORDER BY fqn LIMIT {limit}
"""


def search_definitions(
    kg: KnowledgeGraph, terms: list[str], page: int = 1, page_size: int = 50
) -> DataFrame:
    """Multi-term ANY-match over definition names, paginated.

    Reference: library.rs:920-969 (search_definitions) —
    ``WHERE ANY(term IN $terms WHERE toLower(d.name) CONTAINS term)
    ORDER BY ... SKIP $skip LIMIT $limit`` (P5, P11 pre-lowercased params,
    O5). Implemented as an OR-fold of ``contains`` — Catalyst folds it into
    one predicate; no array allocation per row.
    """
    terms_lc = [t.lower() for t in terms]
    name_lc = F.lower(F.col("name"))
    pred = reduce(lambda a, b: a | b, [name_lc.contains(t) for t in terms_lc])
    out = (
        kg.definitions.filter(pred)
        .select("fqn", "name", "definition_type", "primary_file_path", "start_line")
        .orderBy("fqn", "start_line")
    )
    return out.offset((page - 1) * page_size).limit(page_size)


SEARCH_DEFINITIONS_SQL = """
SELECT fqn, name, definition_type, primary_file_path, start_line
FROM definition_nodes
WHERE {any_pred}
ORDER BY fqn, start_line
LIMIT {limit} OFFSET {offset}
"""


def search_with_context(
    kg: KnowledgeGraph,
    terms: list[str],
    context_lines: int = 2,
    page: int = 1,
    page_size: int = 50,
) -> DataFrame:
    """Search hits enriched with a ±N-line context snippet.

    Reference: search_codebase_definitions.rs:233-255 +
    file_reader_utils.rs:1-252 — after the query, the MCP tool concurrently
    reads file chunks (10 s timeout) to attach code snippets to each result.
    Here the enrichment is a join against the indexed per-file LINE
    inventory (real source text, ``kg.file_lines``), so snippet assembly is
    part of the PLAN: a broadcast-hash join on file path (the ≤page_size hit
    set broadcasts) with the line-range predicate as join filter, then a
    sorted string-agg — no driver-side file IO, no timeout machinery, and
    it scales with the hit count, not the corpus. Graphs without an indexed
    line inventory fall back to a definition-derived rendering.
    """
    ctx = int(context_lines)
    hits = search_definitions(kg, terms, page, page_size)
    lines = _context_lines(kg)
    j = F.broadcast(hits).join(
        lines,
        (hits.primary_file_path == lines._path)
        & (lines._line >= hits.start_line - ctx)
        & (lines._line <= hits.start_line + ctx),
    )
    snippet = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_line", "_rendered"))),
            lambda s: s["_rendered"],
        ),
        "\n",
    )
    return (
        j.groupBy("fqn", "name", "definition_type", "primary_file_path", "start_line")
        .agg(snippet.alias("snippet"))
        .orderBy("fqn", "start_line")
    )


def _context_lines(kg: KnowledgeGraph) -> DataFrame:
    """(_path, _line, _rendered) source of context snippets: the real
    file-text line inventory when indexed, else the definition-inventory
    rendering (legacy graphs with no stored content)."""
    if kg.file_lines is not None:
        return kg.file_lines.select(
            F.col("path").alias("_path"),
            F.col("line_no").alias("_line"),
            F.col("line_text").alias("_rendered"),
        )
    return kg.definitions.select(
        F.col("primary_file_path").alias("_path"),
        F.col("start_line").alias("_line"),
        F.format_string(
            "%s %s @%d", "definition_type", "fqn", "start_line"
        ).alias("_rendered"),
    )


SEARCH_WITH_CONTEXT_CTE = """hits AS (
  SELECT fqn, name, definition_type, primary_file_path, start_line
  FROM definition_nodes
  WHERE {any_pred}
  ORDER BY fqn, start_line
  LIMIT {limit} OFFSET {offset}
)"""

SEARCH_WITH_CONTEXT_SQL = """
SELECT h.fqn, h.name, h.definition_type, h.primary_file_path, h.start_line,
  string_agg(l.line_text, chr(10) ORDER BY l.line_no, l.line_text) AS snippet
FROM hits h
JOIN file_lines l
  ON l.path = h.primary_file_path
 AND l.line_no BETWEEN h.start_line - {ctx} AND h.start_line + {ctx}
GROUP BY 1, 2, 3, 4, 5
ORDER BY h.fqn, h.start_line
"""


def _pad_long():
    return F.lit(None).cast("long")


def search_nodes(kg: KnowledgeGraph, term: str, limit: int = 100) -> DataFrame:
    """Graph-wide search across all 4 node types, schema-padded UNION.

    Reference: library.rs:787-918 (search_nodes) — four query sections with
    per-branch constants (``'FileNode' AS node_type``) and padded columns
    (``'' AS fqn``, ``CAST(0 AS INT64)``), ordered by (node_type, name)
    (U2, P7, P8, G7, O3).
    """
    t = term.lower()
    dirs = kg.directories.filter(F.lower(F.col("path")).contains(t)).select(
        F.lit("DirectoryNode").alias("node_type"),
        F.col("id"),
        F.col("name"),
        F.col("path"),
        F.lit("").alias("fqn"),
        _pad_long().alias("start_line"),
    )
    files = kg.files.filter(F.lower(F.col("path")).contains(t)).select(
        F.lit("FileNode").alias("node_type"),
        F.col("id"),
        F.col("name"),
        F.col("path"),
        F.lit("").alias("fqn"),
        _pad_long().alias("start_line"),
    )
    defs = kg.definitions.filter(F.lower(F.col("fqn")).contains(t)).select(
        F.lit("DefinitionNode").alias("node_type"),
        F.col("id"),
        F.col("name"),
        F.col("primary_file_path").alias("path"),
        F.col("fqn"),
        F.col("start_line").cast("long").alias("start_line"),
    )
    imps = kg.imports.filter(F.lower(F.col("import_path")).contains(t)).select(
        F.lit("ImportedSymbolNode").alias("node_type"),
        F.col("id"),
        F.col("name"),
        F.col("import_path").alias("path"),
        F.lit("").alias("fqn"),
        F.col("start_line").cast("long").alias("start_line"),
    )
    return (
        dirs.unionByName(files).unionByName(defs).unionByName(imps)
        .orderBy("node_type", "name", "id")
        .limit(limit)
    )


SEARCH_NODES_SQL = """
SELECT * FROM (
  SELECT 'DirectoryNode' AS node_type, id, name, path, '' AS fqn, CAST(NULL AS BIGINT) AS start_line
  FROM directory_nodes WHERE contains(lower(path), lower({term}))
  UNION ALL
  SELECT 'FileNode', id, name, path, '', CAST(NULL AS BIGINT)
  FROM file_nodes WHERE contains(lower(path), lower({term}))
  UNION ALL
  SELECT 'DefinitionNode', id, name, primary_file_path, fqn, CAST(start_line AS BIGINT)
  FROM definition_nodes WHERE contains(lower(fqn), lower({term}))
  UNION ALL
  SELECT 'ImportedSymbolNode', id, name, import_path, '', CAST(start_line AS BIGINT)
  FROM imported_symbol_nodes WHERE contains(lower(import_path), lower({term}))
) u ORDER BY node_type, name, id LIMIT {limit}
"""


# ---------------------------------------------------------------------------
# Graph ops: neighbors, initial graph, stats (G1/G2/G3)
# ---------------------------------------------------------------------------

# (edge table, source node table, target node table) triples — the generated
# "relationship configs" of library.rs:199-260.
_EDGE_CONFIGS = [
    ("directory_relationships", "directory_nodes", "directory_nodes", "DIR_CONTAINS_DIR"),
    ("directory_relationships", "directory_nodes", "file_nodes", "DIR_CONTAINS_FILE"),
    ("file_relationships", "file_nodes", "definition_nodes", "FILE_DEFINES"),
    ("file_relationships", "file_nodes", "imported_symbol_nodes", "FILE_IMPORTS"),
    ("definition_relationships", "definition_nodes", None, None),  # def→def/imp, typed by row
    ("imported_symbol_relationships", "imported_symbol_nodes", None, None),
]


def _node_label_df(kg: KnowledgeGraph, table: str) -> DataFrame:
    df = {
        "directory_nodes": kg.directories.select("id", F.col("path").alias("label")),
        "file_nodes": kg.files.select("id", F.col("path").alias("label")),
        "definition_nodes": kg.definitions.select("id", F.col("fqn").alias("label")),
        "imported_symbol_nodes": kg.imports.select("id", F.col("import_path").alias("label")),
    }[table]
    return df.withColumn("node_type", F.lit(table))


def neighbors(
    kg: KnowledgeGraph,
    node_table: str,
    node_id: int,
    limit: int = 100,
    include_edge_table: bool = False,
) -> DataFrame:
    """1-hop neighborhood of a node, both directions, across every edge table
    whose (from,to) pairs touch the node's type.

    Reference: library.rs:667-785 + graph_neighbors.rs:96-170 — generated
    undirected sections ``MATCH (n)-[r]-(m)`` per relationship config, padded
    UNION, app-side dedup by id (U3 → dropDuplicates), LIMIT (G1, J3).

    ``include_edge_table=True`` adds the physical edge-table column the HTTP
    contract layer needs for ``relationship_name`` (the reference's section
    constant, library.rs:204-255); the default keeps the oracle schema.
    """
    pieces = []
    for edge_table, pairs in S.EDGE_TABLES.items():
        for from_table, to_table in pairs:
            if node_table not in (from_table, to_table):
                continue
            e = kg.edges[edge_table].filter(
                (F.col("source_table") == from_table)
                & (F.col("target_table") == to_table)
            )
            tgt_nodes = _node_label_df(kg, to_table)
            src_nodes = _node_label_df(kg, from_table)
            extra = (
                [F.lit(edge_table).alias("edge_table")] if include_edge_table else []
            )
            if from_table == node_table:
                pieces.append(
                    e.filter(F.col("source_id") == node_id)
                    .join(tgt_nodes, e.target_id == tgt_nodes.id)
                    .select(
                        F.lit("out").alias("direction"),
                        F.col("type").alias("rel_type"),
                        F.col("node_type").alias("neighbor_type"),
                        F.col("id").alias("neighbor_id"),
                        F.col("label").alias("neighbor_label"),
                        *extra,
                    )
                )
            if to_table == node_table:
                pieces.append(
                    e.filter(F.col("target_id") == node_id)
                    .join(src_nodes, e.source_id == src_nodes.id)
                    .select(
                        F.lit("in").alias("direction"),
                        F.col("type").alias("rel_type"),
                        F.col("node_type").alias("neighbor_type"),
                        F.col("id").alias("neighbor_id"),
                        F.col("label").alias("neighbor_label"),
                        *extra,
                    )
                )
    out = reduce(lambda a, b: a.unionByName(b), pieces)
    return (
        out.dropDuplicates(["direction", "rel_type", "neighbor_type", "neighbor_id"])
        .orderBy("direction", "rel_type", "neighbor_type", "neighbor_id")
        .limit(limit)
    )


def neighbors_sql(node_table: str, node_id: int, limit: int = 100) -> str:
    label_col = {
        "directory_nodes": "path",
        "file_nodes": "path",
        "definition_nodes": "fqn",
        "imported_symbol_nodes": "import_path",
    }
    branches = []
    for edge_table, pairs in S.EDGE_TABLES.items():
        for from_table, to_table in pairs:
            if node_table == from_table:
                branches.append(
                    f"SELECT 'out' AS direction, e.type AS rel_type, '{to_table}' AS neighbor_type, "
                    f"n.id AS neighbor_id, n.{label_col[to_table]} AS neighbor_label "
                    f"FROM {edge_table} e JOIN {to_table} n ON n.id = e.target_id "
                    f"WHERE e.source_id = {node_id} "
                    f"AND e.source_table = '{from_table}' AND e.target_table = '{to_table}'"
                )
            if node_table == to_table:
                branches.append(
                    f"SELECT 'in' AS direction, e.type AS rel_type, '{from_table}' AS neighbor_type, "
                    f"n.id AS neighbor_id, n.{label_col[from_table]} AS neighbor_label "
                    f"FROM {edge_table} e JOIN {from_table} n ON n.id = e.source_id "
                    f"WHERE e.target_id = {node_id} "
                    f"AND e.source_table = '{from_table}' AND e.target_table = '{to_table}'"
                )
    union = " UNION ALL ".join(branches)
    return (
        f"SELECT DISTINCT direction, rel_type, neighbor_type, neighbor_id, neighbor_label "
        f"FROM ({union}) u "
        f"ORDER BY direction, rel_type, neighbor_type, neighbor_id LIMIT {limit}"
    )


def initial_graph(
    kg: KnowledgeGraph,
    dir_limit: int = 50,
    file_limit: int = 100,
    def_limit: int = 200,
    imp_limit: int = 50,
) -> DataFrame:
    """First-screen graph sample: per-category ordered LIMITs, padded UNION.

    Reference: library.rs:454-529 (initial graph, 9 sections w/ per-category
    limits 50/100/200/50) + graph_initial.rs:99-153 (G2, U1; per-branch limit
    pushdown noted in SURVEY §4). Reference limits are insertion-ordered; we
    order by id for determinism.
    """
    dirs = kg.directories.orderBy("id").limit(dir_limit).select(
        F.lit("DirectoryNode").alias("node_type"), "id", F.col("path").alias("label")
    )
    files = kg.files.orderBy("id").limit(file_limit).select(
        F.lit("FileNode").alias("node_type"), "id", F.col("path").alias("label")
    )
    defs = kg.definitions.orderBy("id").limit(def_limit).select(
        F.lit("DefinitionNode").alias("node_type"), "id", F.col("fqn").alias("label")
    )
    imps = kg.imports.orderBy("id").limit(imp_limit).select(
        F.lit("ImportedSymbolNode").alias("node_type"), "id", F.col("import_path").alias("label")
    )
    return (
        dirs.unionByName(files).unionByName(defs).unionByName(imps)
        .orderBy("node_type", "id")
    )


INITIAL_GRAPH_SQL = """
SELECT * FROM (
  (SELECT 'DirectoryNode' AS node_type, id, path AS label FROM directory_nodes ORDER BY id LIMIT {dir_limit})
  UNION ALL
  (SELECT 'FileNode', id, path FROM file_nodes ORDER BY id LIMIT {file_limit})
  UNION ALL
  (SELECT 'DefinitionNode', id, fqn FROM definition_nodes ORDER BY id LIMIT {def_limit})
  UNION ALL
  (SELECT 'ImportedSymbolNode', id, import_path FROM imported_symbol_nodes ORDER BY id LIMIT {imp_limit})
) u ORDER BY node_type, id
"""


def graph_stats(kg: KnowledgeGraph) -> DataFrame:
    """Node counts per table + edge counts per (table, type).

    Reference: query_builder.rs:144-241 (count templates: per-node COUNT,
    chained multi-count, COUNT(DISTINCT [from,to])), kuzu/service.rs:207-257,
    graph_stats.rs:103-150 (A1-A4, G3). One Spark job: union + groupBy.
    """
    parts = []
    for k in ("directory_nodes", "file_nodes", "definition_nodes", "imported_symbol_nodes"):
        parts.append(
            kg.nodes[k].select(
                F.lit(k).alias("table_name"), F.lit("").alias("type")
            )
        )
    for k in kg.edges:
        parts.append(kg.edges[k].select(F.lit(k).alias("table_name"), F.col("type")))
    allrows = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        allrows.groupBy("table_name", "type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("table_name", "type")
    )


GRAPH_STATS_SQL = """
SELECT table_name, type, count(*) AS n FROM (
  SELECT 'directory_nodes' AS table_name, '' AS type FROM directory_nodes
  UNION ALL SELECT 'file_nodes', '' FROM file_nodes
  UNION ALL SELECT 'definition_nodes', '' FROM definition_nodes
  UNION ALL SELECT 'imported_symbol_nodes', '' FROM imported_symbol_nodes
  UNION ALL SELECT 'directory_relationships', type FROM directory_relationships
  UNION ALL SELECT 'file_relationships', type FROM file_relationships
  UNION ALL SELECT 'definition_relationships', type FROM definition_relationships
  UNION ALL SELECT 'imported_symbol_relationships', type FROM imported_symbol_relationships
) u GROUP BY table_name, type ORDER BY table_name, type
"""


def distinct_edge_endpoints(kg: KnowledgeGraph) -> DataFrame:
    """COUNT(DISTINCT [from, to]) per edge table — query_builder.rs:211-260 (A3)."""
    parts = [
        kg.edges[k]
        .select("source_id", "target_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("distinct_pairs"))
        .select(F.lit(k).alias("edge_table"), "distinct_pairs")
        for k in kg.edges
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("edge_table")


DISTINCT_EDGE_ENDPOINTS_SQL = """
SELECT edge_table, distinct_pairs FROM (
  SELECT 'directory_relationships' AS edge_table, count(DISTINCT (source_id, target_id)) AS distinct_pairs FROM directory_relationships
  UNION ALL SELECT 'file_relationships', count(DISTINCT (source_id, target_id)) FROM file_relationships
  UNION ALL SELECT 'definition_relationships', count(DISTINCT (source_id, target_id)) FROM definition_relationships
  UNION ALL SELECT 'imported_symbol_relationships', count(DISTINCT (source_id, target_id)) FROM imported_symbol_relationships
) u ORDER BY edge_table
"""


def max_ids(kg: KnowledgeGraph) -> DataFrame:
    """max(id) per node table — query_builder.rs:133-142, used for incremental
    ID-head resume (A5/M3, mutation/changes.rs:150-192)."""
    parts = [
        kg.nodes[k].agg(F.max("id").alias("max_id")).select(
            F.lit(k).alias("node_table"), "max_id"
        )
        for k in ("directory_nodes", "file_nodes", "definition_nodes", "imported_symbol_nodes")
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("node_table")


MAX_IDS_SQL = """
SELECT node_table, max_id FROM (
  SELECT 'directory_nodes' AS node_table, max(id) AS max_id FROM directory_nodes
  UNION ALL SELECT 'file_nodes', max(id) FROM file_nodes
  UNION ALL SELECT 'definition_nodes', max(id) FROM definition_nodes
  UNION ALL SELECT 'imported_symbol_nodes', max(id) FROM imported_symbol_nodes
) u ORDER BY node_table
"""


# ---------------------------------------------------------------------------
# Call-graph navigation (G4/G5) and repo map (A7)
# ---------------------------------------------------------------------------


def callers_of(kg: KnowledgeGraph, symbol_name: str, limit: int = 100) -> DataFrame:
    """Definitions that CALL the named symbol (strict CALLS only).

    Reference: kuzu/service.rs:292-321 (callers-of by name over CALLS edges).
    """
    targets = kg.imports.filter(F.col("name") == symbol_name).select(F.col("id").alias("_tid"))
    calls = kg.edge("definition_relationships", (S.CALLS,)).filter(
        F.col("target_table") == "imported_symbol_nodes"
    )
    return (
        targets.join(calls, targets._tid == calls.target_id)
        .join(kg.definitions, calls.source_id == kg.definitions.id)
        .select(
            F.col("fqn").alias("caller_fqn"),
            F.col("primary_file_path").alias("caller_file"),
            F.col("source_start_line").alias("call_line"),
        )
        .orderBy("caller_fqn", "call_line")
        .limit(limit)
    )


CALLERS_OF_SQL = """
SELECT d.fqn AS caller_fqn, d.primary_file_path AS caller_file, r.source_start_line AS call_line
FROM imported_symbol_nodes t
JOIN definition_relationships r ON r.target_id = t.id AND r.type = 'CALLS'
 AND r.target_table = 'imported_symbol_nodes'
JOIN definition_nodes d ON d.id = r.source_id
WHERE t.name = {name}
ORDER BY caller_fqn, call_line LIMIT {limit}
"""


def callees_of(kg: KnowledgeGraph, def_fqn: str, limit: int = 100) -> DataFrame:
    """Symbols called by the definition with this fqn — kuzu/service.rs:324-344."""
    src = kg.definitions.filter(F.col("fqn") == def_fqn).select(F.col("id").alias("_sid"))
    calls = kg.edge("definition_relationships", S.REFERENCE_EDGE_TYPES).filter(
        F.col("target_table") == "imported_symbol_nodes"
    )
    return (
        src.join(calls, src._sid == calls.source_id)
        .join(kg.imports, calls.target_id == kg.imports.id)
        .select(
            F.col("type").alias("rel_type"),
            F.col("name").alias("callee_name"),
            F.col("import_path").alias("callee_path"),
        )
        .orderBy("rel_type", "callee_name", "callee_path")
        .limit(limit)
    )


CALLEES_OF_SQL = """
SELECT r.type AS rel_type, i.name AS callee_name, i.import_path AS callee_path
FROM definition_nodes d
JOIN definition_relationships r ON r.source_id = d.id
  AND r.target_table = 'imported_symbol_nodes'
  AND r.type IN ('CALLS','AMBIGUOUSLY_CALLS','PROPERTY_REFERENCE')
JOIN imported_symbol_nodes i ON i.id = r.target_id
WHERE d.fqn = {fqn}
ORDER BY rel_type, callee_name, callee_path LIMIT {limit}
"""


def calls_to_imported_symbol(
    kg: KnowledgeGraph, import_path: str, name: str, limit: int = 100
) -> DataFrame:
    """Calls to an imported symbol keyed by (import_path, name) —
    kuzu/service.rs:369-394 (G5)."""
    targets = kg.imports.filter(
        (F.col("import_path") == import_path) & (F.col("name") == name)
    ).select(F.col("id").alias("_tid"))
    calls = kg.edge("definition_relationships", (S.CALLS, S.AMBIGUOUSLY_CALLS)).filter(
        F.col("target_table") == "imported_symbol_nodes"
    )
    return (
        targets.join(calls, targets._tid == calls.target_id)
        .join(kg.definitions, calls.source_id == kg.definitions.id)
        .select(
            F.col("fqn").alias("caller_fqn"),
            F.col("type").alias("call_type"),
            F.col("source_start_line").alias("call_line"),
        )
        .orderBy("caller_fqn", "call_type", "call_line")
        .limit(limit)
    )


CALLS_TO_IMPORTED_SYMBOL_SQL = """
SELECT d.fqn AS caller_fqn, r.type AS call_type, r.source_start_line AS call_line
FROM imported_symbol_nodes t
JOIN definition_relationships r ON r.target_id = t.id AND r.type IN ('CALLS','AMBIGUOUSLY_CALLS')
 AND r.target_table = 'imported_symbol_nodes'
JOIN definition_nodes d ON d.id = r.source_id
WHERE t.import_path = {import_path} AND t.name = {name}
ORDER BY caller_fqn, call_type, call_line LIMIT {limit}
"""


def repo_map(kg: KnowledgeGraph, path_prefix: str = "", limit: int = 200) -> DataFrame:
    """Definitions grouped per file: count + ordered names list.

    Reference: repo_map/service.rs:36-101 + get_references/service.rs:51-61
    (app-side group-by of rows into per-definition groups — A7). Expressed as
    groupBy + sort_array(collect_list): one shuffle, map-side partial agg.
    """
    defs = kg.definitions
    if path_prefix:
        defs = defs.filter(F.col("primary_file_path").startswith(path_prefix))
    return (
        defs.groupBy("primary_file_path")
        .agg(
            F.count(F.lit(1)).alias("def_count"),
            F.min("start_line").alias("first_line"),
            F.array_join(F.sort_array(F.collect_list("name")), ",").alias("def_names"),
        )
        .orderBy("primary_file_path")
        .limit(limit)
    )


REPO_MAP_SQL = """
SELECT primary_file_path,
       count(*) AS def_count,
       min(start_line) AS first_line,
       string_agg(name, ',' ORDER BY name) AS def_names
FROM definition_nodes
WHERE primary_file_path LIKE {prefix_like}
GROUP BY primary_file_path
ORDER BY primary_file_path LIMIT {limit}
"""


def repo_map_walk(
    kg: KnowledgeGraph,
    paths: tuple[str, ...] = ("",),
    depth: int = 1,
    page: int = 1,
    page_size: int = 50,
) -> DataFrame:
    """Reference-shaped repo map: depth-capped walk + paged definition list.

    Reference: repo_map/repository.rs:9-80 (WalkBuilder, max_depth = depth+1
    so files one level below the deepest listed directory are included, depth
    clamped to 3) feeding service.rs:36-101 (definitions for the collected
    files, ORDER BY file/start_line, SKIP/LIMIT). The graph's file_nodes
    already honor ignore rules at index time (S1), so the "walk" is a filter
    over file paths — no filesystem access, fully distributed."""
    depth = min(depth, 3)
    cond = None
    for p in paths:
        p = p.rstrip("/")
        if p in ("", "."):
            c = F.size(F.split(F.col("path"), "/")) <= depth + 1
        else:
            rel = F.expr(f"substring(path, {len(p) + 2})")
            c = F.col("path").startswith(p + "/") & (
                F.size(F.split(rel, "/")) <= depth + 1
            )
        cond = c if cond is None else (cond | c)
    sel = kg.files.filter(cond).select(F.col("path").alias("primary_file_path"))
    return (
        kg.definitions.join(F.broadcast(sel), "primary_file_path", "left_semi")
        .select(
            "fqn",
            "definition_type",
            F.col("primary_file_path").alias("file_path"),
            "start_line",
            "end_line",
        )
        .orderBy("file_path", "start_line", "fqn", "definition_type", "end_line")
        .offset((page - 1) * page_size)
        .limit(page_size)
    )


def repo_map_fs(kg: KnowledgeGraph, root: str, depth: int = 3) -> DataFrame:
    """Filesystem-walk repo map — the reference's actual G9 shape: the tree
    comes from the REAL filesystem (repo_map/repository.rs:9-125: WalkBuilder
    honoring .gitignore + hidden-file defaults, depth clamped to 3), while
    definition counts come from the graph (service.rs:36-101).

    The walk is a metadata-only ``binaryFile`` listing (path/length columns —
    content bytes are never read), filtered by the repo's .gitignore via the
    same JVM-side rlike fold as indexing (S1), so listing and index always
    agree on visibility. Output: one row per directory/file within the depth
    cap with its definition count; files one level below the deepest listed
    directory are included (max_depth = depth+1, as in the reference).
    """
    from knowledge_graph_spark.pipeline.extract import gitignore_filter, load_gitignore

    depth = min(depth, 3)
    spark = kg.spark
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            # \Q..\E-quote the root: a repo path containing regex
            # metacharacters (+, (), [], $) must still strip cleanly
            F.regexp_replace(
                F.col("path"), "^file:\\Q" + root.rstrip("/") + "\\E/", ""
            ).alias("path")
        )
        # ignore-crate default: hidden entries are skipped
        .filter(~F.col("path").rlike(r"(^|/)\."))
    )
    patterns = load_gitignore(root)
    if patterns:
        listing = gitignore_filter(listing, patterns, path_col="path")
    segs = F.split(F.col("path"), "/")
    files = listing.filter(F.size(segs) <= depth + 1).select(
        "path", F.lit("file").alias("entry_type"), (F.size(segs) - 1).alias("depth")
    )
    # every proper path prefix is a directory; depth cap applies to dirs too
    dirs = (
        listing.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(segs) - 1),
                    lambda i: F.slice(segs, F.lit(1), i),
                )
            ).alias("parts")
        )
        .select(F.array_join("parts", "/").alias("path"))
        .distinct()
        .filter(F.size(F.split(F.col("path"), "/")) <= depth)
        .select("path", F.lit("dir").alias("entry_type"), F.size(F.split(F.col("path"), "/")).alias("depth"))
    )
    defs = kg.definitions.groupBy(F.col("primary_file_path").alias("path")).agg(
        F.count(F.lit(1)).alias("n_definitions")
    )
    return (
        files.unionByName(dirs)
        .join(defs, "path", "left_outer")
        .select(
            "path",
            "entry_type",
            "depth",
            F.coalesce("n_definitions", F.lit(0)).alias("n_definitions"),
        )
        .orderBy("path")
    )


def repo_map_walk_sql_cond(paths: tuple[str, ...], depth: int) -> str:
    """DuckDB twin of repo_map_walk's file filter (segment-count depth cap)."""
    depth = min(depth, 3)
    parts = []
    for p in paths:
        p = p.rstrip("/")
        if p in ("", "."):
            parts.append(
                f"(length(path) - length(replace(path,'/','')) + 1 <= {depth + 1})"
            )
        else:
            rel = f"substr(path, {len(p) + 2})"
            parts.append(
                f"(path LIKE '{p}/%' AND "
                f"length({rel}) - length(replace({rel},'/','')) + 1 <= {depth + 1})"
            )
    return " OR ".join(parts)


REPO_MAP_WALK_SQL = """
SELECT d.fqn, d.definition_type, d.primary_file_path AS file_path,
       d.start_line, d.end_line
FROM definition_nodes d
WHERE d.primary_file_path IN (SELECT path FROM file_nodes WHERE {walk_cond})
ORDER BY file_path, start_line, fqn, definition_type, end_line
LIMIT {page_size} OFFSET {offset}
"""


def degree_distribution(kg: KnowledgeGraph) -> DataFrame:
    """Out-degree histogram per node table over every edge table — the G3
    stats family extended to distribution shape (skew visibility: the judge
    of whether a traversal needs salting is exactly this histogram).

    Two cascaded aggregations, both map-side combinable; the second input is
    at most |nodes| rows."""
    deg = (
        kg.all_edges()
        .groupBy("source_table", "source_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy("source_table", "degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("source_table", "degree")
    )


DEGREE_DISTRIBUTION_CTES = """all_e AS (
  SELECT source_table, source_id FROM directory_relationships
  UNION ALL SELECT source_table, source_id FROM file_relationships
  UNION ALL SELECT source_table, source_id FROM definition_relationships
  UNION ALL SELECT source_table, source_id FROM imported_symbol_relationships
),
deg AS (
  SELECT source_table, source_id, count(*) AS degree FROM all_e GROUP BY 1, 2
)"""

DEGREE_DISTRIBUTION_SQL = """
SELECT source_table, degree, count(*) AS n_nodes
FROM deg GROUP BY source_table, degree
ORDER BY source_table, degree
"""
