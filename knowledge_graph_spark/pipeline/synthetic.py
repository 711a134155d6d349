"""Driver-checkable end-to-end pipeline queries over a synthesized corpus.

The D (pipeline), M (mutation) and ST (streaming) operator families have no
natural DuckDB oracle — their inputs are source trees, not tables. To give
them driver-green correctness rows, these queries synthesize a deterministic
Python mini-corpus FROM the ``documents`` table (one file per doc_id, content
a closed-form function of the id), run the real extract→build→incremental
machinery over it, and emit scalar (metric, value) rows. The DuckDB oracle
computes the same metrics directly from ``documents`` arithmetic — any
regression in the extractor, the graph builder's joins, dense-ID assignment,
or the incremental splice breaks the hash match.

This mirrors the reference's own test strategy (index a fixture repo →
assert exact node/edge counts — crates/indexer/src/tests.rs), with the
fixture derived from data so every scale factor checks automatically.

Corpus shape per doc id ``i`` (n = number of docs, i2 = next id cyclically,
a = i%7, b = i%3, g = i//2):

    pkg{a}/sub{b}/mod_{i}.py
        from pkg{i2%7}.sub{i2%3}.mod_{i2} import fn_a_{i2}
        import lib_{i}
        def fn_a_{i}():        x = fn_a_{i2}(); y = pair_{g}_fn()
        def use_lib_{i}():     return lib_{i}()
        def pair_{g}_fn():     (name shared with the partner doc i^1)
        class Cls_{i}:  def meth_{i}(self): return fn_a_{i}()
                        def meth_b_{i}(self): cb = lambda v: v + 1
                                              return self.meth_{i}()
        (the lambda is a Lambda definition node — 7 + i%3 defs per file —
         whose hierarchy edge pins the METHOD_TO_LAMBDA family, D6)
        {i%3 ×}  def extra_{i}_{j}(): return fn_a_{i}()

which exercises: dir hierarchy synthesis (D4), definition maps + hierarchy
edges (D5/D6), unique-name CALLS, shared-name AMBIGUOUSLY_CALLS, and
call-to-import resolution (D7), Python receiver-typed resolution
(`self.meth_{i}()` → the enclosing class's method, python/analyzer.rs
self-call semantics), import-path candidate resolution to files and
definitions (J9/D8), dense ids (D9), and — in the incremental variant —
delete/changed splice with id-head resume (M1-M3, ST5) and cross-file edge
re-keying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_graph_spark.io import read_table

_N_PKG = 7
_N_SUB = 3


def _file_text(i: int, i2: int, version: int = 1) -> str:
    a2, b2, g = i2 % _N_PKG, i2 % _N_SUB, i // 2
    lines = [
        f"from pkg{a2}.sub{b2}.mod_{i2} import fn_a_{i2}",
        f"import lib_{i}",
        "",
        f"def fn_a_{i}():",
        f"    x = fn_a_{i2}()",
        f"    y = pair_{g}_fn()",
        "    return x + y",
        "",
        f"def use_lib_{i}():",
        f"    return lib_{i}()",
        "",
        f"def pair_{g}_fn():",
        "    return 1",
        "",
        f"class Cls_{i}:",
        f"    def meth_{i}(self):",
        f"        return fn_a_{i}()",
        f"    def meth_b_{i}(self):",
        "        cb = lambda v: v + 1",
        f"        return self.meth_{i}()",
    ]
    for j in range(i % 3):
        lines += ["", f"def extra_{i}_{j}():", f"    return fn_a_{i}()"]
    if version == 2:
        lines += ["", f"def changed_{i}():", f"    return fn_a_{i}()"]
    return "\n".join(lines) + "\n"


def _path_of(i: int) -> str:
    return f"pkg{i % _N_PKG}/sub{i % _N_SUB}/mod_{i}.py"


def synth_files(
    spark: SparkSession,
    doc_ids: list[int],
    only_ids: set[int] | None = None,
    version_of=None,
) -> DataFrame:
    """Files DataFrame in list_files' output shape for the given doc ids.

    Generation is driver-side (≤ thousands of tiny strings — this is a test
    fixture synthesizer, not a data path; the machinery under test is the
    distributed extract/build that consumes it)."""
    ordered = sorted(doc_ids)
    nxt = {d: ordered[(k + 1) % len(ordered)] for k, d in enumerate(ordered)}
    rows = []
    for i in ordered:
        if only_ids is not None and i not in only_ids:
            continue
        v = version_of(i) if version_of else 1
        text = _file_text(i, nxt[i], v)
        rows.append(
            (_path_of(i), "py", "Python", len(text.encode()), bytearray(text.encode()))
        )
    return spark.createDataFrame(
        rows, "relative_path string, extension string, language string, length long, content binary"
    )


def _doc_ids(spark: SparkSession, sf_dir: str, limit: int | None = None) -> list[int]:
    """Smallest ``limit`` doc ids (all when None) — sort+limit runs JVM-side,
    so the driver materializes at most ``limit`` rows at ANY scale factor."""
    df = read_table(spark, sf_dir, "documents").select("doc_id")
    if limit is not None:
        df = df.orderBy("doc_id").limit(limit)
    return [r["doc_id"] for r in df.collect()]


def _graph_metrics(kg, probe_path: str) -> DataFrame:
    """(metric, value) rows for node counts, id probes, and per-type edge
    counts — the golden-count contract of the reference's pipeline tests.

    Fused into TWO distributed passes (one per-node-table aggregate over a
    tagged union, one groupBy(type, target_table) over the edge union)
    instead of one job per metric: the 19 metrics are derived lazily from
    the two eagerly-checkpointed tiny aggregates, so a full graph emits 2
    real jobs + 1 trivial finish, not 19 table scans."""
    node_parts = [
        kg.directories.select(
            F.lit("directory_nodes").alias("tbl"), "id", F.lit(False).alias("probe")
        ),
        kg.files.select(
            F.lit("file_nodes").alias("tbl"),
            "id",
            (F.col("path") == probe_path).alias("probe"),
        ),
        # ordering probes: dense ids are keyed by sorted path / (path, byte)
        kg.definitions.select(
            F.lit("definition_nodes").alias("tbl"),
            "id",
            (
                (F.col("primary_file_path") == probe_path)
                & F.col("name").startswith("meth_")
            ).alias("probe"),
        ),
        kg.imports.select(
            F.lit("imported_symbol_nodes").alias("tbl"), "id", F.lit(False).alias("probe")
        ),
    ]
    nodes = node_parts[0]
    for p in node_parts[1:]:
        nodes = nodes.unionByName(p)
    node_agg = (
        nodes.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("id").alias("mx"),
            F.max(F.when(F.col("probe"), F.col("id"))).alias("probe_id"),
        )
        .localCheckpoint(eager=True)
    )
    edges = None
    for name in (
        "directory_relationships",
        "file_relationships",
        "definition_relationships",
        "imported_symbol_relationships",
    ):
        sel = kg.edges[name].select("type", "target_table")
        edges = sel if edges is None else edges.unionByName(sel)
    edge_agg = (
        edges.groupBy("type", "target_table")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )

    def node_m(metric: str, tbl: str, col: str) -> DataFrame:
        return (
            node_agg.filter(F.col("tbl") == tbl)
            .agg(F.max(col).alias("v"))
            .select(F.lit(metric).alias("metric"), F.col("v").cast("long").alias("value"))
        )

    def edge_m(metric: str, t: str, target_table: str | None = None) -> DataFrame:
        d = edge_agg.filter(F.col("type") == t)
        if target_table:
            d = d.filter(F.col("target_table") == target_table)
        return d.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("v")).select(
            F.lit(metric).alias("metric"), F.col("v").cast("long").alias("value")
        )

    parts = [
        node_m("n_directory_nodes", "directory_nodes", "cnt"),
        node_m("n_file_nodes", "file_nodes", "cnt"),
        node_m("n_definition_nodes", "definition_nodes", "cnt"),
        node_m("n_imported_symbol_nodes", "imported_symbol_nodes", "cnt"),
        node_m("max_file_id", "file_nodes", "mx"),
        node_m("max_definition_id", "definition_nodes", "mx"),
        node_m("max_imported_symbol_id", "imported_symbol_nodes", "mx"),
        node_m("probe_file_id", "file_nodes", "probe_id"),
        node_m("probe_meth_def_id", "definition_nodes", "probe_id"),
        edge_m("e_dir_contains_dir", "DIR_CONTAINS_DIR"),
        edge_m("e_dir_contains_file", "DIR_CONTAINS_FILE"),
        edge_m("e_file_defines", "FILE_DEFINES"),
        edge_m("e_file_imports", "FILE_IMPORTS"),
        edge_m("e_class_to_method", "CLASS_TO_METHOD"),
        edge_m("e_method_to_lambda", "METHOD_TO_LAMBDA"),
        edge_m("e_calls_def_def", "CALLS", "definition_nodes"),
        edge_m("e_calls_def_imp", "CALLS", "imported_symbol_nodes"),
        edge_m("e_ambiguously_calls", "AMBIGUOUSLY_CALLS"),
        edge_m("e_imp_to_file", "IMPORTED_SYMBOL_TO_FILE"),
        edge_m("e_imp_to_def", "IMPORTED_SYMBOL_TO_DEFINITION"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("metric")


_SYNTH_KG_CACHE: dict = {}


def _synth_base_graph(spark: SparkSession, sf_dir: str, ids: list[int]):
    """Build (or reuse) the materialized base graph for a doc-id prefix.

    Keyed per (session, sf_dir, corpus size) so pipeline_index_stats and
    incremental_merge_stats share one extract→build when their corpora
    coincide (they do at the driver's correctness scale), and repeat runs
    in one session never rebuild. Tables are cached via materialize();
    build-time intermediates are released immediately."""
    from knowledge_graph_spark.persist import persistent_rdd_ids
    from knowledge_graph_spark.pipeline.build import build_graph_from_entities
    from knowledge_graph_spark.pipeline.extract import extract_entities

    key = (id(spark), sf_dir, len(ids))
    ent = _SYNTH_KG_CACHE.get(key)
    live = persistent_rdd_ids(spark)
    # tables are plain cache()d (lineage intact), so a swept entry would
    # still be CORRECT — but it would silently recompute the whole
    # extract→build per table; rebuild the cache instead
    if ent is not None and ent[1] <= live:
        return ent[0]
    files = synth_files(spark, ids)
    kg = build_graph_from_entities(spark, files, extract_entities(files), "synth")
    # truncate: the base graph is referenced from MANY downstream plans
    # (metric unions, the incremental splice's per-table anti-joins) — with
    # plain cache each reference re-embeds and re-analyzes the whole
    # extract→build subtree, and the driver-side plan work dominates
    kg.materialize(truncate=True, coalesce_to=4)
    for df in getattr(kg, "_cached_intermediates", []):
        df.unpersist()
    kg._cached_intermediates = []
    _SYNTH_KG_CACHE[key] = (kg, persistent_rdd_ids(spark) - live)
    return kg


def pipeline_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1-D9/J7/J9 end-to-end: index the synthesized corpus, emit golden
    counts + id probes.

    Capped at the incremental family's 500 smallest doc ids: the query is a
    fixed-size pipeline-semantics check (same golden-count contract at every
    sf), the cap keeps driver-side corpus synthesis O(1) in sf, and the
    capped corpora now ALWAYS coincide with incremental_merge_stats' — the
    session-cached base graph is shared between the two at every scale."""
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids

    ids = sorted(_doc_ids(spark, sf_dir, limit=INCREMENTAL_MAX_DOCS))
    kg = _synth_base_graph(spark, sf_dir, ids)
    before = persistent_rdd_ids(spark)  # the shared base survives the query
    out = _graph_metrics(kg, _path_of(min(ids)))
    return checkpoint_and_release(spark, before, out)


INCREMENTAL_MAX_DOCS = 500


def incremental_merge_stats(
    spark: SparkSession, sf_dir: str, max_docs: int = INCREMENTAL_MAX_DOCS
) -> DataFrame:
    """M1-M3 + ST5 + D9 resume, driver-checked: index, then apply a
    deterministic FileChanges set (docs id%10==0 changed to a v2 with one
    extra function, id%10==5 deleted), and emit the merged graph's golden
    counts — including max ids, which pin the resume-from-head numbering.

    The corpus is capped at ``max_docs`` (smallest doc ids): the splice is
    a fixed-size end-to-end semantics check, not a throughput probe — the
    ~40 small shuffles it chains are scheduling-overhead-bound, so scaling
    the corpus with sf only inflates bench time without new signal."""
    from knowledge_graph_spark.incremental import apply_file_changes
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids
    from knowledge_graph_spark.pipeline.build import build_graph_from_entities
    from knowledge_graph_spark.pipeline.extract import extract_entities

    ids = sorted(_doc_ids(spark, sf_dir, limit=max_docs))
    changed = {i for i in ids if i % 10 == 0}
    deleted = {i for i in ids if i % 10 == 5}
    # shared, session-cached base build (same graph pipeline_index_stats
    # derives when the corpora coincide); already materialized
    base = _synth_base_graph(spark, sf_dir, ids)
    before = persistent_rdd_ids(spark)
    fresh_files = synth_files(spark, ids, only_ids=changed, version_of=lambda i: 2)
    fresh = build_graph_from_entities(
        spark, fresh_files, extract_entities(fresh_files), "synth"
    )
    # materialize + truncate: the splice references every fresh table several
    # times (anti-joins, remap joins) — without pinning, each reference
    # re-runs the whole upstream DAG; without lineage truncation, each
    # reference re-embeds it in the merged plan and analysis dominates
    fresh.materialize(truncate=True, coalesce_to=4)
    merged = apply_file_changes(
        spark,
        base,
        fresh,
        [_path_of(i) for i in sorted(changed)],
        [_path_of(i) for i in sorted(deleted)],
    ).materialize(truncate=True, coalesce_to=4)
    probe = _path_of(min(i for i in ids if i not in changed and i not in deleted))
    out = _graph_metrics(merged, probe)
    return checkpoint_and_release(spark, before, out)


def debounce_jobs_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1/ST4 batch-twin, driver-checked: synthesize file events from the
    events table (purchase ⇒ deletion), debounce into 3-second
    (project, window) jobs, emit scalar job stats."""
    from knowledge_graph_spark.streaming.watcher import debounced_jobs

    ev = read_table(spark, sf_dir, "events").select(
        F.concat(F.lit("proj"), (F.col("user_id") % 3)).alias("project"),
        F.concat(F.lit("src/f"), (F.col("event_id") % 40), F.lit(".py")).alias("path"),
        F.when(F.col("event_type") == "purchase", F.lit("deleted"))
        .otherwise(F.lit("modified"))
        .alias("change_type"),
        F.col("ts").alias("event_time"),
    )
    jobs = debounced_jobs(ev, window="3 seconds")
    return jobs.select(
        "project",
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n_events",
        F.size("changed_paths").alias("n_changed"),
        F.size("deleted_paths").alias("n_deleted"),
    ).orderBy("project", "window_start_epoch")


# ---------------------------------------------------------------------------
# DuckDB oracles — the same metrics as closed-form arithmetic over documents
# ---------------------------------------------------------------------------

# shared derivation: per-doc corpus facts
_CORPUS_CTE = """corpus AS (
  SELECT doc_id AS i,
         doc_id % 7 AS a, doc_id % 3 AS b,
         printf('pkg%d/sub%d/mod_%d.py', doc_id % 7, doc_id % 3, doc_id) AS path,
         7 + doc_id % 3 AS n_defs,
         lead(doc_id, 1, (SELECT min(doc_id) FROM documents))
           OVER (ORDER BY doc_id) AS i2,
         (CASE WHEN doc_id % 2 = 0 THEN doc_id + 1 ELSE doc_id - 1 END) AS partner
  FROM documents
)"""

PIPELINE_INDEX_STATS_SQL = (
    "WITH "
    # same smallest-ids cap as the Spark side (see pipeline_index_stats)
    + _CORPUS_CTE.replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents ORDER BY doc_id LIMIT {INCREMENTAL_MAX_DOCS})",
    )
    + """,
probe AS (SELECT path FROM corpus WHERE i = (SELECT min(i) FROM corpus)),
m(metric, value) AS (
  SELECT 'n_directory_nodes',
         (SELECT count(DISTINCT a) + count(DISTINCT (a, b)) FROM corpus)
  UNION ALL SELECT 'n_file_nodes', (SELECT count(*) FROM corpus)
  UNION ALL SELECT 'n_definition_nodes', (SELECT sum(n_defs) FROM corpus)
  UNION ALL SELECT 'n_imported_symbol_nodes', (SELECT 2 * count(*) FROM corpus)
  UNION ALL SELECT 'max_file_id', (SELECT count(*) FROM corpus)
  UNION ALL SELECT 'max_definition_id', (SELECT sum(n_defs) FROM corpus)
  UNION ALL SELECT 'max_imported_symbol_id', (SELECT 2 * count(*) FROM corpus)
  UNION ALL SELECT 'probe_file_id',
    (SELECT count(*) + 1 FROM corpus WHERE path < (SELECT path FROM probe))
  UNION ALL SELECT 'probe_meth_def_id',
    (SELECT coalesce(sum(n_defs), 0) + 6 FROM corpus
     WHERE path < (SELECT path FROM probe))
  UNION ALL SELECT 'e_dir_contains_dir', (SELECT count(DISTINCT (a, b)) FROM corpus)
  UNION ALL SELECT 'e_dir_contains_file', (SELECT count(*) FROM corpus)
  UNION ALL SELECT 'e_file_defines', (SELECT sum(n_defs) FROM corpus)
  UNION ALL SELECT 'e_file_imports', (SELECT 2 * count(*) FROM corpus)
  UNION ALL SELECT 'e_class_to_method', (SELECT 2 * count(*) FROM corpus)
  -- the lambda inside meth_b: one METHOD_TO_LAMBDA hierarchy edge per file
  UNION ALL SELECT 'e_method_to_lambda', (SELECT count(*) FROM corpus)
  -- def→def CALLS: meth→fn_a (1) + meth_b→meth via self-receiver (1) +
  -- extras→fn_a (i%3) + cross-file fn_a→fn_a_{i2}; a partner-less pair
  -- call (odd corpus tail) has one candidate and lands here instead of
  -- AMBIGUOUSLY_CALLS
  UNION ALL SELECT 'e_calls_def_def',
    (SELECT sum(3 + i % 3
                + (CASE WHEN partner IN (SELECT i FROM corpus) THEN 0 ELSE 1 END))
     FROM corpus)
  -- use_lib body calls lib_{i}(): resolves to the same-file import
  UNION ALL SELECT 'e_calls_def_imp', (SELECT count(*) FROM corpus)
  -- pair_{g}_fn call: 2 same-name candidates (partner doc), 2 edges per site
  UNION ALL SELECT 'e_ambiguously_calls',
    (SELECT sum(CASE WHEN partner IN (SELECT i FROM corpus) THEN 2 ELSE 0 END)
     FROM corpus)
  UNION ALL SELECT 'e_imp_to_file', (SELECT count(*) FROM corpus)
  UNION ALL SELECT 'e_imp_to_def', (SELECT count(*) FROM corpus)
)
SELECT metric, CAST(value AS BIGINT) AS value FROM m ORDER BY metric
"""
)

INCREMENTAL_MERGE_STATS_SQL = (
    "WITH "
    # the replace caps BOTH references (the CTE scan and the lead() default's
    # min subquery) to the same smallest-ids corpus the Spark side builds
    + _CORPUS_CTE.replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents ORDER BY doc_id LIMIT {INCREMENTAL_MAX_DOCS})",
    )
    + """,
k AS (
  SELECT c.*,
         (i % 10 = 0) AS is_ch, (i % 10 = 5) AS is_del,
         (i2 % 10 = 5) AS nxt_del,
         (partner % 10 = 5) AS partner_del
  FROM corpus c
),
probe AS (
  SELECT path FROM k WHERE NOT is_ch AND NOT is_del
  ORDER BY i LIMIT 1
),
m(metric, value) AS (
  SELECT 'n_directory_nodes',
         (SELECT count(DISTINCT a) + count(DISTINCT (a, b)) FROM k)
  UNION ALL SELECT 'n_file_nodes', (SELECT count(*) FROM k WHERE NOT is_del)
  UNION ALL SELECT 'n_definition_nodes',
    (SELECT sum(CASE WHEN is_del THEN 0
                     WHEN is_ch THEN n_defs + 1 ELSE n_defs END) FROM k)
  UNION ALL SELECT 'n_imported_symbol_nodes',
    (SELECT 2 * count(*) FROM k WHERE NOT is_del)
  -- id heads resume at base max + renumbered fresh rows (M3)
  UNION ALL SELECT 'max_file_id',
    (SELECT count(*) FROM k) + (SELECT count(*) FROM k WHERE is_ch)
  UNION ALL SELECT 'max_definition_id',
    (SELECT sum(n_defs) FROM k) + (SELECT sum(n_defs + 1) FROM k WHERE is_ch)
  UNION ALL SELECT 'max_imported_symbol_id',
    (SELECT 2 * count(*) FROM k) + (SELECT 2 * count(*) FROM k WHERE is_ch)
  UNION ALL SELECT 'probe_file_id',
    (SELECT count(*) + 1 FROM k WHERE path < (SELECT path FROM probe))
  UNION ALL SELECT 'probe_meth_def_id',
    (SELECT coalesce(sum(n_defs), 0) + 6 FROM k
     WHERE path < (SELECT path FROM probe))
  UNION ALL SELECT 'e_dir_contains_dir', (SELECT count(DISTINCT (a, b)) FROM k)
  UNION ALL SELECT 'e_dir_contains_file', (SELECT count(*) FROM k WHERE NOT is_del)
  UNION ALL SELECT 'e_file_defines',
    (SELECT sum(CASE WHEN is_del THEN 0
                     WHEN is_ch THEN n_defs + 1 ELSE n_defs END) FROM k)
  UNION ALL SELECT 'e_file_imports', (SELECT 2 * count(*) FROM k WHERE NOT is_del)
  UNION ALL SELECT 'e_class_to_method', (SELECT 2 * count(*) FROM k WHERE NOT is_del)
  -- meth_b's lambda: v1 and v2 both carry it; deleted files drop it
  UNION ALL SELECT 'e_method_to_lambda', (SELECT count(*) FROM k WHERE NOT is_del)
  -- unchanged: meth + meth_b (self-receiver) + extras + (cross-file unless
  --            next doc deleted) + (pair self-edge stays AMBIGUOUS, below)
  -- changed (re-derived in fresh, which sees only changed files):
  --   meth + meth_b + extras + changed_{i} + pair-self (1 candidate ⇒
  --   CALLS); the cross-file call resolves to the import instead (below)
  UNION ALL SELECT 'e_calls_def_def',
    (SELECT sum(CASE
       WHEN is_del THEN 0
       WHEN is_ch THEN 4 + i % 3
       ELSE 2 + i % 3 + (CASE WHEN nxt_del THEN 0 ELSE 1 END)
                      + (CASE WHEN partner IN (SELECT i FROM k) THEN 0 ELSE 1 END)
       END) FROM k)
  UNION ALL SELECT 'e_calls_def_imp',
    (SELECT sum(CASE WHEN is_del THEN 0 WHEN is_ch THEN 2 ELSE 1 END) FROM k)
  -- unchanged files keep their 2 AMBIGUOUSLY_CALLS edges unless the partner
  -- doc (same pair name) was deleted (base edge types persist through the
  -- splice — only the partner EDGE drops, the self edge stays AMBIGUOUS);
  -- changed files re-derive in fresh where the pair name is unique ⇒ CALLS
  UNION ALL SELECT 'e_ambiguously_calls',
    (SELECT sum(CASE WHEN is_del OR is_ch THEN 0
                     WHEN partner NOT IN (SELECT i FROM k) THEN 0
                     WHEN partner_del THEN 1
                     ELSE 2 END) FROM k)
  -- import resolution: only unchanged files keep imp→file/imp→def (fresh
  -- re-resolution cannot see unchanged target files), and only if the
  -- imported module's doc survived
  UNION ALL SELECT 'e_imp_to_file',
    (SELECT count(*) FROM k WHERE NOT is_del AND NOT is_ch AND NOT nxt_del)
  UNION ALL SELECT 'e_imp_to_def',
    (SELECT count(*) FROM k WHERE NOT is_del AND NOT is_ch AND NOT nxt_del)
)
SELECT metric, CAST(value AS BIGINT) AS value FROM m ORDER BY metric
"""
)

DEBOUNCE_JOBS_STATS_SQL = """
WITH ev AS (
  SELECT printf('proj%d', user_id % 3) AS project,
         printf('src/f%d.py', event_id % 40) AS path,
         (CASE WHEN event_type = 'purchase' THEN 'deleted' ELSE 'modified' END)
           AS change_type,
         ts
  FROM events
)
SELECT project,
  -- NB: DuckDB's // on DOUBLE (epoch returns DOUBLE) is plain division,
  -- not floor division — floor() explicitly
  CAST(floor(epoch(ts) / 3) AS BIGINT) * 3 AS window_start_epoch,
  count(*) AS n_events,
  CAST(least(count(DISTINCT CASE WHEN change_type <> 'deleted' THEN path END),
             8192) AS INT) AS n_changed,
  CAST(least(count(DISTINCT CASE WHEN change_type = 'deleted' THEN path END),
             8192) AS INT) AS n_deleted
FROM ev
GROUP BY project, CAST(floor(epoch(ts) / 3) AS BIGINT) * 3
ORDER BY project, window_start_epoch
"""


# ---------------------------------------------------------------------------
# workspace_index_stats — S1 S2 S3 S6 S7 S8 M4 M5 D11 UDF-b driver-checked
# ---------------------------------------------------------------------------

WORKSPACE_MAX_DOCS = 80

# fixed multi-language files (UDF-b: one per non-Python analyzer family),
# each with hand-counted definitions/imports baked into the oracle
_LANG_FILES = {
    "app/user.rb": (
        "# class Hidden (comment must not extract)\n"
        "require 'json'\n"
        "class Account < Base\n"  # NOT `User` — the Kotlin resolver corpus
        "  def activate!\n"       # below defines User; a same-name Ruby class
        "    Mailer.send_welcome\n"  # would turn its ctor pins ambiguous
        "  end\n"
        "end\n"
    ),  # defs: Account, activate! (2); imports: json (1)
    "web/app.ts": (
        "import { Widget } from './lib';\n"
        "export class App {\n"
        "  run(): void {\n"
        "    this.start();\n"
        "  }\n"
        "  start(): void {\n"
        "  }\n"
        "}\n"
    ),  # defs: App, run, start (3); imports: Widget (1)
    "jvm/Main.kt": (
        "package demo\n"
        "import org.demo.Lib\n"
        "class Tool {\n"
        "    fun use() {\n"
        "    }\n"
        "}\n"
        "fun main() {\n"
        "}\n"
    ),  # defs: Tool, use, main (3); imports: Lib (1)
    "jvm/App.java": (
        "package demo;\n"
        "import java.util.List;\n"
        "public class App {\n"
        "    public void run() {\n"
        "    }\n"
        "}\n"
    ),  # defs: App, run (2); imports: List (1)
}
_LANG_FILE_DEFS = 10
_LANG_FILE_IMPORTS = 4

# Kotlin resolver mini-corpus, folded into the workspace corpus (it was a
# standalone kotlin_resolution_stats query through round 3; one indexed
# corpus instead of two retires its ~10 s/run fixed scheduling cost while
# keeping every pin — and, being checked on the READ-BACK graph, now also
# proves call edges survive the parquet round-trip). Exercises the resolver
# paths the reference's kotlin/tests.rs asserts: package FQNs, interface
# inheritance, when-branch type unification to the least common ancestor
# (expression_resolver.rs:352-363,1560-1599), extension functions with
# receiver-free FQNs, extension-property result types carrying one member
# hop, and cross-file constructor resolution. Every kt_* metric is a
# hand-counted constant (the corpus is fixed), the same strategy as the
# reference's fixture tests.
_KT_CORPUS = {
    "ktres/entities/Person.kt": (
        "package corp.entities\n"
        "\n"
        "interface Person {\n"
        "    fun getName(): String\n"
        "}\n"
        "\n"
        "class User : Person {\n"
        "    override fun getName(): String {\n"
        "        return \"user\"\n"
        "    }\n"
        "}\n"
        "\n"
        "class Admin : Person {\n"
        "    override fun getName(): String {\n"
        "        return \"admin\"\n"
        "    }\n"
        "}\n"
    ),
    "ktres/app/Main.kt": (
        "package corp.app\n"
        "\n"
        "import corp.entities.Admin\n"
        "import corp.entities.Person\n"
        "import corp.entities.User\n"
        "\n"
        "class Config(val mode: String) {\n"
        "    val kind: String = \"a\"\n"
        "    constructor() : this(\"std\")\n"
        "}\n"
        "\n"
        "fun pick(cfg: Config) {\n"
        "    val p = when (cfg.kind) {\n"
        "        \"admin\" -> Admin()\n"
        "        else -> User()\n"
        "    }\n"
        "    p.getName()\n"
        "}\n"
        "\n"
        "fun direct() {\n"
        "    val u = User()\n"
        "    u.getName()\n"
        "}\n"
    ),
    "ktres/ext/Ext.kt": (
        "package corp.ext\n"
        "\n"
        "import corp.entities.User\n"
        "\n"
        "fun User.shout() {\n"
        "    return\n"
        "}\n"
        "\n"
        "val User.twin\n"
        "    get() = User()\n"
        "\n"
        "fun useExt() {\n"
        "    val u = User()\n"
        "    u.shout()\n"
        "    u.twin.shout()\n"
        "}\n"
    ),
}
# hand-counted: Person, Person.getName, User, User.getName, Admin,
# Admin.getName (6) + Config, Config.mode [primary-ctor val → Property,
# r7], Config.kind [Property, r6], Config.<init> [secondary constructor,
# r7], pick, direct (6) + shout, twin [extension Property, r6], useExt
# (3) = 15; imports 3+1 = 4. Function-body vals (p, u) are LocalVariable
# in the reference — not indexed (kotlin/analyzer.rs simplify → None), so
# not counted; the plain `this("std")` delegation is syntax, not a call.
_KT_CORPUS_DEFS = 15
_KT_CORPUS_IMPORTS = 4


def workspace_index_stats(
    spark: SparkSession, sf_dir: str, max_docs: int = WORKSPACE_MAX_DOCS
) -> DataFrame:
    """End-to-end workspace orchestration over a REAL on-disk corpus:
    the synthesized Python corpus plus one fixture file per other language
    family is written to a temp directory, then indexed through the full
    list_files (S1 enumeration + S2 bounded read) → extract → build →
    parquet write → read-back (S3/S6/S7) path by the two-project
    index_workspace loop (D11), with one registered project pointing at a
    missing directory (error isolation). A second reindex pass overwrites
    in place (S8 force-new / M4 / M5) — if overwrite appended instead of
    replacing, every node count below would double and the hash would
    fail. Emits (metric, value) rows with a closed-form documents oracle."""
    import os
    import shutil
    import tempfile

    from knowledge_graph_spark.graph.model import KnowledgeGraph
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids
    from knowledge_graph_spark.workspace import (
        ERROR,
        INDEXED,
        WorkspaceManager,
        index_workspace,
    )

    ids = sorted(_doc_ids(spark, sf_dir, limit=max_docs))
    nxt = {d: ids[(k + 1) % len(ids)] for k, d in enumerate(ids)}

    before = persistent_rdd_ids(spark)
    base = tempfile.mkdtemp(prefix="kg-ws-")
    try:
        ws_dir = os.path.join(base, "ws")
        good = os.path.join(ws_dir, "proj_good")
        bad = os.path.join(ws_dir, "proj_missing")  # never created
        for i in ids:
            p = os.path.join(good, _path_of(i))
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "w", encoding="utf-8") as f:
                f.write(_file_text(i, nxt[i]))
        for rel, content in {**_LANG_FILES, **_KT_CORPUS}.items():
            p = os.path.join(good, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "w", encoding="utf-8") as f:
                f.write(content)

        mgr = WorkspaceManager(os.path.join(base, "data"))
        mgr.register_project(ws_dir, good)
        mgr.register_project(ws_dir, bad)
        ev1, _ = index_workspace(spark, mgr, ws_dir)
        ev2, _ = index_workspace(spark, mgr, ws_dir, reindex=True)

        infos = {p.project_path: p for p in mgr.list_all_projects()}
        kg = KnowledgeGraph.read(spark, infos[good].graph_dir, "proj_good")

        # Kotlin resolver pins over the READ-BACK graph (formerly the
        # standalone kotlin_resolution_stats query): FQN-keyed CALLS counts
        # proving when-branch LCA unification, extension membership + the
        # extension-property hop, and cross-file ctor resolution — plus
        # .kt-scoped totals pinning FQN assembly. One collect over the
        # persisted tables.
        d = kg.definitions.select("id", "fqn", "primary_file_path")
        kt_rel_df = (
            kg.edges["definition_relationships"]
            .filter(
                F.col("type").isin("CALLS", "AMBIGUOUSLY_CALLS")
                & (F.col("target_table") == "definition_nodes")
            )
            .join(
                d.select(
                    F.col("id").alias("source_id"),
                    F.col("primary_file_path").alias("src_file"),
                ),
                "source_id",
            )
            .filter(F.col("src_file").endswith(".kt"))
            .join(d.select(F.col("id").alias("target_id"), "fqn"), "target_id")
            .select("type", "fqn")
        )
        # the post-index stat reads are ~7 independent tiny jobs — submit
        # concurrently (r7 verdict task #2: sequential tiny jobs dominate
        # this query's wall time, each carrying fixed scheduler latency)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(7) as ex:
            f_lang = ex.submit(
                kg.files.groupBy("language").agg(F.count(F.lit(1)).alias("n")).collect
            )
            f_files = ex.submit(kg.files.count)
            f_defs = ex.submit(kg.definitions.count)
            f_imps = ex.submit(kg.imports.count)
            f_ktrel = ex.submit(kt_rel_df.collect)
            f_ktdefs = ex.submit(
                d.filter(F.col("primary_file_path").endswith(".kt")).count
            )
            f_ktimps = ex.submit(
                kg.imports.filter(F.col("file_path").endswith(".kt")).count
            )
            lang_counts = {r["language"]: r["n"] for r in f_lang.result()}
            n_files, n_defs, n_imps = f_files.result(), f_defs.result(), f_imps.result()
            kt_rel = [(r["type"], r["fqn"]) for r in f_ktrel.result()]
            kt_defs, kt_imps = f_ktdefs.result(), f_ktimps.result()
        kt_calls = sum(1 for t, _ in kt_rel if t == "CALLS")

        def _n_to(fqn: str) -> int:
            return sum(1 for t, f in kt_rel if t == "CALLS" and f == fqn)

        def _evc(events, etype, status):
            return sum(1 for e in events if e["type"] == etype and e["status"] == status)

        rows = [
            ("kt_defs", kt_defs),
            ("kt_imports", kt_imps),
            ("kt_calls_edges", kt_calls),
            ("kt_ambiguous_edges", len(kt_rel) - kt_calls),
            ("kt_calls_person_getname", _n_to("corp.entities.Person.getName")),
            ("kt_calls_ext_shout", _n_to("corp.ext.shout")),
            ("kt_calls_user_ctor", _n_to("corp.entities.User")),
            ("n_file_nodes", n_files),
            ("n_definition_nodes", n_defs),
            ("n_imported_symbol_nodes", n_imps),
            ("n_files_python", lang_counts.get("Python", 0)),
            ("n_files_ruby", lang_counts.get("Ruby", 0)),
            ("n_files_typescript", lang_counts.get("TypeScript", 0)),
            ("n_files_kotlin", lang_counts.get("Kotlin", 0)),
            ("n_files_java", lang_counts.get("Java", 0)),
            ("n_projects_indexed", sum(1 for p in infos.values() if p.status == INDEXED)),
            ("n_projects_error", sum(1 for p in infos.values() if p.status == ERROR)),
            ("n_events_index_run", len(ev1)),
            ("n_events_reindex_run", len(ev2)),
            ("n_project_completed_events", _evc(ev1, "ProjectIndexing", "Completed")
             + _evc(ev2, "ProjectReindexing", "Completed")),
            ("n_project_failed_events", _evc(ev1, "ProjectIndexing", "Failed")
             + _evc(ev2, "ProjectReindexing", "Failed")),
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    out = spark.createDataFrame(rows, "metric string, value long").orderBy("metric")
    return checkpoint_and_release(spark, before, out)


WORKSPACE_INDEX_STATS_SQL = (
    "WITH "
    + _CORPUS_CTE.replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents ORDER BY doc_id LIMIT {WORKSPACE_MAX_DOCS})",
    )
    + f""",
m(metric, value) AS (
  SELECT 'n_file_nodes', (SELECT count(*) + 7 FROM corpus)
  UNION ALL SELECT 'n_definition_nodes',
    (SELECT sum(n_defs) + {_LANG_FILE_DEFS + _KT_CORPUS_DEFS} FROM corpus)
  UNION ALL SELECT 'n_imported_symbol_nodes',
    (SELECT 2 * count(*) + {_LANG_FILE_IMPORTS + _KT_CORPUS_IMPORTS} FROM corpus)
  UNION ALL SELECT 'n_files_python', (SELECT count(*) FROM corpus)
  UNION ALL SELECT 'n_files_ruby', 1
  UNION ALL SELECT 'n_files_typescript', 1
  UNION ALL SELECT 'n_files_kotlin', 4
  UNION ALL SELECT 'n_files_java', 1
  -- Kotlin resolver pins (jvm/Main.kt's 3 defs + 1 import join the 11/4
  -- of the ktres corpus); hand-counted constants — see _KT_CORPUS
  UNION ALL SELECT 'kt_defs', {3 + _KT_CORPUS_DEFS}
  UNION ALL SELECT 'kt_imports', {1 + _KT_CORPUS_IMPORTS}
  UNION ALL SELECT 'kt_calls_edges', 9
  UNION ALL SELECT 'kt_ambiguous_edges', 0
  UNION ALL SELECT 'kt_calls_person_getname', 1
  UNION ALL SELECT 'kt_calls_ext_shout', 2
  UNION ALL SELECT 'kt_calls_user_ctor', 4
  UNION ALL SELECT 'n_projects_indexed', 1
  UNION ALL SELECT 'n_projects_error', 1
  -- per run: Workspace Started + Failed, Project Started x2, Completed,
  -- Failed (executor.rs loop with error isolation)
  UNION ALL SELECT 'n_events_index_run', 6
  UNION ALL SELECT 'n_events_reindex_run', 6
  UNION ALL SELECT 'n_project_completed_events', 2
  UNION ALL SELECT 'n_project_failed_events', 2
)
SELECT metric, CAST(value AS BIGINT) AS value FROM m ORDER BY metric
"""
)


# ---------------------------------------------------------------------------
# watcher_queue_stats — ST2 ST3 ST6 driver-checked
# ---------------------------------------------------------------------------

WATCHER_MAX_EVENTS = 2000


def watcher_queue_stats(
    spark: SparkSession, sf_dir: str, max_events: int = WATCHER_MAX_EVENTS
) -> DataFrame:
    """The REAL streaming queue end-to-end: file events derived from the
    events table are written as a JSON drop directory, consumed by
    run_debounced_reindex (readStream → debounce window → foreachBatch job
    worker, the reference's queue dispatcher/worker ST3) under an
    availableNow trigger (the schedulable form of ST2's periodic reindex),
    with a checkpoint. A SECOND run over the same checkpoint with no new
    files must produce ZERO jobs (exactly-once dispatch). Lifecycle event
    rows (ST6 vocabulary) are derived from the same job set. Emits
    (metric, value) rows with a closed-form events oracle."""
    import os
    import shutil
    import tempfile

    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids
    from knowledge_graph_spark.streaming.watcher import (
        debounced_jobs,
        lifecycle_events,
        run_debounced_reindex,
    )

    ev = (
        read_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(max_events)
        .select(
            F.concat(F.lit("proj"), (F.col("user_id") % 3)).alias("project"),
            F.concat(F.lit("src/f"), (F.col("event_id") % 40), F.lit(".py")).alias("path"),
            F.when(F.col("event_type") == "purchase", F.lit("deleted"))
            .otherwise(F.lit("modified"))
            .alias("change_type"),
            F.col("ts").alias("event_time"),
        )
    )
    before = persistent_rdd_ids(spark)
    base = tempfile.mkdtemp(prefix="kg-watch-")
    try:
        watch_dir = os.path.join(base, "events")
        # ONE json file -> one micro-batch -> each window emitted exactly once
        ev.coalesce(1).write.json(watch_dir)
        jobs_seen: list[tuple[str, int, int]] = []

        def on_job(project, changed, deleted):
            jobs_seen.append((project, len(changed), len(deleted)))

        cp = os.path.join(base, "cp")
        q = run_debounced_reindex(
            spark, watch_dir, on_job, query_name="kg-watch-stats",
            available_now=True, checkpoint_dir=cp,
        )
        q.awaitTermination()
        run1 = list(jobs_seen)
        jobs_seen.clear()
        # rerun on the same checkpoint, no new files: exactly-once => 0 jobs
        q2 = run_debounced_reindex(
            spark, watch_dir, on_job, query_name="kg-watch-stats-rerun",
            available_now=True, checkpoint_dir=cp,
        )
        q2.awaitTermination()
        rerun = list(jobs_seen)

        # ST6 lifecycle vocabulary from the batch twin of the same job set
        batch_jobs = debounced_jobs(ev)
        n_started = lifecycle_events(batch_jobs).count()

        # ST3 priorities + cancellation (queue/job.rs:6-84, dispatch.rs:88-91,
        # worker.rs:122-138): turn the batch-twin job set into a dispatch log
        # — every debounced window dispatches a Normal-priority
        # ReindexProjectFolderWithWatchedFiles job in (window, project) order
        # — then interleave per-project High-priority jobs: a same-type user
        # reindex LANDING MID-LOG (supersedes every earlier queued job of its
        # type) and a different-type IndexWorkspaceFolder job at the log head
        # (cancels nothing: type-scoped, and nothing of its type precedes it).
        from pyspark.sql import Window

        from knowledge_graph_spark.streaming.watcher import (
            JOB_INDEX_WORKSPACE,
            JOB_REINDEX_PROJECT,
            PRIORITY_HIGH,
            PRIORITY_NORMAL,
            prioritized_queue,
            queue_lifecycle_events,
        )

        # seq spaced ×10 so injected High seqs (…+5) never tie a Normal seq —
        # the supersede rule is strictly-later and ties would be ill-defined.
        # Global row_number is fine here: the dispatch log is a bounded
        # fixed-size frame (one row per debounce window), never data-scale.
        log_n = batch_jobs.select(
            "project",
            F.lit(JOB_REINDEX_PROJECT).alias("job_type"),
            F.lit(PRIORITY_NORMAL).alias("priority"),
            (
                F.row_number().over(Window.orderBy("window_start", "project")) * 10
            ).cast("long").alias("seq"),
        )
        projects = log_n.select("project").distinct()
        mid = log_n.agg(
            (F.floor(F.count(F.lit(1)) / 2) * 10 + 5).cast("long").alias("seq")
        )
        hi_reindex = projects.crossJoin(F.broadcast(mid)).select(
            "project",
            F.lit(JOB_REINDEX_PROJECT).alias("job_type"),
            F.lit(PRIORITY_HIGH).alias("priority"),
            "seq",
        )
        hi_index = projects.select(
            "project",
            F.lit(JOB_INDEX_WORKSPACE).alias("job_type"),
            F.lit(PRIORITY_HIGH).alias("priority"),
            F.lit(5).cast("long").alias("seq"),
        )
        statused = prioritized_queue(
            log_n.unionByName(hi_reindex).unionByName(hi_index)
        )
        qrow = statused.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((F.col("status") == "Cancelled").cast("long")).alias("cancelled"),
            F.sum((F.col("status") == "Pending").cast("long")).alias("pending"),
            F.sum((F.col("priority") == PRIORITY_HIGH).cast("long")).alias("high"),
            F.sum(
                (
                    (F.col("job_type") == JOB_INDEX_WORKSPACE)
                    & (F.col("status") == "Cancelled")
                ).cast("long")
            ).alias("index_cancelled"),
        ).collect()[0]
        n_cancel_events = (
            queue_lifecycle_events(statused)
            .filter(F.col("event_type") == "JobCancelled")
            .count()
        )

        per_proj = {f"proj{k}": 0 for k in range(3)}
        for p, _, _ in run1:
            per_proj[p] = per_proj.get(p, 0) + 1
        rows = [
            ("n_jobs", len(run1)),
            ("n_jobs_proj0", per_proj["proj0"]),
            ("n_jobs_proj1", per_proj["proj1"]),
            ("n_jobs_proj2", per_proj["proj2"]),
            ("total_changed_paths", sum(c for _, c, _ in run1)),
            ("total_deleted_paths", sum(d for _, _, d in run1)),
            ("n_jobs_rerun_no_new_events", len(rerun)),
            ("n_lifecycle_started_events", n_started),
            ("n_queue_jobs_total", qrow["total"]),
            ("n_jobs_cancelled", qrow["cancelled"]),
            ("n_jobs_pending_after_supersede", qrow["pending"]),
            ("n_high_priority_jobs", qrow["high"]),
            # type-scoping pin: the High IndexWorkspaceFolder job cancels
            # nothing and is never itself cancelled (no later High of its type)
            ("n_index_type_jobs_cancelled", qrow["index_cancelled"]),
            ("n_job_cancelled_events", n_cancel_events),
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    out = spark.createDataFrame(rows, "metric string, value long").orderBy("metric")
    return checkpoint_and_release(spark, before, out)


WATCHER_QUEUE_STATS_SQL = f"""
WITH ev AS (
  SELECT printf('proj%d', user_id % 3) AS project,
         printf('src/f%d.py', event_id % 40) AS path,
         (CASE WHEN event_type = 'purchase' THEN 'deleted' ELSE 'modified' END)
           AS change_type,
         ts
  FROM (SELECT * FROM events ORDER BY event_id LIMIT {WATCHER_MAX_EVENTS})
),
jobs AS (
  SELECT project, CAST(floor(epoch(ts) / 3) AS BIGINT) AS w,
         count(DISTINCT CASE WHEN change_type <> 'deleted' THEN path END) AS nc,
         count(DISTINCT CASE WHEN change_type = 'deleted' THEN path END) AS nd
  FROM ev GROUP BY 1, 2
),
-- ST3 dispatch log: Normal reindex job per debounce window, plus per-project
-- High jobs (same-type mid-log + different-type at head) — the supersede rule
-- of dispatch.rs:88-91 / worker.rs:122-138 as a correlated strictly-later
-- EXISTS over (project, job_type)
log AS (
  SELECT project, 'ReindexProjectFolderWithWatchedFiles' AS job_type,
         1 AS priority,
         10 * row_number() OVER (ORDER BY w, project) AS seq
  FROM jobs
  UNION ALL
  SELECT DISTINCT project, 'ReindexProjectFolderWithWatchedFiles', 2,
         10 * CAST(floor((SELECT count(*) FROM jobs) / 2) AS BIGINT) + 5
  FROM jobs
  UNION ALL
  SELECT DISTINCT project, 'IndexWorkspaceFolder', 2, 5 FROM jobs
),
statused AS (
  SELECT l.*, CASE WHEN EXISTS (
      SELECT 1 FROM log l2
      WHERE l2.project = l.project AND l2.job_type = l.job_type
        AND l2.priority = 2 AND l2.seq > l.seq)
    THEN 'Cancelled' ELSE 'Pending' END AS status
  FROM log l
),
m(metric, value) AS (
  SELECT 'n_jobs', (SELECT count(*) FROM jobs)
  UNION ALL SELECT 'n_jobs_proj0', (SELECT count(*) FROM jobs WHERE project = 'proj0')
  UNION ALL SELECT 'n_jobs_proj1', (SELECT count(*) FROM jobs WHERE project = 'proj1')
  UNION ALL SELECT 'n_jobs_proj2', (SELECT count(*) FROM jobs WHERE project = 'proj2')
  UNION ALL SELECT 'total_changed_paths', (SELECT sum(nc) FROM jobs)
  UNION ALL SELECT 'total_deleted_paths', (SELECT sum(nd) FROM jobs)
  UNION ALL SELECT 'n_jobs_rerun_no_new_events', 0
  UNION ALL SELECT 'n_lifecycle_started_events', (SELECT count(*) FROM jobs)
  UNION ALL SELECT 'n_queue_jobs_total', (SELECT count(*) FROM statused)
  UNION ALL SELECT 'n_jobs_cancelled',
    (SELECT count(*) FROM statused WHERE status = 'Cancelled')
  UNION ALL SELECT 'n_jobs_pending_after_supersede',
    (SELECT count(*) FROM statused WHERE status = 'Pending')
  UNION ALL SELECT 'n_high_priority_jobs',
    (SELECT count(*) FROM statused WHERE priority = 2)
  UNION ALL SELECT 'n_index_type_jobs_cancelled',
    (SELECT count(*) FROM statused
     WHERE job_type = 'IndexWorkspaceFolder' AND status = 'Cancelled')
  UNION ALL SELECT 'n_job_cancelled_events',
    (SELECT count(*) FROM statused WHERE status = 'Cancelled')
)
SELECT metric, CAST(value AS BIGINT) AS value FROM m ORDER BY metric
"""




# ---------------------------------------------------------------------------
# lambda_edges_stats — D2/D6 anonymous-function definitions driver-checked
# ---------------------------------------------------------------------------

# Fixed multi-language mini-corpus exercising the LAMBDA/PROC definition
# family and its per-language hierarchy-edge tables
# (relationship.rs:36-66; python/analyzer.rs:1084-1112 Class/Method→Lambda +
# Lambda→Lambda; ruby/analyzer.rs:214-218 Class→Lambda/Proc ONLY — the
# method-scoped arrow lambda in Jobs#run is deliberately edge-LESS, pinned
# by n_lambda_edges_total < n_lambda_defs + n_proc_defs;
# java/analyzer.rs:222-252 Interface/Method→Lambda; kotlin/analyzer.rs:256
# fun→METHOD_TO_LAMBDA; csharp.rs:234-239). Every metric is a hand-counted
# constant over the fixed corpus — closed-form by construction.
_LAMBDA_CORPUS = {
    "py/app.py": (
        "class H:\n"
        "    make = lambda s: s\n"              # CLASS_TO_LAMBDA
        "    def run(self):\n"
        "        f = lambda x: lambda y: x + y\n"  # METHOD_TO_LAMBDA + LAMBDA_TO_LAMBDA
    ),
    "rb/jobs.rb": (
        "class Jobs\n"
        "  GREET = lambda { |n| n }\n"          # CLASS_TO_LAMBDA
        "  PACK = proc { |x| x }\n"             # CLASS_TO_PROC
        "  def run\n"
        "    inner = ->(v) { v }\n"             # Lambda def, NO edge (Ruby Method->Lambda unmapped)
        "  end\n"
        "end\n"
    ),
    "java/Fns.java": (
        "package fx;\n"
        "public interface Cb {\n"
        "    Runnable R = () -> helper();\n"    # INTERFACE_TO_LAMBDA
        "}\n"
        "public class Fns {\n"
        "    public void go() {\n"
        "        exec(t -> t.run());\n"         # METHOD_TO_LAMBDA
        "    }\n"
        "}\n"
    ),
    "kt/Flow.kt": (
        "package fx\n"
        "class Flow {\n"
        "    fun go() {\n"
        "        val f = { x: Int -> x + 1 }\n"  # METHOD_TO_LAMBDA
        "        items.map { it }\n"             # METHOD_TO_LAMBDA (implicit it)
        "    }\n"
        "}\n"
    ),
    "cs/Ops.cs": (
        "namespace fx;\n"
        "public class Ops {\n"
        "    public void Go() {\n"
        "        var q = items.Where(u => u.Active);\n"  # METHOD_TO_LAMBDA
        "    }\n"
        "}\n"
    ),
}


def lambda_edges_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index the fixed lambda corpus through the REAL extract→build pipeline
    and emit exact anonymous-function metrics (corpus fixed ⇒ the oracle is
    the hand-counted constant set, scale-factor-independent)."""
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids
    from knowledge_graph_spark.pipeline.build import build_graph_from_entities
    from knowledge_graph_spark.pipeline.extract import (
        LANGUAGE_BY_EXTENSION,
        extract_entities,
    )

    before = persistent_rdd_ids(spark)
    files = spark.createDataFrame(
        [
            (
                rel,
                rel.rsplit(".", 1)[-1],
                LANGUAGE_BY_EXTENSION[rel.rsplit(".", 1)[-1]],
                len(text.encode()),
                bytearray(text.encode()),
            )
            for rel, text in sorted(_LAMBDA_CORPUS.items())
        ],
        "relative_path string, extension string, language string, length long, content binary",
    )
    kg = build_graph_from_entities(spark, files, extract_entities(files), "lambda-corpus")

    # one aggregate per side: definition_type counts + hierarchy-edge type
    # counts — submitted CONCURRENTLY (r8): both are independent tiny jobs
    # over the just-built graph, and sequential submission paid two full
    # scheduler round-trips on the build-heavy path
    lam_types = [
        "CLASS_TO_LAMBDA",
        "CLASS_TO_PROC",
        "METHOD_TO_LAMBDA",
        "INTERFACE_TO_LAMBDA",
        "LAMBDA_TO_LAMBDA",
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f_defs = ex.submit(
            kg.definitions.groupBy("definition_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect
        )
        f_edges = ex.submit(
            kg.edges["definition_relationships"]
            .filter(F.col("type").isin(lam_types))
            .groupBy("type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect
        )
        def_counts = {r["definition_type"]: r["n"] for r in f_defs.result()}
        edge_counts = {r["type"]: r["n"] for r in f_edges.result()}
    rows = [
        ("n_lambda_defs", def_counts.get("Lambda", 0)),
        ("n_proc_defs", def_counts.get("Proc", 0)),
        ("e_class_to_lambda", edge_counts.get("CLASS_TO_LAMBDA", 0)),
        ("e_class_to_proc", edge_counts.get("CLASS_TO_PROC", 0)),
        ("e_method_to_lambda", edge_counts.get("METHOD_TO_LAMBDA", 0)),
        ("e_interface_to_lambda", edge_counts.get("INTERFACE_TO_LAMBDA", 0)),
        ("e_lambda_to_lambda", edge_counts.get("LAMBDA_TO_LAMBDA", 0)),
        ("n_lambda_edges_total", sum(edge_counts.values())),
    ]
    for df in getattr(kg, "_cached_intermediates", []):
        df.unpersist()
    out = spark.createDataFrame(rows, "metric string, value long").orderBy("metric")
    return checkpoint_and_release(spark, before, out)


LAMBDA_EDGES_STATS_SQL = """
WITH m(metric, value) AS (
  SELECT 'n_lambda_defs', 10
  UNION ALL SELECT 'n_proc_defs', 1
  UNION ALL SELECT 'e_class_to_lambda', 2
  UNION ALL SELECT 'e_class_to_proc', 1
  UNION ALL SELECT 'e_method_to_lambda', 5
  UNION ALL SELECT 'e_interface_to_lambda', 1
  UNION ALL SELECT 'e_lambda_to_lambda', 1
  -- 10 edges vs 11 Lambda/Proc defs: Ruby's method-scoped arrow lambda is
  -- a definition with NO hierarchy edge (ruby/analyzer.rs maps only Class
  -- parents for Lambda/Proc children)
  UNION ALL SELECT 'n_lambda_edges_total', 10
)
SELECT metric, CAST(value AS BIGINT) AS value FROM m ORDER BY metric
"""
