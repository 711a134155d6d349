"""Indexing pipeline orchestration: index a repository directory into a
KnowledgeGraph on parquet, with per-language statistics.

Reference mapping: RepositoryIndexer::index_files (indexer.rs:155-216) +
IndexingExecutor per-project loop (execution/executor.rs:46-145) + D12 stats
finalization (stats.rs:27-90: per-language file/definition/import counts,
duration, files/sec).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from knowledge_graph_spark.graph.model import KnowledgeGraph
from knowledge_graph_spark.pipeline.build import build_graph_from_entities
from knowledge_graph_spark.pipeline.extract import (
    DEFAULT_MAX_FILE_SIZE,
    extract_entities,
    list_files,
)


@dataclass
class IndexingStats:
    repository_name: str
    duration_seconds: float
    total_files: int
    total_definitions: int
    total_imported_symbols: int
    total_relationships: int
    files_per_second: float
    per_language: dict = field(default_factory=dict)
    # the reference reports these two separately (stats.rs WorkspaceStatistics)
    total_definition_relationships: int = 0
    total_imported_symbol_relationships: int = 0


def index_repository(
    spark: SparkSession,
    root: str,
    out_dir: str | None = None,
    repository_name: str = "repo",
    max_file_size: int = DEFAULT_MAX_FILE_SIZE,
) -> tuple[KnowledgeGraph, IndexingStats]:
    """Full index run: enumerate → extract → build → (optionally) write.

    Writing then re-reading the parquet (S3/M4 overwrite semantics) gives the
    queryable at-rest graph, exactly like the reference's write→COPY cycle —
    except the parquet IS the store, no bulk-load step exists.
    """
    t0 = time.time()
    files = list_files(spark, root, max_file_size)
    entities = extract_entities(files)
    kg = build_graph_from_entities(spark, files, entities, repository_name)
    if out_dir:
        kg.write(out_dir)
        # drop intermediate caches NOW: a later re-index of the same path
        # builds plan-identical DataFrames and Spark's plan-equality cache
        # would serve this run's stale content (watcher-loop hazard)
        for df in getattr(kg, "_cached_intermediates", []):
            df.unpersist()
        kg = KnowledgeGraph.read(spark, out_dir, repository_name)

    # stats counts: ~12 independent tiny jobs (3 node counts, 8 edge
    # counts, the per-language rollup) — submit them CONCURRENTLY like
    # write() does its table writes; sequential submission leaves the
    # cluster idle between scheduler round-trips and dominated the
    # workspace-index wall time (r7 verdict task #2: each tiny job carries
    # ~0.2-0.5 s fixed latency on a busy 32-thread local JVM)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(8) as ex:
        f_files = ex.submit(kg.files.count)
        f_defs = ex.submit(kg.definitions.count)
        f_imps = ex.submit(kg.imports.count)
        f_edges = {k: ex.submit(kg.edges[k].count) for k in kg.edges}
        f_lang = ex.submit(
            kg.files.groupBy("language").agg(F.count(F.lit(1)).alias("files")).collect
        )
        n_files = f_files.result()
        n_defs = f_defs.result()
        n_imps = f_imps.result()
        edge_counts = {k: f.result() for k, f in f_edges.items()}
        lang_rows = f_lang.result()
    n_rels = sum(edge_counts.values())
    dur = time.time() - t0
    per_lang = {r["language"]: {"files": r["files"]} for r in lang_rows}
    # per-language definition counts + definition-type breakdown — one
    # aggregated collect over the (small) definition frame; the reference's
    # LanguageStatistics shape (stats.rs:96-139: file_count,
    # definitions_count, definition_type_counts)
    lang_by_path = kg.files.select(F.col("path"), F.col("language"))
    def_lang = (
        kg.definitions.join(
            F.broadcast(lang_by_path),
            kg.definitions.primary_file_path == lang_by_path.path,
            "left",
        )
        .groupBy("language", "definition_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in def_lang:
        lang = r["language"]
        if lang is None or lang not in per_lang:
            continue
        entry = per_lang[lang]
        entry["definitions_count"] = entry.get("definitions_count", 0) + r["n"]
        entry.setdefault("definition_type_counts", {})[r["definition_type"]] = r["n"]
    stats = IndexingStats(
        repository_name=repository_name,
        duration_seconds=round(dur, 3),
        total_files=n_files,
        total_definitions=n_defs,
        total_imported_symbols=n_imps,
        total_relationships=n_rels,
        files_per_second=round(n_files / dur, 2) if dur > 0 else 0.0,
        per_language=per_lang,
        total_definition_relationships=edge_counts.get("definition_relationships", 0),
        total_imported_symbol_relationships=edge_counts.get(
            "imported_symbol_relationships", 0
        ),
    )
    return kg, stats
