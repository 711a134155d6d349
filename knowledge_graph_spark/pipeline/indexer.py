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

    n_files = kg.files.count()
    n_defs = kg.definitions.count()
    n_imps = kg.imports.count()
    n_rels = sum(kg.edges[k].count() for k in kg.edges)
    dur = time.time() - t0
    per_lang = {
        r["language"]: {"files": r["files"]}
        for r in kg.files.groupBy("language").agg(F.count(F.lit(1)).alias("files")).collect()
    }
    stats = IndexingStats(
        repository_name=repository_name,
        duration_seconds=round(dur, 3),
        total_files=n_files,
        total_definitions=n_defs,
        total_imported_symbols=n_imps,
        total_relationships=n_rels,
        files_per_second=round(n_files / dur, 2) if dur > 0 else 0.0,
        per_language=per_lang,
    )
    return kg, stats
