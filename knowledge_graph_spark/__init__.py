"""knowledge_graph_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the GitLab Knowledge Graph ("gkg") reference.

The reference (surveyed in SURVEY.md) is a Rust pipeline + embedded Kuzu graph DB
over code entities. This package re-expresses the same data model and query
surface Spark-first:

- ``schema``     — StructTypes for the 4 node + 4 relationship tables
                   (reference: crates/database/src/schema/init.rs:4-144).
- ``graph``      — the ``KnowledgeGraph`` container: node/edge DataFrames,
                   temp-view registration (raw Spark SQL replaces raw Cypher).
- ``queries``    — the query library: each template of
                   crates/database/src/querying/library.rs as a DataFrame builder.
- ``pipeline``   — the indexing ETL analog (file listing → extraction →
                   graph construction → dense IDs → parquet).
- ``incremental``— diff-based maintenance (anti-join semantics of
                   crates/indexer/src/mutation/changes.rs).
- ``streaming``  — Structured Streaming analog of the FS watcher debounce loop.
- ``beyond``     — LLM-data-pipeline operators past reference parity:
                   dedup, similarity search, text analysis, multimodal columns.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection and AQE; Python UDFs appear only where built-ins cannot
express the semantics (and then always Arrow-batched).
"""

__version__ = "0.1.0"
