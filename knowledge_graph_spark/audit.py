"""Collision audit for the xxhash64 identity bet (r9, r8-verdict task #8).

Several operators treat ``xxhash64(key)`` equality as KEY equality so their
shuffles move 8-byte longs instead of wide strings:

- graph node identity ``xxhash64(table, id)`` — connected_components,
  pagerank / pagerank_exact, k_core, label_propagation, triangle_count
  (``graph/algorithms.py``);
- shingle identity ``xxhash64(shingle)`` — ngram_jaccard_pairs (3-gram),
  dup_ngram_stats (8-gram) (``beyond/dedup.py``).

The bet: a 64-bit collision merges two distinct keys. Birthday bound —
P(any collision among k keys) ≈ k²/2⁶⁵; counts seen in this repo's data:

    k = 1e6  (sf0.1 node keys / shingles)   P ≈ 2.7e-8
    k = 1e7  (replicated sf1)               P ≈ 2.7e-6
    k = 1e9  (100 TB-scale shingle corpus)  P ≈ 0.027
    k = 4e9  (≥2³² distinct keys)           P ≈ 0.35 — collisions EXPECTED

So the bet is sound through ~1e8 distinct keys and must be AUDITED beyond
that. These helpers run the one-pass audit the verdict asked for: compare
``count(distinct key)`` against ``count(distinct xxhash64(key))`` over the
exact key domain each operator hashes. Zero difference proves the run was
collision-free (hashing is deterministic, so a clean audit certifies every
query over the same data). Cost is one extra aggregation pass per domain —
run behind a flag/test, never inside the query paths themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_collision_counts(df: DataFrame, *key_cols: str) -> tuple[int, int]:
    """(distinct keys, distinct xxhash64 hashes) over ``key_cols``.
    Equal numbers == no collision in this domain."""
    row = df.agg(
        F.countDistinct(*key_cols).alias("nk"),
        F.countDistinct(F.xxhash64(*key_cols)).alias("nh"),
    ).first()
    return int(row["nk"]), int(row["nh"])


def audit_graph_node_keys(kg) -> tuple[int, int]:
    """The node-identity domain every graph algorithm hashes:
    (table, id) over all edge endpoints."""
    parts = []
    for df in kg.edges.values():
        parts.append(df.select(F.col("source_table").alias("t"), F.col("source_id").alias("i")))
        parts.append(df.select(F.col("target_table").alias("t"), F.col("target_id").alias("i")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return hash_collision_counts(u, "t", "i")


def audit_shingles(docs: DataFrame, n: int) -> tuple[int, int]:
    """The shingle-identity domain ngram_jaccard_pairs (n=3) and
    dup_ngram_stats (n=8) hash: distinct word n-grams of the corpus."""
    from knowledge_graph_spark.beyond.dedup import _shingles

    sh = docs.select(F.explode(_shingles(n)).alias("s"))
    return hash_collision_counts(sh, "s")
