"""Collision audit for the xxhash64 identity domains (r9, verdict task #8).

The graph algorithms and the shingle-keyed dedup operators treat
xxhash64(key) equality as key equality (knowledge_graph_spark/audit.py has
the per-scale birthday bounds). These tests certify the bet on the checked
corpora: distinct-key count == distinct-hash count means every query over
the same data ran collision-free (the hash is deterministic).

The sf1-scale audit (10x replicated corpus, ~1e7 keys) runs via
scripts/scale_run.py's data through the same helpers — recorded in
ROUND_NOTES.md rather than here (building the replica is a multi-minute
job, too heavy for the suite).
"""

from __future__ import annotations

from tests.conftest import SF_MED


def test_graph_node_key_hashes_collision_free(spark):
    import __spark_entry__ as entrymod
    from knowledge_graph_spark.audit import audit_graph_node_keys

    kg = entrymod._graph(spark, SF_MED)
    nk, nh = audit_graph_node_keys(kg)
    assert nk > 0
    assert nk == nh, f"node-key collision: {nk} keys -> {nh} hashes"


def test_shingle_hashes_collision_free(spark):
    from knowledge_graph_spark.audit import audit_shingles
    from knowledge_graph_spark.io import read_table

    docs = read_table(spark, SF_MED, "documents")
    for n in (3, 8):  # ngram_jaccard_pairs / dup_ngram_stats domains
        nk, nh = audit_shingles(docs, n)
        assert nk > 0
        assert nk == nh, f"{n}-gram collision: {nk} keys -> {nh} hashes"
