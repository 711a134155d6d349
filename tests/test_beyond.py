"""Beyond-parity operators: properties the oracle comparison can't express —
LSH candidate recall vs the exact operators, simhash locality, ANN containment."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    from knowledge_graph_spark.io import read_table

    return read_table(spark, SF_SMALL, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    from knowledge_graph_spark.io import read_table

    return read_table(spark, SF_SMALL, "embeddings").cache()


def test_minhash_lsh_recall_vs_exact(docs):
    """Every truly-similar pair (jaccard ≥ 0.8) must appear among the LSH
    candidates at threshold 0.5 — the standard two-phase contract."""
    from knowledge_graph_spark.beyond import dedup as D

    exact = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert exact, "fixture should contain high-jaccard near-dups"
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_minhash_estimate_close_to_exact(docs):
    from knowledge_graph_spark.beyond import dedup as D

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    both = set(exact) & set(est)
    assert both
    for pair in both:
        assert abs(exact[pair] - est[pair]) < 0.35, (pair, exact[pair], est[pair])


def test_simhash_near_dups_have_close_fingerprints(docs):
    """Near-identical documents should differ in few simhash bits."""
    from knowledge_graph_spark.beyond import dedup as D

    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    assert pairs
    sims = {r.doc_id: r.simhash for r in D.simhash_buckets(docs).collect()}
    for r in pairs:
        ham = bin((sims[r.doc_a] ^ sims[r.doc_b]) & ((1 << 64) - 1)).count("1")
        assert ham <= 16, (r.doc_a, r.doc_b, ham)


def test_hyperplane_ann_subset_of_brute_force_space(emb, spark):
    """ANN results must be genuine vectors with correct exact scores:
    re-scoring the ANN's returned ids brute-force gives identical cosines."""
    from knowledge_graph_spark.beyond import similarity as SIM
    from pyspark.sql import functions as F

    qv = [float(v) for v in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    ann = SIM.hyperplane_lsh_ann(emb, qv, k=5)
    rows = ann.collect()
    assert rows and rows[0].vec_id == 0  # the query vector itself is its own NN
    ids = [r.vec_id for r in rows]
    exact = {
        r.vec_id: r.cosine
        for r in SIM.cosine_topk(emb.filter(F.col("vec_id").isin(ids)), qv, k=5).collect()
    }
    for r in rows:
        assert exact[r.vec_id] == r.cosine


def test_exact_duplicates_groups_are_real(docs, spark):
    from knowledge_graph_spark.beyond import dedup as D
    from pyspark.sql import functions as F

    groups = D.exact_duplicates(docs, prefix_tokens=5).collect()
    assert groups
    # spot-check one group: its docs share the 5-token prefix verbatim
    g = groups[0]
    prefix = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5))
    members = docs.withColumn("p", prefix).withColumn("h", F.md5("p")).filter(
        F.col("h") == g.fingerprint
    )
    assert members.count() == g.n_docs
    assert members.select("p").distinct().count() == 1
