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


def test_asof_join_semantics(spark):
    """Nearest-earlier match per key; equal timestamps match (>= rule);
    no prior right row → nulls — mirrors DuckDB ASOF LEFT JOIN."""
    from pyspark.sql import functions as F

    from knowledge_graph_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 5, 50.0)],
        "user_id long, ts long, value double",
    ).withColumn("event_id", F.col("ts"))
    right = spark.createDataFrame(
        [(1, 10, 7, 1.0), (1, 15, 8, 2.0), (2, 9, 9, 3.0)],
        "user_id long, ts long, event_id long, value double",
    )
    out = {
        r.event_id: r.matched_event_id
        for r in asof_join(left, right).collect()
    }
    assert out == {10: 7, 20: 8, 5: None}  # tie at ts=10 matches; ts=5 has no prior


def test_dedup_clusters_transitive(spark):
    """A~B and B~C collapse into ONE cluster with canonical=min id."""
    from knowledge_graph_spark.beyond.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 3), (3, 4), (7, 9)], "vec_a long, vec_b long"
    )
    rows = {(r.member_id, r.canonical_id, r.cluster_size) for r in dedup_clusters(pairs).collect()}
    assert rows == {(2, 2, 3), (3, 2, 3), (4, 2, 3), (7, 7, 2), (9, 7, 2)}


def test_stratified_sample_deterministic(docs):
    from knowledge_graph_spark.beyond.sampling import stratified_sample

    a = stratified_sample(docs, k=5).collect()
    b = stratified_sample(docs, k=5).collect()
    assert a == b
    per = {}
    for r in a:
        per[r.lang] = per.get(r.lang, 0) + 1
    assert all(v <= 5 for v in per.values()) and per


def test_redact_pii_patterns(spark):
    """The pattern set actually catches PII (the driver corpus is clean, so
    the oracle comparison only proves engine parity — this proves recall)."""
    from knowledge_graph_spark.beyond.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk or 555-12-9876 today"),
            (2, "key deadbeefdeadbeefdeadbeefdeadbeef1234 card 4111111111111111"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert rows[1].n_email == 1 and rows[1].n_phone_ssn == 1
    assert rows[2].n_hex_secret == 1 and rows[2].n_card_number == 1
    assert rows[3].n_email == rows[3].n_hex_secret == 0
    # replacement applied: clean text shorter than raw for doc 2
    assert rows[2].clean_chars < len("key deadbeefdeadbeefdeadbeefdeadbeef1234 card 4111111111111111")


def test_chunk_documents_windows(spark):
    from knowledge_graph_spark.beyond.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "only three words")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, size=4, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = [r.chunk_text for r in sorted(by_doc[1], key=lambda r: r.chunk_index)]
    assert c1[0] == "w0 w1 w2 w3" and c1[1] == "w2 w3 w4 w5"
    assert c1[-1].endswith("w9")
    assert by_doc[2][0].chunk_text == "only three words" and len(by_doc[2]) == 1


def test_approx_user_counts_tolerance(spark):
    """HLL sketch accuracy: approx within 5% of exact at rsd=0.02."""
    from knowledge_graph_spark.queries.analytics import approx_user_counts
    from knowledge_graph_spark.io import read_table

    rows = approx_user_counts(read_table(spark, SF_SMALL, "events")).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(2, 0.05 * r.exact_users), r


def test_pack_documents_budget_semantics(spark):
    """Packs fill to the budget: every pack's pre-overflow token start is
    within budget, pack_seq is contiguous per bucket, and assignment is
    deterministic."""
    from knowledge_graph_spark.beyond.text import pack_documents
    from knowledge_graph_spark.io import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    out = pack_documents(docs, budget_tokens=100, n_buckets=4).collect()
    assert {r.bucket for r in out} == {0, 1, 2, 3}
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        seqs = [r.pack_seq for r in rows]
        assert seqs == sorted(seqs)
        # first pack is 0; ids may skip only when a doc overflows a budget
        assert seqs[0] == 0
        # packing accumulates in md5-hash stream order within the bucket
        import hashlib

        cum = 0
        for r in sorted(
            rows, key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id)
        ):
            assert r.pack_seq == cum // 100  # start offset determines pack
            cum += r.n_tokens
    out2 = pack_documents(docs, budget_tokens=100, n_buckets=4).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]


def test_weighted_mix_quotas(spark):
    from knowledge_graph_spark.beyond.sampling import weighted_mix
    from knowledge_graph_spark.io import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    quotas = {"en": 7, "zh": 2}
    out = weighted_mix(docs, quotas).collect()
    by_lang: dict = {}
    for r in out:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang == {"en": 7, "zh": 2}  # other langs dropped (quota 0)
    # deterministic and a subset of the full-k stratified order
    assert out == weighted_mix(docs, quotas).collect()


def test_ngram_jaccard_stop_shingle_bound_prunes(spark):
    """max_doc_freq (on by default) drops hot shingles: two docs whose only
    overlap is a corpus-wide stop-shingle must not pair up."""
    from knowledge_graph_spark.beyond.dedup import ngram_jaccard_pairs

    # every doc shares the stop shingle "of the and"; docs 0/1 also share a
    # rare shingle pair
    rows = [(0, "of the and alpha beta gamma"), (1, "of the and alpha beta gamma")]
    rows += [(i, f"of the and unique{i} x{i} y{i}") for i in range(2, 12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bounded = ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_doc_freq=5)
    got = {(r.doc_a, r.doc_b) for r in bounded.collect()}
    assert got == {(0, 1)}
    # same corpus unbounded: the stop shingle connects everything
    unbounded = ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_doc_freq=None)
    assert unbounded.count() > 1


def test_decontaminate_planted_overlap(spark):
    """A train doc quoting a test doc's 8-gram is flagged with the right
    hit counts; disjoint docs are not."""
    from knowledge_graph_spark.beyond.dedup import decontaminate

    words = "q1 q2 q3 q4 q5 q6 q7 q8"  # one exact 8-gram
    train = spark.createDataFrame(
        [
            (1, f"intro {words} outro filler filler"),  # quotes the test set
            (2, "totally unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame([(100, words)], "doc_id long, text string")
    rows = {r.doc_id: r for r in decontaminate(train, test, n=8).collect()}
    assert set(rows) == {1}
    assert rows[1].n_hit_shingles == 1 and rows[1].n_test_docs == 1


def test_gopher_filter_rules(spark):
    """Each rule fails the doc it should: repetition (low unique fraction),
    shortness, and missing stopwords."""
    from knowledge_graph_spark.beyond.text import gopher_filter

    good = "the a " + " ".join(f"word{i}" for i in range(60))
    repeated = "the " + " ".join("dup" for _ in range(60))
    short = "the tiny doc"
    no_stop = " ".join(f"word{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, good), (2, repeated), (3, short), (4, no_stop)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_filter(df).collect()}
    assert out[1].passes == 1
    assert out[2].passes == 0 and out[2].frac_unique_words < 0.1
    assert out[3].passes == 0 and out[3].n_words == 3
    assert out[4].passes == 0 and out[4].stopword_frac == 0.0


def test_dup_ngram_stats_planted(spark):
    """Two identical docs share every 8-gram (df=2 → keep=false); a unique
    doc has zero duplicated grams; a doc quoting one 8-gram from the pair
    stays under the 30% threshold and keeps."""
    from knowledge_graph_spark.beyond.dedup import dup_ngram_stats

    body = " ".join(f"w{i}" for i in range(20))  # 13 distinct 8-grams
    quote = " ".join(f"w{i}" for i in range(8))  # grams[0] of body
    df = spark.createDataFrame(
        [
            (1, body),
            (2, body),
            (3, "entirely different words " + " ".join(f"u{i}" for i in range(16))),
            (4, quote + " " + " ".join(f"v{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_stats(df, n=8, min_df=2).collect()}
    assert out[1].n_ngrams == 13 and out[1].n_dup_ngrams == 13 and not out[1].keep
    assert out[2].n_dup_ngrams == 13 and not out[2].keep
    assert out[3].n_dup_ngrams == 0 and out[3].keep
    # doc 4 shares exactly the one quoted gram with docs 1/2
    assert out[4].n_dup_ngrams == 1 and out[4].keep


def test_intra_doc_repetition_planted(spark):
    """Hand-counted repetition signals: a doc of one word repeated N times
    maxes every signal; a doc of distinct words zeroes the dup signals; a
    doc with one repeated bigram pins the bigram run counter."""
    from knowledge_graph_spark.beyond.text import intra_doc_repetition

    df = spark.createDataFrame(
        [
            (1, "x x x x x"),                  # 5 words, all same
            (2, "a b c d e"),                  # all distinct
            (3, "a b a b c"),                  # bigram "a b" twice
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in intra_doc_repetition(df).collect()}
    r1 = out[1]
    assert (r1.n_words, r1.top_word_count, r1.n_dup_word_instances) == (5, 5, 4)
    # 4 bigrams, all "x x"
    assert (r1.n_bigrams, r1.top_bigram_count, r1.n_dup_bigram_instances) == (4, 4, 3)
    r2 = out[2]
    assert (r2.top_word_count, r2.n_dup_word_instances) == (1, 0)
    assert (r2.top_bigram_count, r2.n_dup_bigram_instances) == (1, 0)
    r3 = out[3]
    assert r3.top_word_count == 2          # "a" and "b" twice each
    assert r3.n_dup_word_instances == 2    # one extra "a", one extra "b"
    assert r3.n_bigrams == 4               # "a b","b a","a b","b c"
    assert r3.top_bigram_count == 2        # "a b" twice
    assert r3.n_dup_bigram_instances == 1


def test_intra_doc_repetition_shuffle_free(docs):
    """The per-document pass must not shuffle: all signals are higher-order
    functions over the token array, so the only exchange in the plan is the
    final presentation sort."""
    from knowledge_graph_spark.beyond.text import intra_doc_repetition

    plan = (
        intra_doc_repetition(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 1, f"expected at most the final sort exchange:\n{plan}"
