"""Deduplication operators for training-data pipelines (north-star component):

- exact duplicate grouping (hash groupBy; full text or prefix fingerprint)
- exact n-gram-shingle Jaccard near-dup pairs (inverted-index self-join —
  the scalable *exact* algorithm; no O(n²) pairing)
- MinHash + LSH banding near-dup candidates (probabilistic scale path)
- SimHash bucketing (Hamming-space near-dup blocking)

Scale notes (100 TB): every stage is shuffle-on-key with map-side combine.
The inverted-index join's hot keys are frequent shingles — ``max_doc_freq``
drops shingles present in more than that many documents (standard stop-shingle
cutoff; cost drops from Σf² to bounded). MinHash/SimHash use xxhash64 —
JVM-side, no Python. LSH gives candidates; exact Jaccard re-verification runs
only on candidates (two-phase, like the reference's resolve-then-verify joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shingles(n: int):
    """Distinct n-gram shingles of the space-tokenized text, as array<string>."""
    toks = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def exact_duplicates(docs: DataFrame, prefix_tokens: int = 5) -> DataFrame:
    """Exact duplicate groups by md5 fingerprint of the first N tokens.

    Hash-groupBy dedup: one shuffle on the 16-byte digest; at 100 TB this is
    the cheapest dedup and the digest shuffle is a fraction of input size.
    """
    key = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens)))
    return (
        docs.select(key.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


EXACT_DUPLICATES_SQL = """
SELECT md5(array_to_string(string_split(text, ' ')[1:{n}], ' ')) AS fingerprint,
       count(*) AS n_docs,
       min(doc_id) AS keeper_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1 HAVING count(*) > 1
ORDER BY fingerprint
"""


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, max_doc_freq: int | None = 1000
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted-index self-join.

    shingle→docs index, join within shingle (doc_a < doc_b), count common
    shingles per pair, then |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. This finds
    every qualifying pair exactly — MinHash/LSH below is the probabilistic
    shortcut whose candidates this operator re-verifies.

    ``max_doc_freq`` bounds hot shingles: a shingle appearing in f docs
    contributes f² join rows, so on a real corpus one stop-shingle ("of the
    and") would dominate the whole job. The bound is ON by default — shingles
    above it are dropped from the index (and from the per-doc sizes, so the
    Jaccard denominator sees the same universe). Pass ``None`` only for
    corpora known to be stop-shingle-free.

    The shingle index feeds three subplans (sizes + both join sides), so it
    is cached for the run and released with the final checkpoint — the
    explode-and-slice is the expensive pass, not the join.

    Shingles are carried as xxhash64 LONGS from the explode onward (r8
    optimization, guide §2.3 "narrower types"): the doc-frequency groupBy
    and the inverted-index self-join shuffle 8-byte keys instead of n-word
    strings (~25-40 bytes for 3-grams), and the join's hash/compare work is
    long-equality. Counts are hash-collision-exact in the same sense as
    triangle_count's long keys (~|distinct shingles|²/2⁶⁴ ≈ 1e-7 odds at
    1M shingles; the DuckDB oracle stays string-keyed and hash-matches at
    every checked scale factor). Unlike triangle_count, a collision here
    feeds a pair-similarity THRESHOLD, so a single merge can flip one
    output row — the bet is certified per corpus by
    ``knowledge_graph_spark.audit.audit_shingles`` (distinct shingles vs
    distinct hashes, tests/test_hash_audit.py; collisions become EXPECTED
    past ~2³² distinct shingles — audit before trusting a 1e9+-shingle
    corpus, and fall back to string shingles if it ever reports a merge).
    """
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids

    spark = docs.sparkSession
    before = persistent_rdd_ids(spark)
    sh = (
        docs.select("doc_id", F.explode(_shingles(n)).alias("shingle"))
        .select("doc_id", F.xxhash64("shingle").alias("shingle"))
        .cache()
    )
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.filter(F.col("df") <= max_doc_freq).select("shingle"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    )
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return checkpoint_and_release(spark, before, out)


NGRAM_JACCARD_PAIRS_SQL = """
WITH sh_all AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+{nm1}], ' ')
                 for i in range(1, greatest(len(toks) - {nm1}, 1) + 1)])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
),
sh AS (
  SELECT sh_all.doc_id, sh_all.shingle FROM sh_all
  JOIN (SELECT shingle FROM sh_all GROUP BY shingle
        HAVING count(*) <= {max_doc_freq}) ok USING (shingle)
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       round(CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) >= {threshold}
ORDER BY doc_a, doc_b
"""


def decontaminate(docs: DataFrame, test_docs: DataFrame, n: int = 8) -> DataFrame:
    """Test-set decontamination: flag training documents sharing any word
    n-gram with a held-out evaluation set (the n-gram-overlap protocol used
    to scrub benchmark leakage from LLM training corpora).

    Scale shape: the evaluation set is tiny relative to a 100 TB corpus, so
    its shingle index is BROADCAST; the train side streams through one
    explode + broadcast-hash join + one shuffle for the per-doc rollup. No
    self-join, no all-pairs — cost is linear in corpus size.

    Returns (doc_id, n_hit_shingles, n_test_docs) for contaminated docs.
    Fully lazy — no intermediate is pinned, so there is nothing to release.
    """
    test_sh = test_docs.select(
        F.col("doc_id").alias("test_doc"), F.explode(_shingles(n)).alias("shingle")
    )
    train_sh = docs.select("doc_id", F.explode(_shingles(n)).alias("shingle"))
    return (
        train_sh.join(F.broadcast(test_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_shingles"),
            F.countDistinct("test_doc").alias("n_test_docs"),
        )
        .orderBy("doc_id")
    )


# Oracle: the evaluation set is the 20-token prefix of every doc_id % 97
# doc — a deterministic stand-in for "test questions quoted inside training
# documents"; sources and their planted duplicates are flagged by
# construction.
DECONTAMINATE_SQL = """
WITH test AS (
  SELECT doc_id AS test_doc,
         string_split(text, ' ')[1:{prefix}] AS toks
  FROM documents WHERE doc_id % 97 = 0
),
tsh AS (
  SELECT test_doc, unnest(list_distinct([array_to_string(toks[i:i+{nm1}], ' ')
             for i in range(1, greatest(len(toks) - {nm1}, 1) + 1)])) AS shingle
  FROM test
),
sh AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+{nm1}], ' ')
             for i in range(1, greatest(len(toks) - {nm1}, 1) + 1)])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
)
SELECT doc_id, count(DISTINCT shingle) AS n_hit_shingles,
       count(DISTINCT test_doc) AS n_test_docs
FROM sh JOIN tsh USING (shingle)
GROUP BY doc_id ORDER BY doc_id
"""


def dup_ngram_stats(
    docs: DataFrame, n: int = 8, min_df: int = 2, max_frac_pct: int = 30
) -> DataFrame:
    """Cross-document duplicated n-gram fraction — the corpus-level dedup
    diagnostic used to scrub web-scale training data (the Pile / PaLM-style
    "remove documents dominated by text repeated elsewhere"): for each doc,
    the share of its distinct word n-grams that also occur in at least
    ``min_df`` documents; ``keep`` is false once that share exceeds
    ``max_frac_pct`` percent.

    Scale shape (100 TB): one explode (distinct grams per doc), grams carried
    as xxhash64 longs so the doc-frequency shuffle moves 8-byte keys instead
    of n-word strings, one groupBy for the frequency table, one shuffle join
    back, one per-doc rollup. No self-join, no all-pairs. The keep decision
    is integer cross-multiplication (n_dup*100 <= n*pct) — no float drift
    between engines.
    """
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids

    spark = docs.sparkSession
    before = persistent_rdd_ids(spark)
    # cached: the gram table feeds BOTH the doc-frequency aggregation and
    # the join-back — un-cached, the n-gram explode (the expensive pass,
    # ~n× the corpus tokens) ran twice per call (r8, guide §1.2)
    grams = (
        docs.select("doc_id", F.explode(_shingles(n)).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gh"))
        .cache()
    )
    # _shingles is per-doc distinct, so count(*) per gh = document frequency
    dfs = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    out = (
        grams.join(dfs, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count(F.when(F.col("df") >= min_df, 1)).alias("n_dup_ngrams"),
        )
        .withColumn(
            "keep",
            F.col("n_dup_ngrams") * 100 <= F.col("n_ngrams") * max_frac_pct,
        )
        .orderBy("doc_id")
    )
    return checkpoint_and_release(spark, before, out)


DUP_NGRAM_STATS_SQL = """
WITH grams AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{nm1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
       LATERAL unnest(range(1, greatest(len(toks) - {nm1}, 1) + 1)) u(i)
),
dfs AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(count(*) FILTER (WHERE df >= {min_df}) AS BIGINT) AS n_dup_ngrams,
       count(*) FILTER (WHERE df >= {min_df}) * 100 <= count(*) * {max_frac_pct}
         AS keep
FROM grams JOIN dfs USING (gram)
GROUP BY doc_id ORDER BY doc_id
"""


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 64) -> DataFrame:
    """MinHash signatures: hash each shingle STRING once (xxhash64), then
    derive permutation i as xxhash64(base_hash, seed=i) — an 8-byte rehash —
    and take the per-permutation min over shingles. JVM-side, one explode +
    groupBy with map-side partial mins.

    The naive form hashes the string num_hashes times; string hashing is
    length-proportional while the long rehash is a couple of mixing rounds,
    so this cuts the signature stage's CPU roughly num_hashes-fold on the
    string traversal. Identical shingle sets still get identical signatures
    (the derivation is deterministic per permutation index), which is what
    the planted-copy oracles and the banding recall contract rely on."""
    sh = docs.select("doc_id", F.explode(_shingles(n)).alias("shingle"))
    bh = sh.select("doc_id", F.xxhash64(F.col("shingle")).alias("bh"))
    mins = [
        F.min(F.xxhash64(F.col("bh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return bh.groupBy("doc_id").agg(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band the signature (rows = hashes/bands),
    bucket-join on (band, band-hash), then estimate Jaccard as the fraction
    of agreeing signature components.

    With 64 hashes and 16 bands (r=4), the S-curve crosses ~(1/16)^(1/4)≈0.5 —
    tuned to the same threshold as the exact operator. Probabilistic: the
    candidate set can miss borderline pairs; the exact re-verify joins back
    ``ngram_jaccard_pairs`` on candidates only at 100 TB.
    """
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids

    spark = docs.sparkSession
    before = persistent_rdd_ids(spark)
    rows = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes)
    hcols = [F.col(f"h{i}") for i in range(num_hashes)]
    sig = sig.withColumn("sig", F.array(*hcols)).select("doc_id", "sig")
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)]).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bb")
    # the banded signature table feeds BOTH sides of the self-join — cached,
    # else the whole shingle→64-hash→band pipeline runs twice
    banded = sig.select("doc_id", "sig", band_cols).select(
        "doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    ).cache()
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        .cast("double")
        / F.lit(num_hashes)
    )
    out = (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return checkpoint_and_release(spark, before, out)


def simhash_buckets(docs: DataFrame, n: int = 3, bits: int = 64) -> DataFrame:
    """SimHash per document: sign-sum of per-shingle xxhash64 bits → 64-bit
    fingerprint; documents sharing a fingerprint (or a band of it) are
    near-dup candidates in Hamming space."""
    sh = docs.select("doc_id", F.explode(_shingles(n)).alias("shingle")).withColumn(
        "h", F.xxhash64("shingle")
    )
    def _bitlit(i: int):
        # bit 63 of a signed 64-bit long is the sign bit — 1<<63 overflows
        # Java long as a positive literal, so use its two's-complement value
        v = 1 << i if i < 63 else -(1 << 63)
        return F.lit(v).cast("long")

    bit_sums = [
        F.sum(F.when(F.col("h").bitwiseAND(_bitlit(i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = sh.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, _bitlit(i)).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select("doc_id", fp.alias("simhash")).orderBy("doc_id")


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "vec_a",
    id_b: str = "vec_b",
    max_iter: int = 30,
) -> DataFrame:
    """Near-dup CLUSTERS from a pair list: connected components over the
    pair graph, canonical member = min id per component (the row a dedup
    pass would keep), plus cluster size.

    This is the step after any pair generator (exact Jaccard, MinHash/LSH,
    embedding cosine): near-duplication is transitive in practice (A~B, B~C
    → keep one of {A,B,C}), so pairs alone under-delete. Min-label
    propagation to fixpoint here (pair graphs are tiny relative to the
    corpus — only near-dups appear); at 100 TB component scale, swap in the
    randomized-contraction loop of graph.algorithms.connected_components,
    which shrinks the edge list geometrically per round.

    Output: (member id, canonical_id, cluster_size), one row per document
    that appears in ≥1 pair.
    """
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids

    spark = pairs.sparkSession
    before = persistent_rdd_ids(spark)
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    lab = (
        und.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(F.col("a").alias("node"), F.least("a", "mb").alias("lab"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            und.join(
                lab.select(F.col("node").alias("b"), F.col("lab").alias("nl")), "b"
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nbl"))
            .select(F.col("a").alias("node"), "nbl")
        )
        new = (
            lab.join(nbr, "node", "left_outer")
            .select(
                "node",
                F.least("lab", F.coalesce("nbl", "lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        converged = (
            new.alias("n")
            .join(lab.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .isEmpty()
        )
        lab = new
        if converged:
            break
    w = Window.partitionBy("lab")
    out = lab.select(
        F.col("node").alias("member_id"),
        F.col("lab").alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    ).orderBy("member_id")
    return checkpoint_and_release(spark, before, out)


def _clusters_sql() -> str:
    """DuckDB oracle for dedup_clusters over embedding near-dup pairs:
    transitive closure as a recursive CTE (exact at oracle scale; the Spark
    side is the distributed fixpoint)."""
    from knowledge_graph_spark.beyond.similarity import EMBEDDING_PAIR_CTES

    return (
        "WITH RECURSIVE "
        + EMBEDDING_PAIR_CTES
        + """,
pairs AS (
  SELECT vec_a, vec_b FROM sums
  WHERE dot / (sqrt(na2) * sqrt(nb2)) >= {threshold}
),
und AS (SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION SELECT vec_b, vec_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
lab AS (SELECT a AS member_id, least(a, min(b)) AS canonical_id
        FROM reach GROUP BY a)
SELECT member_id, canonical_id,
       count(*) OVER (PARTITION BY canonical_id) AS cluster_size
FROM lab ORDER BY member_id
"""
    )
