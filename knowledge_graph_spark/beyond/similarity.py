"""Similarity search over embedding columns (array<float>) — north-star
component: brute-force cosine top-k as the exact baseline, LSH-bucketed
(random hyperplane) ANN as the scale path.

Engine-determinism: dot products are summed in DECIMAL (exact, order-free) —
each elementwise product is a deterministic IEEE double, cast to
decimal(28,12) and summed without rounding drift; the final score converts
decimal→string→double so Spark and the DuckDB oracle agree bit-for-bit.

Scale notes (100 TB of embeddings): brute-force is one broadcast of the query
vector + a scan (embarrassingly parallel, no shuffle before the final top-k);
the LSH variant buckets by hyperplane signs so queries touch one bucket —
candidates then re-scored exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


def _dec_sum_products(pairs_col):
    """Σ cast(x*y as decimal) over an array<struct<x,y>> — exact, order-free.

    Accumulator is decimal(33,12): wide enough for any unit-scale embedding
    sum, narrow enough that Spark's decimal-addition precision promotion
    (max(p−s)+s+1 = 34) stays under the 38 cap — past the cap Spark silently
    drops a scale digit and the value would round, diverging from the oracle.
    The re-cast to (33,12) is an identity for in-range values (merge output
    type must equal the accumulator type exactly)."""
    return F.aggregate(
        pairs_col,
        F.lit(0).cast("decimal(33,12)"),
        lambda acc, p: (acc + (p["x"] * p["y"]).cast(_DEC)).cast("decimal(33,12)"),
    )


def _norm(col):
    sq = F.transform(col, lambda v: F.struct(v.alias("x"), v.alias("y")))
    return F.sqrt(_dec_sum_products(sq).cast("string").cast("double"))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k against a query vector (brute force baseline).

    The query enters as a literal array (broadcast in the plan); score =
    dot/(|a||q|) with decimal-exact dots; ties broken by vec_id.
    """
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    e = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    pairs = F.zip_with(e, q, lambda x, y: F.struct(x.alias("x"), y.alias("y")))
    dot = _dec_sum_products(pairs).cast("string").cast("double")
    cos = dot / (_norm(e) * _norm(q))
    return (
        emb.select(
            "vec_id",
            "label",
            F.round(cos, 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


# Oracle: the same decimal-exact dot products via unnest + subscripts. The
# query vector is the embedding of the minimum vec_id (self-contained SQL —
# the Spark side resolves the same vector by collecting that row).
COSINE_TOPK_SQL = """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS qv
  FROM embeddings WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
),
qnorm AS (
  SELECT sqrt(CAST(CAST(SUM(CAST(qv * qv AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)) AS nq FROM q
),
parts AS (
  SELECT vec_id, label, CAST(e AS DOUBLE) AS ev, i
  FROM (SELECT vec_id, label, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS i FROM embeddings) t
),
dots AS (
  SELECT p.vec_id, any_value(p.label) AS label,
    CAST(CAST(SUM(CAST(p.ev * q.qv AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS dot,
    sqrt(CAST(CAST(SUM(CAST(p.ev * p.ev AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)) AS na
  FROM parts p JOIN q ON p.i = q.i
  GROUP BY p.vec_id
)
SELECT vec_id, label, round(dot / (na * (SELECT nq FROM qnorm)), 6) AS cosine
FROM dots
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


def _hyperplane_state(
    emb: DataFrame, query_vec: list[float], planes: int, seed: int
):
    """Shared bucketing state for the hyperplane-LSH family: the corpus
    with its sign-pattern ``bucket`` column, the query's bucket, and the
    candidate bucket list (query bucket + Hamming-1 neighbors).

    Hyperplanes are generated deterministically from ``seed`` via a
    splitmix-style integer mix — no RNG state, reproducible across runs.
    The driver-side query bucket uses the same left-to-right double
    accumulation as the Spark-side ``aggregate`` fold, so an exact copy of
    the query vector in the corpus lands in the query's bucket bit-for-bit.
    """
    def mix(a: int) -> float:
        a = (a ^ (a >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        a = (a ^ (a >> 27)) * 0x94D049BB133111EB % (1 << 64)
        a = a ^ (a >> 31)
        return (a % (1 << 53)) / float(1 << 53) - 0.5

    dim = len(query_vec)
    hyper = [[mix(seed * 1_000_003 + p * dim + i) for i in range(dim)] for p in range(planes)]

    def sign_bits(vec_col):
        bits = None
        for p, hp in enumerate(hyper):
            hcol = F.array(*[F.lit(v) for v in hp])
            pairs = F.zip_with(vec_col, hcol, lambda x, y: x.cast("double") * y)
            dot = F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)
            bit = F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
            bits = bit if bits is None else bits.bitwiseOR(bit)
        return bits

    qb = 0
    for p, hp in enumerate(hyper):
        d = 0.0
        for a, b in zip(query_vec, hp):
            d += float(a) * float(b)
        if d >= 0:
            qb |= 1 << p
    bucketed = emb.withColumn("bucket", sign_bits(F.col("embedding")))
    # query bucket + Hamming-1 neighbor buckets
    cands = [qb] + [qb ^ (1 << p) for p in range(planes)]
    return bucketed, qb, cands


def hyperplane_lsh_ann(
    emb: DataFrame, query_vec: list[float], k: int = 10, planes: int = 6, seed: int = 42
) -> DataFrame:
    """LSH-bucketed ANN: sign pattern against ``planes`` pseudo-random
    hyperplanes buckets the vectors; the query's bucket (plus Hamming-1
    neighbors) is re-scored exactly. Probabilistic recall — the exact
    ``cosine_topk`` is the oracle for the bucket's contents.
    """
    bucketed, _qb, cands = _hyperplane_state(emb, query_vec, planes, seed)
    filtered = bucketed.filter(F.col("bucket").isin(cands))
    return cosine_topk(filtered, query_vec, k)


def hyperplane_lsh_invariants(
    emb: DataFrame,
    query_vec: list[float],
    query_id: int,
    k: int = 10,
    planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """SQL-checkable invariants of the hyperplane-LSH pipeline — the ivf
    graduation pattern (similarity.py:329); raw top-k stays available via
    :func:`hyperplane_lsh_ann`. All hold for ANY seed (no recall claim —
    that stays a pytest):

    * ``n_bucketed`` — every corpus vector gets exactly one sign-pattern
      bucket (conservation; oracle: ``count(*)`` of embeddings).
    * ``planted_copy_cobucket`` — ``query_id`` IS the query vector's corpus
      row (an exact planted copy): identical vectors produce identical sign
      bits whatever the hyperplanes, so it must land in the driver-computed
      query bucket. Pinned at 1.
    * ``rescore_violations`` — every returned top-k row re-scored through
      an INDEPENDENT cosine formulation (plain-double fold, no decimal
      accumulator) within 2e-6 of the reported (decimal-exact, 6-dp
      rounded) score. Pinned at 0.
    * ``query_in_topk`` — the query's own bucket is always probed, so the
      exact re-rank must return the planted copy at cosine 1.0. Pinned 1.
    * ``topk_le_k`` — the result is bounded by ``k``. Pinned at 1.
    """
    import math

    from knowledge_graph_spark.persist import (
        checkpoint_and_release,
        persistent_rdd_ids,
        pin_small,
    )

    # Plan shape (r8 optimization): `bucketed` (corpus + 6-hyperplane sign
    # expression) used to be re-executed by three independent metric
    # subplans and `topk` by three more — the sign-bit scan ran ~6x per
    # call. Now `bucketed` is pinned once, its two metrics come from ONE
    # fused aggregation, `topk` (≤k rows) is pinned, and the metric rows
    # are one `stack` over a 1-row crossJoin. Same rows, one pass per
    # subtree (guide §1.2/§2.4).
    spark = emb.sparkSession
    before = persistent_rdd_ids(spark)
    bucketed, qb, cands = _hyperplane_state(emb, query_vec, planes, seed)
    bucketed = pin_small(bucketed)
    filtered = bucketed.filter(F.col("bucket").isin(cands))
    topk = pin_small(cosine_topk(filtered, query_vec, k))
    # independent re-score: plain double arithmetic end-to-end (different
    # accumulator type and no per-term decimal cast vs cosine_topk's path)
    e = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    dot = F.aggregate(
        F.zip_with(e, q, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(
        F.aggregate(F.transform(e, lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v)
    )
    nq = math.sqrt(sum(float(v) * float(v) for v in query_vec))
    rescored = emb.select(
        "vec_id", (dot / (na * F.lit(nq))).alias("cos_indep")
    )
    joined = topk.join(rescored, "vec_id")
    # ONE pass over the pinned corpus scan for both bucket metrics —
    # the planted metric keeps its original empty→NULL semantics via the
    # nested when (no row with vec_id == query_id ⇒ max over NULLs = NULL)
    bucket_agg = bucketed.agg(
        F.count("*").cast("long").alias("n_bucketed"),
        F.max(
            F.when(
                F.col("vec_id") == F.lit(query_id),
                F.when(F.col("bucket") == F.lit(qb), 1).otherwise(0),
            )
        )
        .cast("long")
        .alias("planted_copy_cobucket"),
    )
    viol_agg = joined.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("cosine") - F.col("cos_indep")) > F.lit(2e-6), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("rescore_violations")
    )
    topk_agg = topk.agg(
        F.max(
            F.when(
                (F.col("vec_id") == F.lit(query_id))
                & (F.col("cosine") > F.lit(0.9999985)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("query_in_topk"),
        (F.count("*") <= F.lit(k)).cast("long").alias("topk_le_k"),
    )
    out = (
        bucket_agg.crossJoin(viol_agg)
        .crossJoin(topk_agg)
        .selectExpr(
            "stack(5, 'n_bucketed', n_bucketed,"
            " 'planted_copy_cobucket', planted_copy_cobucket,"
            " 'query_in_topk', query_in_topk,"
            " 'rescore_violations', rescore_violations,"
            " 'topk_le_k', topk_le_k) AS (metric, value)"
        )
        .orderBy("metric")
    )
    return checkpoint_and_release(spark, before, out)


HYPERPLANE_LSH_INVARIANTS_SQL = """
SELECT metric, CAST(value AS BIGINT) AS value FROM (
  SELECT 'n_bucketed' AS metric, (SELECT count(*) FROM embeddings) AS value
  UNION ALL SELECT 'planted_copy_cobucket', 1
  UNION ALL SELECT 'query_in_topk', 1
  UNION ALL SELECT 'rescore_violations', 0
  UNION ALL SELECT 'topk_le_k', 1
) ORDER BY metric
"""


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.99, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by ``block_col``.

    Exact within blocks, vectorized: one ``applyInPandas`` group per block
    computes the block's pairwise dot products in numpy (Arrow batch in, BLAS
    throughput inside), so the JVM never materializes the O(b²) pair rows —
    only the ≥-threshold survivors come back. Blocking bounds the pair space
    (cluster/label/LSH bucket at scale: O(Σ b²) not O(n²)); a block must fit
    one executor's memory, which is the standard IVF/LSH-bucket contract.

    Exactness contract with the DuckDB oracle: every per-element term is
    floor(x·y·1e12) — the floor of a deterministic IEEE double is integral
    and identical in numpy, Spark, and DuckDB — summed in int64 (order-free,
    overflow-safe for unit-scale embeddings), divided by 1e12 at the end.
    The final 6-digit rounding happens Spark-side (F.round), not in numpy,
    so half-way cases round identically to the SQL oracle.
    """
    import pandas as pd

    def per_block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        V = np.asarray(pdf["vec"].tolist(), dtype=np.float64)[order]
        m, _ = V.shape
        if m < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        n2 = np.floor(V * V * 1e12).astype(np.int64).sum(axis=1) / 1e12
        norm = np.sqrt(n2)
        out_a, out_b, out_c = [], [], []
        # row-chunked so the c×m×d product tensor stays ~tens of MB
        chunk = max(1, int(8_000_000 // max(1, m * V.shape[1])))
        for s in range(0, m, chunk):
            A = V[s : s + chunk]
            prod = A[:, None, :] * V[None, :, :]
            dots = np.floor(prod * 1e12).astype(np.int64).sum(axis=2) / 1e12
            # same IEEE op order as the SQL oracle: dot / (norm_a * norm_b)
            cos = dots / (norm[s : s + chunk, None] * norm[None, :])
            ii, jj = np.nonzero(cos >= threshold)
            keep = (ii + s) < jj  # upper triangle: vec_a < vec_b
            out_a.append(ids[ii[keep] + s])
            out_b.append(ids[jj[keep]])
            out_c.append(cos[ii[keep], jj[keep]])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    e = emb.select(
        "vec_id",
        F.col(block_col).alias("blk"),
        F.transform("embedding", lambda v: v.cast("double")).alias("vec"),
    )
    pairs = e.groupBy("blk").applyInPandas(
        per_block, "vec_a long, vec_b long, cosine double"
    )
    return pairs.select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("vec_a", "vec_b")


# shared by EMBEDDING_NEAR_DUP_SQL and dedup.DEDUP_CLUSTERS_SQL
EMBEDDING_PAIR_CTES = """comp2 AS (
  SELECT vec_id, label AS blk, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
sums AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    SUM(CAST(floor(a.x * b.x * 1e12) AS BIGINT)) / 1e12 AS dot,
    SUM(CAST(floor(a.x * a.x * 1e12) AS BIGINT)) / 1e12 AS na2,
    SUM(CAST(floor(b.x * b.x * 1e12) AS BIGINT)) / 1e12 AS nb2
  FROM comp2 a JOIN comp2 b
    ON a.blk = b.blk AND a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)"""

EMBEDDING_NEAR_DUP_SQL = (
    "WITH "
    + EMBEDDING_PAIR_CTES
    + """
SELECT vec_a, vec_b, round(dot / (sqrt(na2) * sqrt(nb2)), 6) AS cosine
FROM sums
WHERE dot / (sqrt(na2) * sqrt(nb2)) >= {threshold}
ORDER BY vec_a, vec_b
"""
)


def _ivf_state(
    emb: DataFrame,
    query_vec: list[float],
    n_centroids: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
):
    """The IVF assignment pipeline, shared by :func:`ivf_ann` and
    :func:`ivf_ann_invariants` — returns (assigned, cents, probe_ids):
    the fully-assigned corpus, the final centroid list, and the n_probe
    nearest cell ids to the query.

    The corpus projection ``e`` is scanned once per Lloyd round plus once
    for the final assignment — pinned (eager localCheckpoint) so each scan
    reads the materialized cast instead of re-reading parquet and re-casting
    (guide §5: reuse-justified persist; released by the callers' persist
    hygiene). The returned ``assigned`` frame is pinned too: both callers
    consume it from ≥2 subplans (candidate filter + invariant re-score),
    which un-pinned re-ran the whole 16-centroid assignment expression per
    consumer."""
    from knowledge_graph_spark.persist import pin_small

    e = pin_small(
        emb.select(
            "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("vec")
        )
    )

    cents = [
        (i, [float(x) for x in r["vec"]])
        for i, r in enumerate(e.orderBy("vec_id").limit(n_centroids).collect())
    ]

    def assign(df, cent_rows):
        # centroids ride a ONE-ROW broadcast DataFrame carrying the whole
        # centroid table as an array<struct> COLUMN, not literal expression
        # trees (r8 optimization): the literal form embedded
        # n_centroids × dim F.lit nodes (~2,000) into every plan and
        # Catalyst re-analyzed that tree on EVERY action — at 2k corpus
        # rows that driver-side plan work WAS the query cost. The one-row
        # crossJoin is a broadcast width-extension (map-only, no shuffle —
        # same plan shape at 100 TB), and the argmin expression over the
        # data column is the exact expression the literal form used, so
        # assignments are bit-identical.
        cdf = df.sparkSession.createDataFrame(
            [([(cid, list(vec)) for cid, vec in cent_rows],)],
            "carr array<struct<cid:int,cv:array<double>>>",
        )
        dist = lambda cv: F.aggregate(  # noqa: E731
            F.zip_with(F.col("vec"), cv, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored = (
            df.crossJoin(F.broadcast(cdf))
            .withColumn(
                "cid",
                F.array_min(
                    F.transform(
                        F.col("carr"),
                        lambda c: F.struct(dist(c["cv"]).alias("d"), c["cid"].alias("cid")),
                    )
                )["cid"],
            )
            .drop("carr")
        )
        return scored

    for _ in range(lloyd_iters):
        assigned = assign(e, cents)
        means = (
            assigned.select("cid", F.posexplode("vec").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ms"))
            .select("cid", F.transform("ms", lambda s: s["m"]).alias("cv"))
            .collect()
        )
        cents = [(r["cid"], [float(x) for x in r["cv"]]) for r in means]

    # nearest n_probe centroids to the query (driver-side: n_centroids tiny)
    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe_ids = [cid for cid, cv in sorted(cents, key=lambda c: d2(c[1], query_vec))[:n_probe]]
    assigned = pin_small(assign(e, cents))
    return assigned, cents, probe_ids


def ivf_ann(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means-lite centroids partition the corpus;
    a query scores only the ``n_probe`` nearest cells, re-ranked exactly.

    Centroid seeding is deterministic (the first ``n_centroids`` vectors by
    vec_id) followed by ``lloyd_iters`` Lloyd rounds computed as DataFrame
    aggregations (component-wise means via posexplode + groupBy). At 100 TB
    the cell assignment is a write-time partition column; queries touch
    n_probe/n_centroids of the data.
    """
    from knowledge_graph_spark.persist import checkpoint_and_release, persistent_rdd_ids

    spark = emb.sparkSession
    before = persistent_rdd_ids(spark)
    assigned, _cents, probe_ids = _ivf_state(
        emb, query_vec, n_centroids, n_probe, lloyd_iters
    )
    cand_ids = assigned.filter(F.col("cid").isin(probe_ids)).select("vec_id")
    cands = emb.join(cand_ids, "vec_id", "left_semi")
    return checkpoint_and_release(spark, before, cosine_topk(cands, query_vec, k))


def ivf_ann_invariants(
    emb: DataFrame,
    query_vec: list[float],
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
) -> DataFrame:
    """SQL-checkable invariants of the IVF pipeline (the graduation pattern
    minhash/simhash used — raw top-k stays available via :func:`ivf_ann`):

    * ``n_assigned`` — every corpus vector lands in exactly one cell
      (conservation; oracle: ``count(*)`` of embeddings).
    * ``assign_violations`` — each row's assigned centroid re-scored as the
      argmin through an INDEPENDENT distance formulation (dot-product
      expansion ``|v|²−2v·c+|c|²`` + struct-sort min instead of the
      assignment's squared-difference + array_min); pinned at 0.
    * ``query_in_topk`` — ``query_id`` is the min-vec_id corpus vector, so
      its own cell is always probed (its centroid is the argmin and probes
      take the ``n_probe`` nearest) and the exact re-rank must return it at
      cosine 1.0, first among ties (min vec_id). Pinned at 1.
    * ``topk_le_k`` — the result is bounded by ``k``. Pinned at 1.

    Plan shape (r8 optimization): the four metrics used to be a union of
    four independent aggregations, each re-executing the full 16-centroid
    assignment subtree (``assigned`` twice, ``topk`` twice — the whole IVF
    pipeline ran ~4x per call). Now ``assigned`` is pinned once
    (_ivf_state), the two assignment metrics come from ONE fused
    aggregation, ``topk`` (≤k rows) is pinned and feeds its two metrics
    plus nothing else, and the metric rows are produced by a single
    ``stack`` over a 1-row crossJoin — same rows, one pass per subtree
    (guide §1.2 "don't compute things you throw away" / §2.4).
    """
    from knowledge_graph_spark.persist import (
        checkpoint_and_release,
        persistent_rdd_ids,
        pin_small,
    )

    spark = emb.sparkSession
    before = persistent_rdd_ids(spark)
    assigned, cents, probe_ids = _ivf_state(
        emb, query_vec, n_centroids, n_probe, lloyd_iters
    )
    # independent re-score: per-centroid squared distance via the expanded
    # dot form, argmin via sorting (d, cid) structs — different arithmetic
    # and different min-selection than the assignment path. Like assign(),
    # the centroid table rides a one-row broadcast as DATA (r8): the
    # literal form re-analyzed ~2,000 expression nodes per action; the
    # per-pair arithmetic below is the identical plain-double chain
    # (|v|² − 2·v·c + |c|², same fold order, cnorm the same Python float),
    # so every distance — and the violation count — is bit-identical.
    cdf_alt = emb.sparkSession.createDataFrame(
        [([(cid, list(cv), float(sum(x * x for x in cv))) for cid, cv in cents],)],
        "carr array<struct<cid:int,cv:array<double>,cnorm:double>>",
    )
    alt = F.transform(
        F.col("carr"),
        lambda c: F.struct(
            (
                F.aggregate(F.col("vec"), F.lit(0.0), lambda acc, x: acc + x * x)
                - 2.0
                * F.aggregate(
                    F.zip_with(F.col("vec"), c["cv"], lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                + c["cnorm"]
            ).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    checked = assigned.crossJoin(F.broadcast(cdf_alt)).withColumn(
        "alt", F.array_sort(alt)
    ).drop("carr").withColumn(
        "viol",
        F.when(
            F.element_at(
                F.filter(F.col("alt"), lambda s: s["cid"] == F.col("cid")), 1
            )["d"]
            > F.col("alt")[0]["d"] + F.lit(1e-6),
            1,
        ).otherwise(0),
    )
    cand_ids = assigned.filter(F.col("cid").isin(probe_ids)).select("vec_id")
    topk = pin_small(cosine_topk(emb.join(cand_ids, "vec_id", "left_semi"), query_vec, k))
    # ONE aggregation pass over `checked` yields both assignment metrics;
    # ONE pass over the pinned ≤k-row topk yields both result metrics
    checked_agg = checked.agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.sum("viol").cast("long").alias("assign_violations"),
    )
    topk_agg = topk.agg(
        F.max(
            F.when(
                (F.col("vec_id") == F.lit(query_id))
                & (F.col("cosine") > F.lit(0.9999985)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("query_in_topk"),
        (F.count("*") <= F.lit(k)).cast("long").alias("topk_le_k"),
    )
    out = (
        checked_agg.crossJoin(topk_agg)
        .selectExpr(
            "stack(4, 'assign_violations', assign_violations,"
            " 'n_assigned', n_assigned,"
            " 'query_in_topk', query_in_topk,"
            " 'topk_le_k', topk_le_k) AS (metric, value)"
        )
        .orderBy("metric")
    )
    return checkpoint_and_release(spark, before, out)


IVF_ANN_INVARIANTS_SQL = """
SELECT metric, CAST(value AS BIGINT) AS value FROM (
  SELECT 'assign_violations' AS metric, 0 AS value
  UNION ALL SELECT 'n_assigned', (SELECT count(*) FROM embeddings)
  UNION ALL SELECT 'query_in_topk', 1
  UNION ALL SELECT 'topk_le_k', 1
) ORDER BY metric
"""
