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


def hyperplane_lsh_ann(
    emb: DataFrame, query_vec: list[float], k: int = 10, planes: int = 6, seed: int = 42
) -> DataFrame:
    """LSH-bucketed ANN: sign pattern against ``planes`` pseudo-random
    hyperplanes buckets the vectors; the query's bucket (plus Hamming-1
    neighbors) is re-scored exactly. Probabilistic recall — the exact
    ``cosine_topk`` is the oracle for the bucket's contents.

    Hyperplanes are generated deterministically from ``seed`` via a
    splitmix-style integer mix — no RNG state, reproducible across runs.
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
        d = sum(float(a) * float(b) for a, b in zip(query_vec, hp))
        if d >= 0:
            qb |= 1 << p
    bucketed = emb.withColumn("bucket", sign_bits(F.col("embedding")))
    # query bucket + Hamming-1 neighbor buckets
    cands = [qb] + [qb ^ (1 << p) for p in range(planes)]
    filtered = bucketed.filter(F.col("bucket").isin(cands))
    return cosine_topk(filtered, query_vec, k)
