"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is never sampled with ``rand()`` — re-runs must reproduce the
exact subset (data lineage, eval-set stability), so the pipeline standard is
HASH-ordered selection: order rows by a cryptographic hash of their id and
take the first k. The hash decorrelates the order from ingestion/id order
(md5 is uniform), while staying pure: same inputs → same sample on any
cluster size, any partitioning, any engine (the DuckDB oracle reproduces it
bit-for-bit).

Scale notes: ``stratified_sample`` is one window shuffle partitioned by the
stratum (skewed strata behave because row_number short-circuits per
partition); ``deterministic_sample`` compiles to TakeOrderedAndProject —
per-partition top-k then a k-row driver merge, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(id_col: str):
    return [F.md5(F.col(id_col).cast("string")), F.col(id_col)]


def stratified_sample(
    df: DataFrame,
    strata: str = "lang",
    id_col: str = "doc_id",
    k: int = 25,
    cols: tuple[str, ...] = ("doc_id", "lang", "source", "n_chars"),
) -> DataFrame:
    """First k rows per stratum in md5(id) order — a deterministic uniform
    per-group sample (quota sampling)."""
    w = Window.partitionBy(strata).orderBy(*_hash_order(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(*cols)
        .orderBy(strata, id_col)
    )


def deterministic_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 100,
    cols: tuple[str, ...] = ("doc_id", "lang", "source", "n_chars"),
) -> DataFrame:
    """First k rows corpus-wide in md5(id) order — a deterministic uniform
    global sample."""
    return df.select(*cols).orderBy(*_hash_order(id_col)).limit(k)


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents) t
WHERE rk <= {k}
ORDER BY lang, doc_id
"""

DETERMINISTIC_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
LIMIT {k}
"""


def weighted_mix(
    df: DataFrame,
    quotas: dict[str, int],
    strata: str = "lang",
    id_col: str = "doc_id",
    cols: tuple[str, ...] = ("doc_id", "lang", "source", "n_chars"),
) -> DataFrame:
    """Corpus mixing: deterministic per-stratum quotas (e.g. up-weight en,
    down-weight zh) — the mixing-ratio step of training-corpus construction.

    Same single-window shape as ``stratified_sample`` but with a per-stratum
    quota map instead of one k; strata absent from ``quotas`` are dropped
    (quota 0). Undersized strata yield what they have — re-runs reproduce the
    byte-identical mix at any parallelism.
    """
    qmap = F.create_map(*[F.lit(x) for kv in quotas.items() for x in kv])
    w = Window.partitionBy(strata).orderBy(*_hash_order(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.coalesce(qmap[F.col(strata)], F.lit(0)))
        .select(*cols)
        .orderBy(strata, id_col)
    )


WEIGHTED_MIX_SQL = """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents) t
WHERE rk <= CASE lang {cases} ELSE 0 END
ORDER BY lang, doc_id
"""


def weighted_mix_sql(quotas: dict[str, int]) -> str:
    cases = " ".join(f"WHEN '{k}' THEN {int(v)}" for k, v in quotas.items())
    return WEIGHTED_MIX_SQL.format(cases=cases)
