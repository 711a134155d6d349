"""Skew-resilient join utilities.

AQE's skew-join splitting (on in session.py) handles most skew at runtime by
splitting oversized partitions. Salting is the *plan-level* complement for
the pathological case AQE can't fix: a broadcast-ineligible build side where
single keys exceed executor memory (e.g. one file path owning millions of
definition rows in a monorepo index, one hot shingle in the dedup index).

``salted_join``: the skewed (large, hot-keyed) side gets a random-ish salt in
[0, salt); the small side is exploded ``salt`` times; the join key becomes
(key, salt), spreading each hot key over ``salt`` reducers. Deterministic
salt derivation (hash of a row-unique column) keeps runs reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with ``salt``-way key
    spreading. ``salt_source`` names a column whose hash derives the salt
    deterministically (defaults to every column of ``large`` — stable for
    identical rows)."""
    if salt_source:
        salt_col = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt))
    else:
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt))
    salted_large = large.withColumn("_salt", salt_col.cast("int"))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_large.join(exploded_small, [on, "_salt"], how)
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Diagnostic: per-key row counts + share of total, descending — feeds
    the decision between AQE-only, salting, or a frequency cutoff."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.round(F.col("rows") / F.lit(total), 6))
        .orderBy(F.desc("rows"), key)
        .limit(top)
    )
