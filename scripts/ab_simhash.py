"""Interleaved A/B for simhash_buckets: r8's pin_small on the fingerprint
frame (A) vs the r7 un-pinned shape (B). Both variants compute the identical
result (same invariants, same checkpoint_and_release hygiene); only the
eager materialization of the fingerprint frame differs.

One session, alternating A,B,A,B,... with the bench's release+GC discipline
between runs. Usage: python scripts/ab_simhash.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import functions as F

    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.io import read_table
    from knowledge_graph_spark.beyond import dedup as D
    from knowledge_graph_spark.persist import (
        checkpoint_and_release,
        persistent_rdd_ids,
        pin_small,
        release_persisted_since,
    )

    OFFSET = 10_000_000

    def run(spark, sf_dir, pin: bool):
        docs = read_table(spark, sf_dir, "documents")
        planted = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(OFFSET)
        )
        before = persistent_rdd_ids(spark)
        fp = D.simhash_buckets(docs.unionByName(planted))
        if pin:
            fp = pin_small(fp)
        n_rows = fp.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        copies = fp.filter(F.col("doc_id") >= OFFSET).select(
            (F.col("doc_id") - OFFSET).alias("doc_id"),
            F.col("simhash").alias("simhash_copy"),
        )
        matched = fp.join(copies, "doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_planted"),
            F.sum(
                F.when(F.col("simhash") == F.col("simhash_copy"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_planted_cobucket"),
        )
        return checkpoint_and_release(spark, before, n_rows.crossJoin(matched))

    spark = get_spark("kg-ab-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    protected = persistent_rdd_ids(spark)
    results: dict[str, list[float]] = {"pin": [], "nopin": []}
    for r in range(rounds):
        for label, pin in (("nopin", False), ("pin", True)):
            t0 = time.time()
            rows = run(spark, SF_DIR, pin).collect()
            dt = round(time.time() - t0, 3)
            results[label].append(dt)
            release_persisted_since(spark, protected, set())
            spark.sparkContext._jvm.System.gc()
            time.sleep(1)
            print(f"round {r} {label:6s} {dt:7.2f}s  {list(rows[0])}", flush=True)
    for label, runs in results.items():
        med = sorted(runs)[len(runs) // 2]
        print(f"{label}: runs={runs} median={med}")
    spark.stop()


if __name__ == "__main__":
    main()
