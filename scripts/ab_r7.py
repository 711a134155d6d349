"""Interleaved same-session A/B of r7 (verdict commit e9779a3) vs current
implementations, the k_core-style measurement the r8 verdict asked for
(tasks #4/#5): old code is loaded from `git show` as a side module, runs
alternate old,new,old,new,... in ONE session with the bench's
release+GC discipline between runs.

Usage: python scripts/ab_r7.py pagerank [rounds]
       python scripts/ab_r7.py minhash  [rounds]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
R7 = "e9779a3"


def _load_r7(relpath: str, modname: str):
    src = subprocess.check_output(
        ["git", "-C", REPO, "show", f"{R7}:{relpath}"], text=True
    )
    path = f"/tmp/{modname}.py"
    with open(path, "w", encoding="utf-8") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    what = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.persist import (
        persistent_rdd_ids,
        release_persisted_since,
    )

    spark = get_spark(f"kg-ab-{what}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, list[float]] = {"r7": [], "now": []}

    def settle(protected):
        release_persisted_since(spark, protected, set())
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)

    if what == "pagerank":
        import __spark_entry__ as entrymod
        from knowledge_graph_spark.graph import algorithms as anew

        aold = _load_r7("knowledge_graph_spark/graph/algorithms.py", "algorithms_r7")
        kg = entrymod._graph(spark, SF_DIR)
        kg.materialize()
        protected = persistent_rdd_ids(spark)

        def run(mod):
            # the bench entry's shape: one prep shared by exact@3 and the
            # top-20 projection @5 (the session cache amortizes prep across
            # the two entries; here each run pays it once, both sides alike)
            prep = mod.pagerank_exact_prep(kg)
            mod.pagerank_exact(kg, iterations=3, prep=prep).limit(20).collect()
            mod.pagerank_exact(kg, iterations=5, prep=prep).limit(20).collect()

        sides = (("r7", aold), ("now", anew))
    elif what == "minhash":
        from pyspark.sql import functions as F

        from knowledge_graph_spark.beyond import dedup as dnew
        from knowledge_graph_spark.io import read_table

        dold = _load_r7("knowledge_graph_spark/beyond/dedup.py", "dedup_r7")
        docs = read_table(spark, SF_DIR, "documents")
        protected = persistent_rdd_ids(spark)

        def run(mod):
            # the minhash_lsh_pairs bench entry's full computation:
            # candidates + exact ground truth + missed-pair anti-join
            cand = mod.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
            truth = mod.ngram_jaccard_pairs(docs, n=3, threshold=0.9).select(
                "doc_a", "doc_b"
            )
            n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n"))
            n_missed = truth.join(cand, ["doc_a", "doc_b"], "left_anti").agg(
                F.count(F.lit(1)).cast("long").alias("m")
            )
            print("   ", n_truth.crossJoin(n_missed).collect()[0], flush=True)

        sides = (("r7", dold), ("now", dnew))
    else:
        raise SystemExit(f"unknown mode {what}")

    for r in range(rounds):
        for label, mod in sides:
            t0 = time.time()
            run(mod)
            dt = round(time.time() - t0, 3)
            results[label].append(dt)
            settle(protected)
            print(f"round {r} {label:4s} {dt:7.2f}s", flush=True)
    for label, runs in results.items():
        med = sorted(runs)[len(runs) // 2]
        print(f"{label}: runs={runs} median={med}")
    spark.stop()


if __name__ == "__main__":
    main()
