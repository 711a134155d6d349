"""One-off scale-evidence run: replicate sf0.1 10x into a synthetic sf1 and
measure how the data-sized headline queries scale.

Usage: python scripts/scale_run.py [out_json]

The sf1 set is sf0.1 unioned 10x with per-replica key shifts (every join
key +replica*10^12, so fan-outs and distincts scale honestly instead of
collapsing); region/nation stay unreplicated (they are broadcast dims at
every scale, like the real TPC-H spec). Written to /tmp/kg_scale_sf1 (NOT
/root/testdata, which is read-only). Fixed-size semantics checks
(incremental/workspace/watcher/kotlin corpora, XML page renders) are
excluded by design — their cost does not scale with data.

Output: one JSON line {query: {"sf0.1": s, "sf1": s, "exponent": e}} where
e = log10(t_sf1 / t_sf01); e == 1 is linear scaling, < 1 sublinear. The
table lands in ROUND_NOTES.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/kg_scale_sf1"
REPLICAS = 10
SHIFT = 10**12

# per-table join-key columns to shift per replica
KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": None,  # broadcast dims: copied, not replicated
    "region": None,
}

# data-sized headline queries (fixed-size semantics checks excluded)
QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "sessionize",
    "asof_last_click",
    "ngram_jaccard_pairs",
    "dup_ngram_stats",
    "decontaminate",
    "bm25",
    "cosine_topk",
    "dedup_clusters",
    "triangle_count",
    "k_core_sizes",
    "pagerank_exact",
    "pagerank_top20",
    "connected_components_sizes",
    "lpa_invariants",
    "import_usage_xml",
    # r6: graduated with planted-copy work on top of the fingerprint pass —
    # data-sized, so its exponent belongs in the evidence set
    "simhash_buckets",
    "minhash_lsh_pairs",
    # r7: graduated as invariants (assignment over all rows + independent
    # argmin re-score) — data-sized, linear expected
    "ivf_ann",
    # r9 (verdict task #6: every ≥3 s operator needs a current exponent) —
    # both data-sized: embeddings table / directory tree scale with sf
    "embedding_near_dup",
    "dir_tree_closure",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    os.makedirs(DST, exist_ok=True)
    for t, keys in KEYS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if keys is None:
            out = df
        else:
            parts = []
            for r in range(REPLICAS):
                d = df
                for k in keys:
                    d = d.withColumn(k, F.col(k) + F.lit(r * SHIFT))
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}", flush=True)
    open(os.path.join(DST, "_DONE"), "w").write("ok")


def main() -> None:
    from knowledge_graph_spark.session import get_spark

    import __spark_entry__ as mod

    spark = get_spark("kg-scale-run")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build_sf1(spark)

    from knowledge_graph_spark.persist import (
        persistent_rdd_ids,
        release_persisted_since,
    )

    # optional subset: `scale_run.py out.json q1 q2` re-measures only the
    # named queries and MERGE-updates the artifact (same contract as
    # isolated_bench) — a refresh of changed entries need not re-pay the
    # whole evidence set
    subset = [q for q in sys.argv[2:] if q in set(QUERIES)] or QUERIES

    results: dict[str, dict] = {}
    for sf_dir, label in ((SRC, "sf0.1"), (DST, "sf1")):
        t0 = time.time()
        kg = mod._graph(spark, sf_dir)
        kg.materialize()
        results.setdefault("graph_build", {})[label] = round(time.time() - t0, 2)
        protected = persistent_rdd_ids(spark)
        qs = mod.queries()
        cache_creators = getattr(mod, "SESSION_CACHE_QUERIES", set())
        for name in subset:
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            dt = round(time.time() - t0, 2)
            results.setdefault(name, {})[label] = dt
            print(f"{label} {name}: {dt}s", flush=True)
            if name in cache_creators:
                protected = persistent_rdd_ids(spark)
            else:
                release_persisted_since(spark, protected, set())
            # bench.py's long-session hygiene (r8: k_core at sf1 swung
            # 53 <-> 225 s purely on predecessor debris): shuffle files and
            # broadcast blocks free on JVM GC of their dependencies — force
            # it between heavy samples so each query starts clean
            if dt >= 2.0:
                spark.sparkContext._jvm.System.gc()
                time.sleep(2)

    for name, r in results.items():
        if r.get("sf0.1") and r.get("sf1"):
            r["exponent"] = round(math.log10(max(r["sf1"], 0.01) / max(r["sf0.1"], 0.01)), 2)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_run.json"
    merged: dict = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
