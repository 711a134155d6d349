"""Profile the sub-2s query tier: wall seconds, Spark job / stage / task
counts per query (statusTracker deltas), at the session's core count.

Usage: python scripts/profile_small.py q1 q2 ...   (default: a spread of
the tier's worst 32-vs-8-core scalers from PERF_r08)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "token_counts",
    "tf_idf",
    "order_priority_rollup",
    "search_with_context",
    "event_type_stats",
    "customer_order_distribution",
    "sessionize",
    "search_xml",
    "repo_map_walk",
    "callees_of",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    from knowledge_graph_spark.session import get_spark
    import __spark_entry__ as entrymod
    from knowledge_graph_spark.persist import (
        persistent_rdd_ids,
        release_persisted_since,
    )

    spark = get_spark("kg-profile-small")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    kg = entrymod._graph(spark, SF_DIR)
    kg.materialize()
    protected = persistent_rdd_ids(spark)
    qs = entrymod.queries()
    st = sc.statusTracker()

    def snap():
        jids = st.getJobIdsForGroup()
        njobs = len(jids)
        nstages = 0
        ntasks = 0
        for j in jids:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si is not None:
                    nstages += 1
                    ntasks += si.numTasks
        return njobs, nstages, ntasks

    print(f"{'query':28s} {'run1':>7s} {'run2':>7s} {'run3':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in names:
        fn = qs[name]
        runs = []
        j0, s0, t0c = snap()
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            runs.append(round(time.time() - t0, 3))
            release_persisted_since(spark, protected, set())
        j1, s1, t1c = snap()
        print(
            f"{name:28s} {runs[0]:7.2f} {runs[1]:7.2f} {runs[2]:7.2f} "
            f"{(j1-j0)//3:5d} {(s1-s0)//3:7d} {(t1c-t0c)//3:6d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
