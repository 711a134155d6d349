"""Capture the physical plan of ONE pagerank_exact iteration update (the
contribs join + rank rebuild), un-checkpointed — the per-iteration shuffles
are what the long-key optimization targets; the query's own final plan only
shows the eager checkpoint scans.

Usage: python scripts/capture_pagerank_iter_plan.py <suffix>
Writes plans/r08/pagerank_iteration_<suffix>.txt.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08"
)


def main() -> None:
    suffix = sys.argv[1]
    os.makedirs(OUT_DIR, exist_ok=True)
    from pyspark.sql import functions as F

    from knowledge_graph_spark.session import get_spark
    import __spark_entry__ as entrymod
    from knowledge_graph_spark.graph.algorithms import pagerank_exact_prep

    spark = get_spark("kg-pr-iter-plan")
    spark.sparkContext.setLogLevel("ERROR")
    kg = entrymod._graph(spark, SF_DIR)
    prep = pagerank_exact_prep(kg)
    nodes_or_names, n, deg, ed = prep
    # one iteration's contribs aggregation — the shuffle the loop repeats
    r = nodes_or_names.select(
        F.col(nodes_or_names.columns[0]).alias("node"),
        F.lit(10**12 // n).cast("long").alias("rank"),
    )
    contribs = (
        ed.join(r, ed["src"] == r["node"])
        .select("dst", F.expr("rank DIV outdeg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        contribs._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(OUT_DIR, f"pagerank_iteration_{suffix}.txt")
    with io.open(path, "w", encoding="utf-8") as f:
        f.write(
            "# one pagerank_exact iteration's contribs update (ed join rank "
            "-> groupBy(dst)), un-checkpointed\n"
        )
        f.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
