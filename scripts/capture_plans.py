"""Capture .explain("formatted") for named queries into plans/r08/.

Usage: python scripts/capture_plans.py <suffix> q1 q2 ...
       python scripts/capture_plans.py before pagerank_exact ngram_jaccard_pairs

Writes plans/r08/<query>_<suffix>.txt. Runs at sf0.01 by default (plan shape
is scale-independent; AQE runtime rewrites are not captured here — these are
the static physical plans, the same thing `df.explain("formatted")` prints).

Queries whose public result is an eager localCheckpoint (the persisted-block
hygiene in knowledge_graph_spark.persist) would print a bare `Scan
ExistingRDD` — KG_PLAN_CAPTURE=1 makes checkpoint_and_release a pass-through
so the REAL computation plan is captured. That env var is set only by this
script, never by bench or driver runs.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["KG_PLAN_CAPTURE"] = "1"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("KG_PLANS_ROUND", "r09"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from knowledge_graph_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("kg-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with io.open(path, "w", encoding="utf-8") as f:
            f.write(f"# {name} — explain('formatted') at {SF_DIR}\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
