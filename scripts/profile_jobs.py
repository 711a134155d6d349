"""Attribute every Spark job of one index run via the UI REST API.

Runs list→extract→build→write twice (first warm), marks phase boundaries
with wall timestamps, then buckets jobs by submission time and name.

Usage: python scripts/profile_jobs.py
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import time
import urllib.request
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.pipeline.synthetic import (
        _doc_ids,
        _file_text,
        _path_of,
        _LANG_FILES,
        _KT_CORPUS,
        WORKSPACE_MAX_DOCS,
    )

    import pyspark
    pyspark.SparkContext.setSystemProperty("spark.ui.retainedJobs", "3000")
    pyspark.SparkContext.setSystemProperty("spark.ui.retainedStages", "3000")
    spark = get_spark("kg-profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ids = sorted(_doc_ids(spark, SF_DIR, limit=WORKSPACE_MAX_DOCS))
    nxt = {d: ids[(k + 1) % len(ids)] for k, d in enumerate(ids)}
    base = tempfile.mkdtemp(prefix="kg-profjob-")
    good = os.path.join(base, "proj_good")
    for i in ids:
        p = os.path.join(good, _path_of(i))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w", encoding="utf-8") as f:
            f.write(_file_text(i, nxt[i]))
    for rel, content in {**_LANG_FILES, **_KT_CORPUS}.items():
        p = os.path.join(good, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w", encoding="utf-8") as f:
            f.write(content)

    from knowledge_graph_spark.pipeline.extract import list_files, extract_entities
    from knowledge_graph_spark.pipeline.build import build_graph_from_entities

    ui = spark.sparkContext.uiWebUrl

    def all_jobs():
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app_id = apps[0]["id"]
        return json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs"))

    st = spark.sparkContext.statusTracker()

    def max_jid():
        return max(list(st.getJobIdsForGroup()) + [-1])

    def one_run(out_dir):
        marks = {}
        marks["t0"] = (max_jid(), time.time())
        files = list_files(spark, good)
        entities = extract_entities(files)
        kg = build_graph_from_entities(spark, files, entities, "p")
        marks["build_done"] = (max_jid(), time.time())
        kg.write(out_dir)
        marks["write_done"] = (max_jid(), time.time())
        for df in getattr(kg, "_cached_intermediates", []):
            df.unpersist()
        return marks

    one_run(os.path.join(base, "out0"))  # warm
    time.sleep(1)
    marks = one_run(os.path.join(base, "out1"))
    time.sleep(3)  # let the status-store listener drain before reading names
    jobs = all_jobs()
    phases = [("build", marks["t0"], marks["build_done"]),
              ("write", marks["build_done"], marks["write_done"])]
    for pname, (lo, tlo), (hi, thi) in phases:
        sel = [j for j in jobs if lo < j["jobId"] <= hi]
        print(f"== {pname}: {len(sel)} jobs, {thi-tlo:.2f}s")
        c = Counter()
        for j in sel:
            key = (j.get("description") or j["name"])[:110]
            c[key] += 1
        for key, n in c.most_common(40):
            print(f"  {n:3d}  {key}")
        import datetime as _dt
        def _dur(j):
            f = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                return (_dt.datetime.strptime(j["completionTime"], f)
                        - _dt.datetime.strptime(j["submissionTime"], f)).total_seconds()
            except Exception:
                return 0.0
        print("  slowest:")
        for j in sorted(sel, key=_dur, reverse=True)[:12]:
            print(f"    {_dur(j):6.2f}s  job {j['jobId']}  {(j.get('description') or j['name'])[:90]}")
    spark.stop()


if __name__ == "__main__":
    main()
