"""Capture .explain("formatted") for the build pipeline's
definition_relationships edge table (the plan the receiver-resolution
section shapes) over the workspace-stats corpus.

Usage: python scripts/capture_build_plan.py <suffix>
Writes plans/r09/build_definition_relationships_<suffix>.txt.

Unlike capture_plans.py this does NOT set KG_PLAN_CAPTURE: the point of the
r9 change is precisely the materialization boundaries (pinned key-level
decision maps), so the EXECUTING plan — pins appearing as `Scan
ExistingRDD` build sides — is the honest artifact. With pass-through pins
the after-plan inlines every map derivation multiplicatively (13.6 MB for
this corpus), which is the pathology the pins exist to prevent.
"""

from __future__ import annotations

import io
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09"
)


def main() -> None:
    suffix = sys.argv[1]
    os.makedirs(OUT_DIR, exist_ok=True)

    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.pipeline.synthetic import (
        _doc_ids,
        _file_text,
        _path_of,
        _LANG_FILES,
        _KT_CORPUS,
        WORKSPACE_MAX_DOCS,
    )

    spark = get_spark("kg-plan-capture-build")
    spark.sparkContext.setLogLevel("ERROR")
    ids = sorted(_doc_ids(spark, SF_DIR, limit=WORKSPACE_MAX_DOCS))
    nxt = {d: ids[(k + 1) % len(ids)] for k, d in enumerate(ids)}
    base = tempfile.mkdtemp(prefix="kg-plan-")
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

    files = list_files(spark, good)
    entities = extract_entities(files)
    kg = build_graph_from_entities(spark, files, entities, "p")
    df = kg.edges["definition_relationships"]
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(OUT_DIR, f"build_definition_relationships_{suffix}.txt")
    with io.open(path, "w", encoding="utf-8") as f:
        f.write(
            f"# build_graph_from_entities definition_relationships — "
            f"explain('formatted'), workspace corpus, KG_PLAN_CAPTURE=1\n"
        )
        f.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
