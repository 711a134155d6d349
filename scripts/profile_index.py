"""Phase-level profile of one index_repository run over the workspace-stats
corpus: wall seconds + Spark job count per phase (statusTracker deltas).

Usage: python scripts/profile_index.py [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.pipeline.synthetic import (
        _doc_ids,
        _file_text,
        _path_of,
        _LANG_FILES,
        _KT_CORPUS,
        WORKSPACE_MAX_DOCS,
    )

    spark = get_spark("kg-profile-index")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ids = sorted(_doc_ids(spark, SF_DIR, limit=WORKSPACE_MAX_DOCS))
    nxt = {d: ids[(k + 1) % len(ids)] for k, d in enumerate(ids)}
    base = tempfile.mkdtemp(prefix="kg-prof-")
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

    st = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return max(list(st.getJobIdsForGroup()) + [-1])

    from knowledge_graph_spark.pipeline.extract import list_files, extract_entities
    from knowledge_graph_spark.pipeline.build import build_graph_from_entities
    from knowledge_graph_spark.pipeline.indexer import index_repository
    from knowledge_graph_spark.persist import persistent_rdd_ids, release_persisted_since

    for r in range(runs):
        print(f"--- run {r} ---", flush=True)
        before_pins = persistent_rdd_ids(spark)
        out_dir = os.path.join(base, f"out{r}")

        def phase(name, fn):
            j0, t0 = jobs(), time.time()
            res = fn()
            print(f"{name:24s} {time.time()-t0:7.2f}s  jobs +{jobs()-j0}", flush=True)
            return res

        files = phase("list_files", lambda: list_files(spark, good))
        entities = phase("extract_entities", lambda: extract_entities(files))
        kg = phase(
            "build_graph", lambda: build_graph_from_entities(spark, files, entities, "p")
        )
        phase("write", lambda: kg.write(out_dir))
        for df in getattr(kg, "_cached_intermediates", []):
            df.unpersist()
        from knowledge_graph_spark.graph.model import KnowledgeGraph

        kg2 = phase("read_back", lambda: KnowledgeGraph.read(spark, out_dir, "p"))
        phase("stats_counts", lambda: [kg2.files.count(), kg2.definitions.count()])
        release_persisted_since(spark, before_pins, set())
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
