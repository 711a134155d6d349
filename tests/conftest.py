from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from knowledge_graph_spark.session import get_spark

    s = get_spark("kg-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck_small():
    from tests.oracle_utils import duck_con

    return duck_con(SF_SMALL)


@pytest.fixture(scope="session")
def duck_med():
    from tests.oracle_utils import duck_con

    return duck_con(SF_MED)


def make_edge_df(spark, pairs):
    """Edge DataFrame from (src_label, dst_label) pairs — labels map to
    stable ints; table fixed to definition_nodes. Only the four endpoint
    columns the graph algorithms read are materialized."""
    rows = [
        ("definition_nodes", float(ord(a[0]) * 100 + len(a)), "definition_nodes",
         float(ord(b[0]) * 100 + len(b)))
        for a, b in pairs
    ]
    return spark.createDataFrame(
        [(t1, int(i1), t2, int(i2)) for t1, i1, t2, i2 in rows],
        "source_table string, source_id long, target_table string, target_id long",
    )
