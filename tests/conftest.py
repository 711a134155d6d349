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
