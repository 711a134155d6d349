"""Driver-gate mirror: every queries() entry hash-matches its oracle_sql()
at sf0.001 (fast) — the driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.oracle_utils import compare


def _names():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return sorted(set(q) & set(o))


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck_small, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    res = compare(q(spark, SF_SMALL), duck_small, sql, name)
    assert res["ok"], res


def test_every_query_has_oracle_or_is_marked():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = set(q) - set(o)
    # rows-only entries are allowed but should be deliberate
    assert missing == set(getattr(entrymod, "ROWS_ONLY", set())), missing


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) >= 3
