"""Local mirror of the driver's correctness gate: run a queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
schema width, and order-insensitive values (exact equality after column-name
sort + row sort)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    """Type-strict cell canonicalization mirroring a string-render hash:
    int vs float are DISTINCT (DuckDB HUGEINT→float64 must fail here like it
    fails the driver's hash), tz info is kept, NaN→None. Width within a
    family (int32 vs int64) is collapsed via .item()."""
    if v is None:
        return None
    if hasattr(v, "item") and not isinstance(v, (list, tuple, str)):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, pd.Timestamp):
        return ("ts", str(v.to_pydatetime()))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> dict:
    sp = spark_df.toPandas()
    dk = con.sql(sql).df()
    res = {
        "name": name,
        "rows": (len(sp), len(dk)),
        "cols": (sorted(sp.columns.str.lower()), sorted(dk.columns.str.lower())),
    }
    ok = len(sp) == len(dk) and res["cols"][0] == res["cols"][1]
    if ok:
        sp.columns = sp.columns.str.lower()
        dk.columns = dk.columns.str.lower()
        a, b = _normalize(sp), _normalize(dk)
        mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
        ok = not mism
        if mism:
            i = mism[0]
            res["first_diff"] = {"spark": a[i], "duckdb": b[i]}
    res["ok"] = ok
    return res
