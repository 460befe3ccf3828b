"""Local DuckDB-oracle comparison harness.

Mirrors the driver's t2 check: run the Spark query and the oracle SQL on
the same parquet tables, compare row count, column names, and an
order-insensitive value multiset.  Used by tests; the driver has its own
copy of this logic.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from collections import Counter

import duckdb
from pyspark.sql import SparkSession

from mediawiki_to_notion_spark.sources.tables import TABLE_NAMES


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / +0.0 and format with enough digits to be exact
        return repr(v + 0.0)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    # Decimal and everything else → string
    return str(v)


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def compare(spark: SparkSession, query_fn, oracle_sql: str, sf_dir: str) -> dict:
    """Run both sides; return a diagnostics dict with ``match: bool``."""
    sdf = query_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()
    con.close()

    out = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    out["cols_match"] = sorted(s_cols) == sorted(d_cols)
    out["count_match"] = len(s_rows) == len(d_rows)
    if not (out["cols_match"] and out["count_match"]):
        out["match"] = False
        return out

    s_ms = _rows_to_multiset(s_cols, s_rows)
    d_ms = _rows_to_multiset(d_cols, d_rows)
    out["values_match"] = s_ms == d_ms
    out["match"] = out["values_match"]
    if not out["values_match"]:
        only_s = list((s_ms - d_ms).keys())[:3]
        only_d = list((d_ms - s_ms).keys())[:3]
        out["only_in_spark"] = only_s
        out["only_in_duck"] = only_d
    return out
