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


# ---------------------------------------------------------------------------
# Driver-parity dtype classes.
#
# The driver fetches both sides through pandas/Arrow before hashing, so a
# column whose *logical* values match can still hash-mismatch when the
# physical types land in different pandas classes.  The canonical trap
# (CORRECTNESS_r02's pack_sequences_greedy): DuckDB SUM(BIGINT) is HUGEINT,
# and HUGEINT arrives as float64 on the pandas path — `195` vs `195.0`.
# fetchall()-based comparison (the old harness) silently normalized this.
# Each engine type maps to the pandas-class it fetches as; classes must
# match per column.  Integer *widths* are interchangeable (int32 vs int64
# both fetch integral — driver-confirmed by text_token_counting r2).

_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "float", "UHUGEINT": "float",  # pandas path: float64
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "BLOB": "bytes",
    "DATE": "date", "INTERVAL": "interval",
}


def _duck_col_class(t) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s.endswith("[]"):
        # one level of element typing: an int32 column is driver-
        # normalized against BIGINT, but nested widths ride the Arrow
        # list type — compare element classes too
        return f"list<{_duck_col_class(s[:-2])}>"
    if s.startswith("LIST") or s.startswith("ARRAY"):
        return "list"
    if s.startswith("STRUCT"):
        return "struct"
    if s.startswith("MAP"):
        return "map"
    return _DUCK_CLASS.get(s, s.lower())


def _spark_col_class(dtype: str) -> str:
    s = dtype.lower()
    if s in ("tinyint", "smallint", "int", "bigint", "byte", "short", "long",
             "integer"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("array<") and s.endswith(">"):
        return f"list<{_spark_col_class(s[6:-1])}>"
    if s.startswith("array"):
        return "list"
    if s.startswith("struct"):
        return "struct"
    if s.startswith("map"):
        return "map"
    return {"string": "str", "boolean": "bool", "binary": "bytes",
            "date": "date", "interval": "interval"}.get(s, s)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


_UNHASHABLE = ("list", "struct", "map")


def _assert_driver_hashable(name_hint: str, classes: dict[str, str]) -> None:
    """The driver's canonicalizer sorts both sides with pandas before
    hashing; list/struct/map cells are unhashable there (`TypeError:
    unhashable type` — CORRECTNESS_r03's three `err` rows), so an
    oracled query must emit only scalar top-level columns.  The local
    `tuple(r)` multiset happily hashed Python lists, which is exactly
    how the r3 regressions slipped through — hence this gate-side
    guard (VERDICT r3 item 2)."""
    bad = {c: k for c, k in classes.items()
           if any(k == u or k.startswith(f"{u}<") for u in _UNHASHABLE)}
    if bad:
        raise ValueError(
            f"{name_hint}: oracled output has nested (driver-unhashable) "
            f"columns {bad}; pivot to scalar columns or serialize to a "
            f"delimited string on BOTH engines"
        )


def compare(spark: SparkSession, query_fn, oracle_sql: str, sf_dir: str) -> dict:
    """Run both sides; return a diagnostics dict with ``match: bool``.

    Raises ValueError if either side's output schema contains a nested
    top-level column — the driver gate cannot hash those (see
    ``_assert_driver_hashable``)."""
    sdf = query_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_classes = {c.lower(): _spark_col_class(t) for c, t in sdf.dtypes}
    _assert_driver_hashable("spark side", s_classes)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    rel = con.sql(oracle_sql)
    d_cols = [c.lower() for c in rel.columns]
    d_classes = {c.lower(): _duck_col_class(t)
                 for c, t in zip(rel.columns, rel.types)}
    _assert_driver_hashable("oracle side", d_classes)
    d_rows = rel.fetchall()
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

    class_mismatch = {
        c: (s_classes[c], d_classes[c])
        for c in s_classes
        if s_classes[c] != d_classes[c]
    }
    out["dtype_class_match"] = not class_mismatch
    if class_mismatch:
        out["dtype_class_mismatch"] = class_mismatch

    s_ms = _rows_to_multiset(s_cols, s_rows)
    d_ms = _rows_to_multiset(d_cols, d_rows)
    out["values_match"] = s_ms == d_ms
    out["match"] = out["values_match"] and out["dtype_class_match"]
    if not out["values_match"]:
        only_s = list((s_ms - d_ms).keys())[:3]
        only_d = list((d_ms - s_ms).keys())[:3]
        out["only_in_spark"] = only_s
        out["only_in_duck"] = only_d
    return out
