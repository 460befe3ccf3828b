"""orders_demand_forecast_holt pins.

Two things are load-bearing here:
1. The recursion matches a plain-Python Holt reference exactly
   (operand order is the contract).
2. The DuckDB `list_reduce` TRAP is pinned: its struct lambda mutates
   the accumulator field-by-field, so a trend update reading acc.l
   sees the already-updated level — the oracle must use WITH RECURSIVE
   instead.  If a DuckDB upgrade fixes the semantics, this pin tells
   the maintainer the oracle could simplify.
"""

from __future__ import annotations

import duckdb
import pytest

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.operators.analytics_ext import (
    HOLT_ALPHA,
    HOLT_BETA,
)

load_all()


def _holt_ref(xs):
    a, b = HOLT_ALPHA, HOLT_BETA
    l, t = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        nl = a * x + (1 - a) * (l + t)
        t = b * (nl - l) + (1 - b) * t
        l = nl
    return l, t


def test_matches_python_reference_exactly(spark):
    rows = QUERIES["orders_demand_forecast_holt"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    # rebuild each nation's series independently and replay the fold
    import duckdb as d

    con = d.connect()
    series = con.sql("""
      WITH monthly AS (
        SELECT n.n_name,
               CAST(date_part('year', o.o_orderdate) * 12
                    + date_part('month', o.o_orderdate) AS BIGINT) AS m,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
        FROM '/root/testdata/sf0.001/orders.parquet' o
        JOIN '/root/testdata/sf0.001/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        JOIN '/root/testdata/sf0.001/nation.parquet' n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, m
      )
      SELECT n_name, list(x ORDER BY m) AS xs FROM monthly GROUP BY n_name
    """).fetchall()
    ref = {name: _holt_ref(xs) for name, xs in series}
    for r in rows:
        l, t = ref[r["n_name"]]
        assert r["level"] == round(l, 6), r["n_name"]
        assert r["trend"] == round(t, 6), r["n_name"]
        assert r["forecast_3"] == round(l + 3 * t, 6), r["n_name"]


def test_duckdb_list_reduce_struct_mutation_trap():
    """Documents WHY the oracle is a recursive CTE.  DuckDB 1.x
    list_reduce computes struct fields sequentially against a mutated
    accumulator: the 't' expression sees the new 'l'.  If this starts
    matching the functional reference, the workaround can be retired."""
    xs = [10.0, 12.0, 15.0, 13.0, 18.0]
    q = """
    SELECT list_reduce(
      list_prepend({'x': 0.0::DOUBLE, 'l': xs[1], 't': xs[2]-xs[1]},
        list_transform(xs[2:], v -> {'x': v, 'l': 0.0::DOUBLE,
                                     't': 0.0::DOUBLE})),
      (acc, e) -> {'x': 0.0::DOUBLE,
        'l': 0.5::DOUBLE*e.x + 0.5::DOUBLE*(acc.l+acc.t),
        't': 0.25::DOUBLE*(0.5::DOUBLE*e.x + 0.5::DOUBLE*(acc.l+acc.t)
                           - acc.l) + 0.75::DOUBLE*acc.t}) AS st
    FROM (SELECT ?::DOUBLE[] AS xs)
    """
    st = duckdb.connect().execute(q, [xs]).fetchone()[0]
    l_ref, t_ref = _holt_ref(xs)
    if st["l"] == pytest.approx(l_ref) and st["t"] == pytest.approx(t_ref):
        pytest.fail(
            "DuckDB list_reduce struct semantics changed (now functional); "
            "the Holt oracle can drop the recursive-CTE workaround"
        )
    # the mutated-accumulator value it actually produces today:
    assert st["l"] == pytest.approx(17.017578125)
