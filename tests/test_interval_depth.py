"""orders_open_interval_depth pins: hand-computed overlap profile plus
the conservation invariants (depth ends at zero, never negative)."""

from __future__ import annotations

import os

from datetime import date

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def test_hand_computed_depth_profile(spark, tmp_path):
    # Orders: A [d1,d3], B [d2,d3], C [d2,d4] -> depth by day:
    # d1: 1 (A opens), d2: 3 (B,C open), d3: 1 (A,B close), d4: 0.
    d1, d2, d3, d4 = (date(2024, 1, i) for i in (1, 2, 3, 4))
    orders = [(1, d1), (2, d2), (3, d2)]
    odf = spark.createDataFrame(orders, "o_orderkey long, o_orderdate date")
    lines = [(1, d3), (1, d2), (2, d3), (3, d4)]
    ldf = spark.createDataFrame(lines, "l_orderkey long, l_shipdate date")
    odf.coalesce(1).write.parquet(os.path.join(str(tmp_path), "orders.parquet"))
    ldf.coalesce(1).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    rows = {r["d"]: r for r in
            QUERIES["orders_open_interval_depth"](spark, str(tmp_path)).collect()}
    # normalize keys to date (load path may surface date or timestamp)
    get = lambda dd: [v for k, v in rows.items() if str(k)[:10] == str(dd)][0]
    assert get(d1)["open_depth"] == 1
    assert get(d2)["open_depth"] == 3
    assert get(d3)["open_depth"] == 1
    assert get(d4)["open_depth"] == 0
    assert get(d3)["n_closed"] == 2


def test_depth_conservation_on_real_data(spark):
    rows = QUERIES["orders_open_interval_depth"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    ordered = sorted(rows, key=lambda r: r["d"])
    assert ordered[-1]["open_depth"] == 0          # every open closes
    assert all(r["open_depth"] >= 0 for r in ordered)
    assert sum(r["n_opened"] for r in rows) == sum(r["n_closed"] for r in rows)
