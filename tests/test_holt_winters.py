"""orders_forecast_holt_winters pins: a constructed pure-seasonal
series recovers the seasonal offsets in its forecasts, and the Spark
fold matches a plain-Python Holt-Winters reference exactly."""

from __future__ import annotations

import os

from datetime import date

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.operators.analytics_ext import (
    HW_ALPHA,
    HW_BETA,
    HW_GAMMA,
    HW_PERIOD,
)

load_all()

SEASON = [100.0, -50.0, 30.0, 0.0, 80.0, -20.0,
          10.0, -70.0, 40.0, -10.0, 60.0, -30.0]
BASE = 1000.0


def _hw_ref(xs):
    a, b, g, P = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD
    l = xs[0]
    for x in xs[1:P]:
        l = l + x
    l = l / float(P)
    t = 0.0
    s = [x - l for x in xs[:P]]
    for x in xs[P:]:
        si = s[0]
        nl = a * (x - si) + (1 - a) * (l + t)
        nt = b * (nl - l) + (1 - b) * t
        s = s[1:] + [g * (x - nl) + (1 - g) * si]
        l, t = nl, nt
    return l, t, s


def test_pure_seasonal_series_recovers_offsets(spark, tmp_path):
    # 48 months of BASE + season (period 12, no trend, no noise) for
    # one synthetic nation; HW must forecast ~BASE + season ahead.
    months = 48
    orders, lines = [], []
    for k in range(months):
        y, m = 2018 + k // 12, 1 + k % 12
        # one order whose totalprice IS the month's revenue
        orders.append((k, k, date(y, m, 15), BASE + SEASON[k % 12]))
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate date, "
                "o_totalprice double")
    cdf = spark.createDataFrame(
        [(k, 0) for k in range(months)], "c_custkey long, c_nationkey int")
    ndf = spark.createDataFrame([(0, "ONLY")], "n_nationkey int, n_name string")
    for df, name in ((odf, "orders"), (cdf, "customer"), (ndf, "nation")):
        df.coalesce(1).write.parquet(os.path.join(str(tmp_path), f"{name}.parquet"))
    rows = QUERIES["orders_forecast_holt_winters"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    xs = [BASE + SEASON[k % 12] for k in range(months)]
    l, t, s = _hw_ref(xs)
    assert r["level"] == round(l, 6)
    assert r["trend"] == round(t, 6)
    assert r["forecast_1"] == round(l + 1 * t + s[0], 6)
    assert r["forecast_3"] == round(l + 3 * t + s[2], 6)
    # semantic check: with zero trend + exact periodicity the forecast
    # lands on BASE + the right seasonal offset
    next_month = months % 12
    assert abs(r["forecast_1"] - (BASE + SEASON[next_month])) < 1.0
    assert abs(r["trend"]) < 0.5
