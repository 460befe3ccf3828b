"""eval_win_rate_bootstrap pins.

The key regression guard: the first formulation drew with a linear
congruential hash, and stepping (K + s*i) mod n over i = 0..n-1 is
EQUIDISTRIBUTED — every replica reproduced exactly wins_x and the CI
collapsed to a point, silently claiming every pair significant.  The
width test below fails on any such degenerate resampler.
"""

from __future__ import annotations

import math
import os

from datetime import datetime, timedelta

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def test_ci_width_matches_binomial_theory(spark):
    rows = QUERIES["eval_win_rate_bootstrap"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        n, p = r["n_matches"], r["win_rate_x"]
        assert r["ci_lo"] <= p <= r["ci_hi"]
        if 0 < p < 1:
            # a 95% percentile CI must have real width: between 0.4x
            # and 3x the normal-approx interval (the degenerate LCG
            # resampler had width exactly 0)
            theory = 2 * 1.96 * math.sqrt(p * (1 - p) / n)
            width = r["ci_hi"] - r["ci_lo"]
            assert 0.4 * theory < width < 3 * theory, (r, theory)
        # significance must agree with the interval
        assert r["significant"] == (r["ci_lo"] > 0.5 or r["ci_hi"] < 0.5)


def test_decisive_pair_is_significant(spark, tmp_path):
    # 200 users, each: one 'a' event then one 'b' event; 'a' wins 180
    # of 200 matches -> CI far above 0.5 -> significant.
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(200):
        a_val, b_val = (2.0, 1.0) if u < 180 else (1.0, 2.0)
        rows.append((eid, base + timedelta(minutes=eid), u, "a", a_val, "{}"))
        eid += 1
        rows.append((eid, base + timedelta(minutes=eid), u, "b", b_val, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = QUERIES["eval_win_rate_bootstrap"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["x"] == "a" and r["y"] == "b"
    assert r["n_matches"] == 200
    assert r["win_rate_x"] == 0.9
    assert r["significant"] is True
    assert r["ci_lo"] > 0.8


def test_m_out_of_n_rescale_matches_theory(spark, tmp_path):
    """With n = 3000 > BOOT_M = 1000 the replica draws are capped at m
    and the CI shrinks by sqrt(m/n) — the rescaled width must still
    track the full-n binomial theory, not the m-sized one (3x wider)."""
    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(3000):
        a_val, b_val = (2.0, 1.0) if u % 5 < 3 else (1.0, 2.0)  # p = 0.6
        rows.append((eid, base + timedelta(seconds=eid), u, "a", a_val, "{}"))
        eid += 1
        rows.append((eid, base + timedelta(seconds=eid), u, "b", b_val, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    r = QUERIES["eval_win_rate_bootstrap"](spark, str(tmp_path)).collect()[0]
    assert r["n_matches"] == 3000
    assert r["win_rate_x"] == 0.6
    theory = 2 * 1.96 * math.sqrt(0.6 * 0.4 / 3000)  # ~0.035
    width = r["ci_hi"] - r["ci_lo"]
    assert 0.5 * theory < width < 2 * theory, (width, theory)
    assert r["significant"] is True  # 0.6 with n=3000 is decisive
