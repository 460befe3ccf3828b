"""events_ab_cuped pins: under a randomized-but-finite split, the naive
gap carries the residual user-mix imbalance; CUPED (theta ~ 1 when the
pre-period explains the level) removes almost all of it and recovers
the true effect.

Note the design constraint this fixture respects: CUPED is VARIANCE
reduction under randomization, not bias correction — a fixture that
deliberately confounds assignment with the covariate pollutes theta
(cov(x, effect) != 0) and over-corrects; the first draft of this test
did exactly that.
"""

from __future__ import annotations

import os

from datetime import datetime, timedelta

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()

TRUE_EFFECT = 10.0


def test_cuped_removes_residual_imbalance(spark, tmp_path):
    # b_u = ((u*37) % 40) * 5 is a permutation-derived level: odd users
    # average 100, even 95 — a residual imbalance of 5 despite the
    # "random" split.  Variant 1 (odd) also gets the real +10.
    # Naive gap = 15; CUPED gap ~ 10 because pre explains the level.
    rows, eid = [], 0
    t_pre = datetime(2024, 1, 1)
    t_post = datetime(2024, 6, 1)
    for u in range(40):
        b = float(((u * 37) % 40) * 5)
        effect = TRUE_EFFECT if u % 2 == 1 else 0.0
        rows.append((eid, t_pre + timedelta(seconds=u), u, "m", b, "{}")); eid += 1
        rows.append((eid, t_post + timedelta(seconds=u), u, "m", b + effect, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = {r["variant"]: r for r in
           QUERIES["events_ab_cuped"](spark, str(tmp_path)).collect()}
    naive_gap = out[1]["mean_post"] - out[0]["mean_post"]
    cuped_gap = out[1]["mean_post_cuped"] - out[0]["mean_post_cuped"]
    naive_err = abs(naive_gap - TRUE_EFFECT)
    cuped_err = abs(cuped_gap - TRUE_EFFECT)
    assert naive_err > 4                 # the residual imbalance is real
    assert cuped_err < 1                 # CUPED removes ~all of it
    assert cuped_err < naive_err / 4
    assert out[0]["var_reduction"] > 0.9  # pre explains ~all variance
    assert abs(out[0]["theta"] - 1.0) < 0.1
