"""events_k_anonymity_audit pins: generalization buckets merge
near-identical users into one signature; a unique profile flags."""

from __future__ import annotations

import os

from datetime import datetime, timedelta

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.operators.analytics_ext import K_ANON

load_all()


def test_generalization_and_risk_flags(spark, tmp_path):
    # users 1..6: 3 views + {5,6,7,8,5,6} clicks -> click counts all
    # bucket to 8, views to 4: ONE signature of 6 users -> safe.
    # user 99: 100 errors -> unique signature -> at risk.
    rows, eid = [], 0
    base = datetime(2024, 1, 1)

    def add(uid, etype, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, base + timedelta(seconds=eid), uid, etype, 1.0, "{}"))
            eid += 1

    for uid, clicks in zip(range(1, 7), [5, 6, 7, 8, 5, 6]):
        add(uid, "view", 3)
        add(uid, "click", clicks)
    add(99, "error", 100)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = QUERIES["events_k_anonymity_audit"](spark, str(tmp_path)).collect()
    by_sig = {r["signature"]: r for r in out}
    assert by_sig["click:8,view:4"]["n_users"] == 6
    assert by_sig["click:8,view:4"]["at_risk"] is False  # 6 >= K_ANON
    assert K_ANON <= 6
    assert by_sig["error:128"]["n_users"] == 1
    assert by_sig["error:128"]["at_risk"] is True
