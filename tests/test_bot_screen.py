"""events_bot_regularity_screen pins: a metronome user flags, a bursty
human doesn't, and the thresholds behave at the boundaries."""

from __future__ import annotations

import os

from datetime import datetime, timedelta

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.operators.analytics_ext import BOT_MIN_EVENTS

load_all()


def _write(spark, tmp_path, users):
    rows, eid = [], 0
    base = datetime(2024, 1, 1)
    for uid, offsets_s in users.items():
        for off in offsets_s:
            rows.append(
                (eid, base + timedelta(seconds=off), uid, "view", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    return {
        r["user_id"]: r
        for r in QUERIES["events_bot_regularity_screen"](
            spark, str(tmp_path)
        ).collect()
    }


def test_metronome_flags_bursty_does_not(spark, tmp_path):
    # user 1: a perfect 60s tick, 30 gaps -> cv = 0 -> bot.
    # user 2: bursty human-ish gaps (1s..3600s), 30 gaps -> cv >> 0.1.
    # user 3: perfect tick but only 5 gaps -> below evidence floor.
    tick = [60 * i for i in range(31)]
    bursts = []
    t = 0
    for i in range(31):
        t += [1, 3600, 5, 600, 30, 7200][i % 6]
        bursts.append(t)
    short_tick = [60 * i for i in range(6)]
    out = _write(spark, tmp_path, {1: tick, 2: bursts, 3: short_tick})
    assert out[1]["is_bot"] is True
    assert out[1]["cv2_micro"] == 0
    assert out[1]["mean_gap_ms"] == 60_000
    assert out[2]["is_bot"] is False
    assert out[2]["cv2_micro"] > 1_000_000  # cv > 1: properly bursty
    assert out[3]["is_bot"] is False        # regular but n < floor
    assert out[3]["n_gaps"] == 5 < BOT_MIN_EVENTS


def test_identical_timestamps_are_pure_tick(spark, tmp_path):
    # all events at the same instant: s1 = 0, guarded -> cv2 0, bot.
    out = _write(spark, tmp_path, {9: [0] * (BOT_MIN_EVENTS + 2)})
    r = out[9]
    assert r["cv2_micro"] == 0 and r["is_bot"] is True
