"""Watermarked stream-stream interval join (SURVEY §2.9 extension
surface: the last classic Structured Streaming operator the engine
lacked).

Batch twin: ``operators.analytics_ext.range_join_clicks_before_purchase``
(same semantics: each purchase pairs with the same user's clicks in the
preceding band).  Here BOTH sides are unbounded streams; correctness and
bounded state come from the two watermarks plus the event-time band in
the join condition, which together let Spark evict click state older
than ``watermark + band`` and purchase state older than ``watermark``
(Structured Streaming stream-stream join state-cleanup rule).

100 TB shape: state is partitioned by the equi half of the condition
(user_id), so it shards across executors like any keyed state store;
the band keeps per-key state O(events in band), not O(stream).  A
skew-hot user bounds at (band ÷ event spacing) rows, the same pathology
— and the same mitigation story — as the batch banded-bucket join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_clicks_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    band: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(purchase_id, user_id, p_ts, click_id, c_ts, value) pairs: every
    click by the purchase's user in the ``band`` before the purchase.

    Works identically on streaming and batch DataFrames (watermarks are
    a no-op in batch) — the batch-parity pytest pins that.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        "value",
    ).withWatermark("c_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {band}"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select("purchase_id", "user_id", "p_ts", "click_id", "c_ts", "value")
