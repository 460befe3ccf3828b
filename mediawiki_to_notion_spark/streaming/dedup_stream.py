"""Streaming deduplication — the at-least-once → exactly-once bridge.

The reference tolerates SQS redelivery with conditional DynamoDB puts
(store_notion_blocks.py:128-150: ``attribute_not_exists`` makes the
second delivery a no-op).  The Spark-native equivalent for unbounded
streams is ``dropDuplicatesWithinWatermark``: duplicate keys arriving
within the watermark horizon are dropped, and state for keys older than
the watermark is evicted — bounded state at any throughput, which a
plain ``dropDuplicates`` on a stream does not give you (its state grows
forever).

At 100 TB/day ingest the key set never fits in memory; the watermark
horizon is the knob that trades re-delivery tolerance (how late can a
duplicate arrive) against state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_exact(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str = "ts",
    horizon: str = "30 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key arriving within ``horizon``.

    ``key_cols`` is the idempotency key (the reference's ``BlockBatch``
    / our ``event_id``); ``horizon`` bounds both duplicate lateness and
    streaming state.  Output carries every column of the input.
    """
    return stream.withWatermark(event_time_col, horizon) \
        .dropDuplicatesWithinWatermark(key_cols)
