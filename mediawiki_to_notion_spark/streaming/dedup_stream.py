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


def minhash_signature_col(text_col="text"):
    """16-permutation MinHash signature of a document as ONE narrow
    per-row expression (no explode, no shuffle): trigram shingles →
    portable 60-bit md5 hashes → per-permutation array_min, concatenated
    to a signature string.  Same constants as operators/dedup.py, so a
    streaming arrival and the batch index agree on every signature."""
    from pyspark.sql import functions as F

    from mediawiki_to_notion_spark.functions import hashing as H

    t = F.split(text_col, " ")
    # <3-token docs shingle to the whole text (the batch ops filter them
    # out; a stream must still assign them a stable signature)
    shingles = F.array_distinct(
        F.when(
            F.size(t) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i + 1), F.element_at(t, i + 2),
                    F.element_at(t, i + 3),
                ),
            ),
        ).otherwise(F.array(F.col(text_col)))
    )
    hashes = F.transform(
        shingles, lambda s: H.token_hash60(s) % H.MERSENNE_P
    )
    mins = [
        F.array_min(F.transform(hashes, lambda h: (h * a + b) % H.MERSENNE_P))
        for a, b in H.MINHASH_PARAMS
    ]
    return F.concat_ws("_", *[m.cast("string") for m in mins])


def dedup_stream_minhash(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    horizon: str = "30 minutes",
) -> DataFrame:
    """Streaming near-duplicate suppression: drop arrivals whose full
    MinHash signature matches a document seen within ``horizon``.

    A full-signature match is the high-precision end of MinHash (all 16
    permutations agree ⇒ Jaccard ≈ 1): it suppresses re-crawls and
    trivially-edited copies at ingest time without any state beyond the
    watermark horizon.  Banded (lower-threshold) matching is
    deliberately NOT done here — a band match needs exact-Jaccard
    verification, which is a join against indexed state; that path is
    the batch `dedup_minhash_incremental` (arrival batch vs corpus
    index).  Stream-side cost is one narrow projection per row."""
    sig = minhash_signature_col(text_col)
    return (
        stream.withColumn("minhash_sig", sig)
        .withWatermark(event_time_col, horizon)
        .dropDuplicatesWithinWatermark(["minhash_sig"])
    )
