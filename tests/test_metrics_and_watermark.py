"""Observability (observe() counters) and watermarked streaming windows
(SURVEY §1.1 row 12, §2.9 extension surface)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mediawiki_to_notion_spark.plans.pipeline import store_blocks
from mediawiki_to_notion_spark.sources.tables import load_table
from mediawiki_to_notion_spark.streaming import metrics as M

SF = "/root/testdata/sf0.001"


def test_observe_store_counter(spark):
    staged = spark.createDataFrame(
        [("a.md", "# H\n\ntext\n"), ("b.md", "# H2\n")],
        "s3_object_key string, markdown string",
    )
    blocks, _ = store_blocks(staged)
    observed, obs = M.observe_store(blocks)
    observed.write.mode("overwrite").format("noop").save()
    assert obs.get[M.BLOCKS_STORED] == 3


def test_observe_conversion_counters(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "boom"), ("c", None)], "k string, convert_error string"
    )
    observed, obs = M.observe_conversion(df)
    observed.write.mode("overwrite").format("noop").save()
    assert obs.get[M.PAGE_CONVERSIONS_OK] == 2
    assert obs.get[M.PAGE_CONVERSIONS_FAIL] == 1


def test_watermarked_tumbling_window_stream(spark, tmp_path):
    """Streaming window agg with late-data watermark over the events
    table replayed as a file stream; append-mode output only emits
    windows the watermark has closed."""
    src = tmp_path / "stream_src"
    events = load_table(spark, "events", SF).orderBy("ts").limit(2000)
    events.select("event_id", "ts", "event_type", "value") \
        .coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
        .parquet(str(src))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = tmp_path / "out"
    q = (
        stream.writeStream.format("memory").queryName("winagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from winagg").collect()
    # append mode: with a single batch, only windows older than
    # max(ts) - 30min close; verify counts match the batch equivalent
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime
    closed = batch.filter(
        F.col("win.end") <= F.lit(max_ts - datetime.timedelta(minutes=30))
    ).collect()
    key = lambda r: (r.win.start, r.event_type)  # noqa: E731
    assert {key(r): r.n for r in got} == {key(r): r.n for r in closed}
    assert len(got) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Replayed duplicate deliveries (the SQS at-least-once shape) are
    collapsed to one row per event_id by dropDuplicatesWithinWatermark,
    with state bounded by the watermark horizon."""
    from mediawiki_to_notion_spark.streaming.dedup_stream import dedup_stream_exact

    src = tmp_path / "dup_src"
    events = load_table(spark, "events", SF).orderBy("ts").limit(500) \
        .select("event_id", "ts", "event_type", "value")
    # simulate redelivery: every event arrives twice (two files)
    events.coalesce(1).write.mode("overwrite").parquet(str(src))
    events.coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        # pin both copies into ONE micro-batch: the guarantee under test
        # is in-state dedup, not late-row filtering below an advanced
        # watermark — without this, availableNow may split the two files
        # across batches and the test would pass for the wrong reason
        .option("maxFilesPerTrigger", "2")
        .parquet(str(src))
    )
    deduped = dedup_stream_exact(stream, ["event_id"], "ts", "30 minutes")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select event_id from dedup_stream").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)), "duplicates survived the stream"
    assert set(ids) == {r.event_id for r in events.collect()}


def test_streaming_session_window(spark, tmp_path):
    """Session windows (30-min gap) over a watermarked stream: closed
    sessions in append mode must match the batch session_window twin."""
    src = tmp_path / "sess_src"
    events = load_table(spark, "events", SF).orderBy("ts").limit(2000) \
        .select("user_id", "ts", "value")
    events.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory").queryName("sessagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessagg").collect()

    batch = (
        events.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    import datetime
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    closed = batch.filter(
        F.col("win.end") <= F.lit(max_ts - datetime.timedelta(minutes=10))
    ).collect()
    key = lambda r: (r.win.start, r.win.end, r.user_id)  # noqa: E731
    assert {key(r): r.n for r in got} == {key(r): r.n for r in closed}
    assert len(got) > 0


def test_streaming_minhash_dedup_drops_near_duplicates(spark, tmp_path):
    """Documents whose full MinHash signature matches an arrival inside
    the watermark horizon are suppressed at ingest; distinct documents
    all pass.  Also pins signature parity: the streaming per-row
    signature must equal the batch groupBy signature for the same text."""
    import pyspark.sql.functions as F

    from mediawiki_to_notion_spark.operators.dedup import _hashed_shingles
    from mediawiki_to_notion_spark.functions import hashing as H
    from mediawiki_to_notion_spark.streaming.dedup_stream import (
        dedup_stream_minhash,
        minhash_signature_col,
    )

    docs = load_table(spark, "documents", SF).limit(50) \
        .select("doc_id", "text") \
        .withColumn("ts", F.timestamp_millis(1_700_000_000_000 + F.col("doc_id")))

    # parity: per-row streaming signature == batch groupBy signature
    batch_sig = (
        _hashed_shingles(docs).groupBy("doc_id")
        .agg(*H.minhash_agg_columns(F.col("h")))
        .select(
            "doc_id",
            F.concat_ws(
                "_", *[F.col(f"mh{i}").cast("string") for i in range(H.N_MINHASH)]
            ).alias("sig"),
        )
    )
    row_sig = docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", minhash_signature_col("text").alias("sig")
    )
    mismatches = batch_sig.join(row_sig, "doc_id") \
        .filter(batch_sig.sig != row_sig.sig).count()
    assert mismatches == 0

    src = tmp_path / "mh_src"
    # re-deliver every document once (same text, shifted doc_id) — the
    # near-dup signature collides even though doc_id differs
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))
    docs.withColumn("doc_id", F.col("doc_id") + 1000) \
        .coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "2")  # one micro-batch: in-state dedup
        .parquet(str(src))
    )
    deduped = dedup_stream_minhash(stream, "text", "ts", "30 minutes")
    q = (
        deduped.writeStream.format("memory").queryName("mh_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select minhash_sig from mh_dedup_stream").collect()
    sigs = [r.minhash_sig for r in got]
    assert len(sigs) == len(set(sigs)), "signature duplicates survived"
    # expected survivors = distinct signatures (near-identical texts
    # legitimately collapse: the corpus has planted near-dups)
    n_expected = docs.select(minhash_signature_col("text").alias("s")) \
        .distinct().count()
    assert len(sigs) == n_expected
    assert n_expected < 2 * docs.count()  # the re-delivery was collapsed


def test_funnel_runs_unchanged_on_stream(spark, tmp_path):
    """Batch/stream unification: the corpus quality funnel is stateless
    narrow expressions, so the SAME apply_funnel() code filters a
    readStream — and produces row-identical results to the batch run."""
    import pyspark.sql.functions as F

    from mediawiki_to_notion_spark.operators.corpus_quality import apply_funnel

    docs = load_table(spark, "documents", SF) \
        .select("doc_id", "lang", "text", "n_chars")
    src = tmp_path / "funnel_src"
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(
        "doc_id long, lang string, text string, n_chars long"
    ).parquet(str(src))
    q = (
        apply_funnel(stream)
        .writeStream.format("memory").queryName("funnel_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.drop_reason, r.keep)
        for r in spark.sql(
            "select doc_id, drop_reason, keep from funnel_stream"
        ).collect()
    }
    want = {
        (r.doc_id, r.drop_reason, r.keep)
        for r in apply_funnel(docs).collect()
    }
    assert got == want and len(want) == docs.count()


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (clicks ⋈ purchases in
    the 10-minute band) produces exactly the batch join's pairs when
    both file streams drain under availableNow."""
    from mediawiki_to_notion_spark.streaming.join_stream import (
        interval_join_clicks_purchases,
    )

    events = load_table(spark, "events", SF).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).orderBy("event_id").limit(4000)
    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purchases"
    events.filter(F.col("event_type") == "click").coalesce(1) \
        .write.mode("overwrite").parquet(str(clicks_dir))
    events.filter(F.col("event_type") == "purchase").coalesce(1) \
        .write.mode("overwrite").parquet(str(purch_dir))

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    c_stream = spark.readStream.schema(schema).parquet(str(clicks_dir))
    p_stream = spark.readStream.schema(schema).parquet(str(purch_dir))
    q = (
        interval_join_clicks_purchases(c_stream, p_stream)
        .writeStream.format("memory").queryName("ssjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("select * from ssjoin").collect()
    }

    batch = interval_join_clicks_purchases(
        spark.read.parquet(str(clicks_dir)),
        spark.read.parquet(str(purch_dir)),
    )
    want = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert got == want
    assert len(want) > 0


def test_stream_static_dimension_join_matches_batch(spark, tmp_path):
    """Stream-static join: the event stream enriches against a static
    dimension frame inside the streaming query itself (not foreachBatch)
    — the standard reference-data enrichment — and a windowed count per
    dimension attribute matches the batch equivalent."""
    src = tmp_path / "ss_events"
    events = load_table(spark, "events", SF).select(
        "event_id", "ts", "user_id", "event_type"
    ).orderBy("event_id").limit(3000)
    events.coalesce(1).write.mode("overwrite").parquet(str(src))

    # static dimension: user tier derived deterministically
    tiers = (
        events.select("user_id").distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    stream = (
        spark.readStream.schema(schema).parquet(str(src))
        .join(F.broadcast(tiers), "user_id")  # stream-static join
        .groupBy("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory").queryName("ssdim")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.tier, r.event_type): r.n
        for r in spark.sql("select * from ssdim").collect()
    }
    want = {
        (r.tier, r.event_type): r.n
        for r in spark.read.parquet(str(src))
        .join(tiers, "user_id")
        .groupBy("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_streaming_gopher_rules_match_batch(spark, tmp_path):
    """The Gopher quality ruleset is stateless narrow expressions, so
    the SAME apply_gopher_rules core must produce identical rows on a
    readStream as on the batch table (the apply_funnel discipline,
    extended to the r4 rule battery)."""
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        apply_gopher_rules,
    )

    src = tmp_path / "gopher_src"
    docs = load_table(spark, "documents", SF).limit(200) \
        .select("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = apply_gopher_rules(
        spark.readStream.schema("doc_id long, text string").parquet(str(src))
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("gopher_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_gopher"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.sql("select * from gopher_stream").collect()}
    want = {r.doc_id: r for r in apply_gopher_rules(docs).collect()}
    assert set(got) == set(want) and len(got) == 200
    for k in want:
        assert got[k] == want[k], k


def test_streaming_repetition_kernel_matches_batch(spark, tmp_path):
    """The r5 Gopher repetition battery is a stateless row-local
    mapInPandas kernel plus narrow projections, so the SAME
    apply_repetition_rules core must produce identical rows on a
    readStream as on the batch table — registering the zero-shuffle
    kernel as safe for the streaming ingest path (VERDICT r5 item 6)."""
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        apply_repetition_rules,
    )

    src = tmp_path / "rep_src"
    docs = load_table(spark, "documents", SF).limit(200) \
        .select("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = apply_repetition_rules(
        spark.readStream.schema("doc_id long, text string").parquet(str(src))
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("rep_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rep"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.sql("select * from rep_stream").collect()}
    want = {r.doc_id: r for r in apply_repetition_rules(docs).collect()}
    assert set(got) == set(want) and len(got) == 200
    for k in want:
        assert got[k] == want[k], k


def test_streaming_quality_classifier_matches_batch(spark, tmp_path):
    """The r5 hashed-bigram classifier is a stream-static broadcast
    join + keyed aggregation, so the SAME apply_quality_classifier
    core must produce identical rows on a readStream (complete mode —
    the per-doc aggregate) as on the batch table."""
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        apply_quality_classifier,
    )

    src = tmp_path / "qc_src"
    docs = load_table(spark, "documents", SF).limit(150) \
        .select("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = apply_quality_classifier(
        spark,
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src)),
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("qc_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_qc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.sql("select * from qc_stream").collect()}
    want = {r.doc_id: r
            for r in apply_quality_classifier(spark, docs).collect()}
    assert set(got) == set(want) and len(got) > 0
    for k in want:
        assert got[k] == want[k], k
