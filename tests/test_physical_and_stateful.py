"""Bucketed co-located joins, salted skew joins, and the custom
arbitrary-stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.operators.physical import salted_join, write_bucketed
from mediawiki_to_notion_spark.sources.tables import load_table
from mediawiki_to_notion_spark.streaming.stateful import track_block_progress

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # (warehouse dir is a static conf; managed tables land in the default
    # spark-warehouse and are dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, "orders", SF)
        lineitem = load_table(spark, "lineitem", SF)
        write_bucketed(orders, "orders_b", "o_orderkey", 8)
        write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8, sort_col="l_linenumber")
        o = spark.table("orders_b")
        l = spark.table("lineitem_b")
        joined = o.join(l, o.o_orderkey == l.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_minhash_band_index_bucketed_probe(spark):
    """The incremental-dedup scale path made physical: band signatures
    persisted as a table bucketed on (band, sig) act as the corpus
    index — an arrival batch bucketed the same way probes it with NO
    exchange on either side, so per-batch dedup cost never reshuffles
    the corpus index (dedup_minhash_incremental's docstring contract)."""
    from mediawiki_to_notion_spark.functions import hashing as H
    from mediawiki_to_notion_spark.operators.dedup import _hashed_shingles

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = load_table(spark, "documents", SF)
        sh = _hashed_shingles(d)
        stats = sh.groupBy("doc_id").agg(
            *H.minhash_agg_columns(F.col("h"))
        )
        bands = stats.select(
            "doc_id",
            F.posexplode(
                F.array(*[H.band_signature(b) for b in range(H.N_BANDS)])
            ).alias("band", "sig"),
        )
        old = bands.filter(F.col("doc_id") % 5 != 4)
        new = bands.filter(F.col("doc_id") % 5 == 4)
        write_bucketed(old, "band_index", ["band", "sig"], 8)  # index persists once
        write_bucketed(new, "arrivals_b", ["band", "sig"], 8)
        idx = spark.table("band_index")
        arr = spark.table("arrivals_b")
        probe = arr.alias("a").join(
            idx.alias("i"),
            (F.col("a.band") == F.col("i.band")) & (F.col("a.sig") == F.col("i.sig")),
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert probe.count() > 0  # sf0.001 contains cross-batch dup bands
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS band_index")
        spark.sql("DROP TABLE IF EXISTS arrivals_b")


def test_salted_join_matches_plain_join(spark):
    """Salting must be invisible in the result: same rows as the plain
    join, even with a deliberately skewed fact side."""
    lineitem = load_table(spark, "lineitem", SF)
    # skew: map ~40% of rows onto one hot supplier key
    fact = lineitem.select(
        F.when(F.col("l_linenumber") <= 2, F.lit(1))
         .otherwise(F.col("l_suppkey")).alias("s_key"),
        "l_orderkey", "l_quantity",
    )
    dim = load_table(spark, "supplier", SF).select(
        F.col("s_suppkey").alias("s_key"), "s_name"
    )
    plain = fact.join(dim, "s_key").select("s_key", "l_orderkey", "s_name")
    salted = salted_join(fact, dim, "s_key").select("s_key", "l_orderkey", "s_name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_stateful_progress_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-batch progress accumulates across
    micro-batches (maxFilesPerTrigger=1 forces multiple batches)."""
    src = tmp_path / "blocks_src"
    src.mkdir()
    rows1 = [("b1", 0, '{"t":"header"}'), ("b1", 1, '{"t":"text"}'),
             ("b2", 0, '{"t":"header"}')]
    rows2 = [("b1", 2, '{"t":"text2"}'), ("b2", 1, '{"t":"quote"}')]
    schema = "batch_id string, block_index int, block_json string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite") \
        .parquet(str(src / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("overwrite") \
        .parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    progress = track_block_progress(stream)
    q = (
        progress.writeStream.format("memory").queryName("progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per batch_id reflects the accumulated totals
    final = {
        r.batch_id: r.n_blocks
        for r in spark.sql(
            "select batch_id, max(n_blocks) as n_blocks from progress group by batch_id"
        ).collect()
    }
    assert final == {"b1": 3, "b2": 2}


def test_banded_range_join_equals_naive(spark):
    """The banded-bucket range join must be row-equivalent to the naive
    theta-join formulation on adversarial data: events exactly on bucket
    boundaries, at band edges, duplicates, and cross-user decoys."""
    import random

    rng = random.Random(7)
    BAND = 600_000_000  # must match the operator's band width
    rows = []
    eid = 0
    for user in range(3):
        base = 1_700_000_000_000_000
        for _ in range(120):
            # cluster timestamps around bucket boundaries to stress edges
            t = base + rng.choice([0, 1, BAND - 1, BAND, BAND + 1,
                                   rng.randrange(0, 3 * BAND)])
            base += rng.randrange(0, BAND // 2)
            rows.append((eid, user, t, rng.choice(["purchase", "click", "view"]),
                         round(rng.uniform(0, 100), 3)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, value double"
    )

    p = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts_us").alias("p_us"),
    )
    c = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("c_us"),
    )
    naive = p.join(
        c,
        (p.user_id == c.c_user) & (c.c_us >= p.p_us - BAND) & (c.c_us < p.p_us),
    ).select("purchase_id", "click_id")

    cb = c.withColumn("bucket", F.expr(f"c_us div {BAND}"))
    probes = p.withColumn(
        "bucket",
        F.explode(F.expr(f"sequence((p_us - {BAND}) div {BAND}, p_us div {BAND})")),
    )
    banded = probes.join(
        cb,
        (probes.user_id == cb.c_user) & (probes.bucket == cb.bucket)
        & (cb.c_us >= probes.p_us - BAND) & (cb.c_us < probes.p_us),
    ).select("purchase_id", "click_id")

    assert banded.count() == naive.count()
    assert banded.exceptAll(naive).isEmpty()
    assert naive.exceptAll(banded).isEmpty()


def test_training_shard_write_layout(spark, tmp_path):
    """The shard writer must produce one directory per shard with rows
    readable back in exact (shard, pos) order, and partition pruning
    must reach the directory level when one shard is selected."""
    import pyspark.sql.functions as F

    from mediawiki_to_notion_spark.operators import QUERIES, load_all
    from mediawiki_to_notion_spark.operators.physical import write_training_shards

    load_all()
    assigned = QUERIES["training_shard_assignment"](spark, SF)
    out = str(tmp_path / "shards")
    write_training_shards(assigned, out, max_records_per_file=1000)

    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    n_shards = assigned.select("shard_id").distinct().count()
    assert len(dirs) == n_shards

    back = spark.read.parquet(out)
    assert back.count() == assigned.count()
    # per-shard replay order intact: positions are 1..n dense per shard
    chk = back.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos_in_shard").alias("mx"),
        F.min("pos_in_shard").alias("mn"),
    ).filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count()
    assert chk == 0
    # partition pruning: selecting one shard reads one directory
    one = back.filter(F.col("shard_id") == 0)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard_id" in plan \
        or "shard_id#" in plan  # pruned scan carries the partition filter
    assert one.count() == assigned.filter("shard_id = 0").count()
