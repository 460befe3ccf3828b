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
