"""Partitioned-layout sink + partition pruning — the at-rest layout the
engine uses for its tables at 100 TB (date/namespace partition dirs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediawiki_to_notion_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_and_pruning(spark, tmp_path):
    events = load_table(spark, "events", SF).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    events.write.mode("overwrite").partitionBy("day").parquet(out)

    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-02")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the day predicate must prune at the directory level, not post-scan
    assert "PartitionFilters: [isnotnull(day" in plan
    assert back.count() == events.filter(F.col("day") == "2024-01-02").count()


def test_ns_partitioned_markdown_layout(spark, tmp_path):
    """The reference writes <outdir>/<ns_name>/<file>.md; the columnar
    twin partitions by ns_name so per-namespace reads scan one dir."""
    pages = spark.createDataFrame(
        [("Main", "a", "# A"), ("Main", "b", "# B"), ("Category", "c", "# C")],
        "ns_name string, filename string, markdown string",
    )
    out = str(tmp_path / "staged")
    pages.write.mode("overwrite").partitionBy("ns_name").parquet(out)
    main_only = spark.read.parquet(out).filter(F.col("ns_name") == "Main")
    plan = main_only._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ns_name" in plan
    assert main_only.count() == 2


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Backfilling one day replaces only that day's partition: other
    days keep their rows AND their physical files (no rewrite)."""
    import glob
    import os

    from mediawiki_to_notion_spark.operators.physical import (
        backfill_day_partition,
    )

    out = str(tmp_path / "events_by_day")
    events = load_table(spark, "events", SF).withColumn(
        "day", F.to_date("ts")
    ).select("event_id", "day", "event_type", "value")
    events.write.mode("overwrite").partitionBy("day").parquet(out)

    days = sorted(r.day for r in events.select("day").distinct().collect())
    target, untouched = days[0], days[1]
    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, f"day={untouched}", "*.parquet"))
    }
    assert files_before

    fixed = events.filter(F.col("day") == F.lit(target)).withColumn(
        "value", F.col("value") * 2
    )
    backfill_day_partition(fixed, out)

    got = spark.read.parquet(out)
    # target day carries the backfilled values, other days are unchanged
    orig_t = events.filter(F.col("day") == F.lit(target))
    assert got.filter(F.col("day") == F.lit(target)).agg(
        F.round(F.sum("value"), 3)
    ).collect()[0][0] == orig_t.agg(
        F.round(F.sum("value") * 2, 3)
    ).collect()[0][0]
    assert got.filter(F.col("day") == F.lit(untouched)).count() == \
        events.filter(F.col("day") == F.lit(untouched)).count()
    files_after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, f"day={untouched}", "*.parquet"))
    }
    assert files_after == files_before  # untouched partition not rewritten
    # the conf was restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
