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
