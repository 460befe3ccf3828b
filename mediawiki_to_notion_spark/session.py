"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same settings are what we would
ship for a multi-executor cluster (AQE on, sane shuffle partitioning,
Arrow for the Pandas-UDF stages). Nothing here is local-mode-specific
except the master URL default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "mediawiki_to_notion_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    AQE is enabled so that at 100 TB the runtime can coalesce small
    shuffle partitions, re-plan skewed joins (a single wiki page with
    500k blocks — reference FAQ.md:68 — is exactly AQE's skew case),
    and convert sort-merge joins to broadcast when a filtered side
    turns out small.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Shuffles START wide (8x cores) and AQE coalesces DOWN
        # (parallelismFirst keeps >= default parallelism, so small-SF
        # plans are unchanged): a static 32 caps sort/agg partition
        # size at big SFs — the r7 sf1->sf10 soak measured
        # dedup_substring_cut at exponent 1.25 from exactly that
        # (150M-token rebuild shuffles spilling through 32 partitions;
        # 1.25 -> ~1.0 with this set).  At 100 TB this is the knob
        # that replaces hand-sizing shuffle.partitions per job.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(8 * int(cpus) if str(cpus).isdigit() else 256))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # no console progress bars: they interleave carriage-return
        # frames into stdout, which corrupts line-oriented captures
        # (the driver tail-parses bench.py's final JSON line)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
