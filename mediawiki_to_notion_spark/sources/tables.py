"""Parquet loaders for the driver's star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table per scale factor.

Scans are plain ``spark.read.parquet`` so Catalyst's parquet source
handles predicate pushdown / column pruning / partition pruning; at
100 TB these would be directory-partitioned Delta/Parquet tables and
the code below is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_confs(spark: SparkSession) -> None:
    """Session settings the engine depends on, applied defensively because
    the driver harness may hand us a session it built itself.

    - nanosAsLong: the testdata `events.ts` column is parquet
      TIMESTAMP(NANOS); Spark has no nanosecond timestamp type, so read it
      as a long and convert below.
    - UTC session timezone: keeps TIMESTAMP_NTZ → TIMESTAMP casts and
      epoch-millis math identical to the DuckDB oracle (which treats naive
      timestamps as UTC).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def _normalize_times(df: DataFrame) -> DataFrame:
    """Give every table a plain TIMESTAMP view of its time columns."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        elif f.name == "ts" and isinstance(f.dataType, T.LongType):
            # nanos-as-long → truncate to microseconds (what DuckDB's
            # TIMESTAMP does with parquet nanos as well).  The raw nanos
            # column is kept as ts_ns: filters on the *computed* ts can't
            # reach the parquet scan, so range predicates go on ts_ns
            # (see relational.time_range_scan) and prune at the source.
            # integer division, NOT floor(x / 1000): the double division
            # rounds at ~1.7e15 µs magnitudes and lands a microsecond off
            df = (
                df.withColumn("ts_ns", F.col(f.name))
                .withColumn(
                    f.name,
                    F.timestamp_micros(F.expr(f"{f.name} div 1000")),
                )
            )
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _ensure_confs(spark)
    return _normalize_times(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
