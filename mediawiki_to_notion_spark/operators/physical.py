"""Physical-layout operators for the 100 TB path: bucketing for
co-located (shuffle-free) joins and key salting for skew.

Neither changes query *semantics* — they are layout/plan tools, so they
live as library functions with plan-asserting tests rather than oracle
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_col: str | list[str],
                   n_buckets: int = 16, sort_col: str | None = None) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed identically on their join key co-locate: Spark
    plans the join with zero Exchange — at 100 TB that removes the
    dominant shuffle of every fact-fact join.  (The blocks table bucketed
    by batch_id gives shuffle-free blocks⋈pages and in-bucket
    block_index order for the upload sink.)  Composite join keys must
    bucket on the full key list: a subset-bucketed side satisfies the
    distribution only under non-default co-partition settings, so the
    portable contract is bucket-on-all-join-keys.
    """
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, cols[0], *cols[1:])
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def salted_join(fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: spray the fact side's hot keys across
    ``n_salts`` sub-keys and replicate the (small) dim side once per
    salt, so one giant key (the 500k-block page of reference FAQ.md:68)
    spreads over ``n_salts`` tasks instead of hot-spotting one.

    AQE's skew-join split handles sort-merge cases adaptively; explicit
    salting is the deterministic tool when the build side must replicate
    (or AQE is unavailable).  Result is column-identical to the plain
    join.

    The salt is hash-derived from the whole fact row (not `rand`): task
    retries and stage re-runs re-assign every row to the same salt, so
    speculative execution and fault recovery can never double- or
    drop-count — a correctness requirement on a real cluster, not a
    style choice.

    Determinism's price (accepted, documented):

    - byte-identical duplicate fact rows all land on ONE salt, so a hot
      key made of *repeated identical rows* is not spread at all.  If
      that's your skew, add a distinguishing column upstream (an ingest
      sequence number) — do NOT reach for rand()/monotonically_increasing_id,
      which reintroduce the retry hazard this design removes.
    - ``F.hash`` rejects MapType columns; project maps away (or to
      ``map_entries``) before salting.
    - a pre-existing ``_salt`` column on either side would collide with
      the internal key.
    """
    assert "_salt" not in fact.columns and "_salt" not in dim.columns, \
        "salted_join uses an internal _salt column; rename yours"
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(*fact.columns), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(
        salted_dim,
        [salted_fact[key] == salted_dim[key], salted_fact["_salt"] == salted_dim["_salt"]],
        how,
    )
    return out.drop(salted_dim[key]).drop(salted_fact["_salt"]).drop(salted_dim["_salt"])


def write_training_shards(assigned: DataFrame, path: str,
                          max_records_per_file: int | None = None) -> None:
    """Materialize the training corpus as shard-partitioned parquet:
    one directory per shard_id (``shard_id=N/``), rows within a shard
    laid out in their deterministic ``pos_in_shard`` order — the layout
    a training job reads sequentially per shard with no further
    shuffle.

    `repartition(shard_id)` aligns task boundaries with directories
    (one writer per shard — no tiny-file explosion across tasks), and
    `sortWithinPartitions` makes the file order the replay order.
    ``max_records_per_file`` caps file size so a huge shard splits into
    sequentially-numbered parts instead of one multi-GB file."""
    w = (
        assigned.repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard_id")
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def backfill_day_partition(day_df: DataFrame, path: str,
                           partition_col: str = "day",
                           max_records_per_file: int | None = None) -> None:
    """Replace exactly the date partitions present in ``day_df`` —
    dynamic partition overwrite, the standard backfill/late-data repair
    at 100 TB: re-deriving one bad day must never truncate the other
    partitions the way static ``mode("overwrite")`` does.

    The incoming partitioning is kept (every task writes its slice of
    each day): a repaired day spreads over all upstream tasks instead
    of funneling through one writer — the backfill frame is typically a
    handful of days, so the task x day file count stays small, and
    ``max_records_per_file`` caps file sizes like write_training_shards.

    Scoped via the session conf because the writer API has no per-write
    knob; the previous value is restored so the engine never leaks a
    global default change."""
    spark = day_df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        spark.conf.set(key, "dynamic")
        w = day_df.write.mode("overwrite").partitionBy(partition_col)
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", str(max_records_per_file))
        w.parquet(path)
    finally:
        spark.conf.set(key, prev)
