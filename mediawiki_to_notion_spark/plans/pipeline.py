"""The reference's three entry points as batch DataFrame plans
(SURVEY §3).

1. `process_dump` — XML dump → cleaned, converted markdown pages +
   decoded binary files + warning side-outputs
   (process-mw-dump.py:389-398 CLI equivalent).
2. `store_blocks` — staged markdown → ordered block rows + page rows
   with status NEW (store_notion_blocks.py:75-165 equivalent).
3. the upload stage lives in streaming/upload.py (its natural home —
   the reference runs it as an event-driven state machine).

Ordering of stages follows SURVEY §4: cheap relational filters first
(namespace route, empty/redirect), regex chain next (codegen), the
Python stages (fencer / markdown parse) last and Arrow-batched —
UDFs are optimizer barriers, so the barrier sits behind every pushdownable
predicate by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.functions import wikitext as wt
from mediawiki_to_notion_spark.functions.markdown_blocks import (
    BLOCK_ROWS_DDL,
    markdown_to_block_rows,
)

WIKITEXT_NS = (0, 14)   # Main, Category → WikitextParser route
FILE_NS = (6,)          # File → FileParser route


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ahead of an Arrow/Python stage when the input arrives
    in fewer splits than the cluster has cores (a single small parquet
    file otherwise serializes the whole UDF stage through one worker).
    No-op at real scale, where the source already has many splits."""
    if df.isStreaming:
        # a streaming frame has no static partition count to probe
        # (df.rdd raises); micro-batch parallelism comes from the
        # source, and the shared batch/stream cores stay usable either
        # way (r10)
        return df
    target = min_partitions or min(
        8, df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def route_pages(pages: DataFrame) -> DataFrame:
    """Namespace router (process-mw-dump.py:46-79): adds a `route`
    column ∈ {wikitext, file, skip}."""
    return pages.withColumn(
        "route",
        F.when(F.col("ns_id").isin(*WIKITEXT_NS), "wikitext")
         .when(F.col("ns_id").isin(*FILE_NS), "file")
         .otherwise("skip"),
    )


def skipped_warnings(routed: DataFrame) -> DataFrame:
    """The skip-with-warning side output."""
    return routed.filter(F.col("route") == "skip").select(
        F.lit("namespace_router").alias("source"),
        F.col("title").alias("key"),
        F.concat(F.lit("ignoring namespace "), F.col("ns_id").cast("string"))
         .alias("message"),
    )


def prepare_pages(routed: DataFrame) -> DataFrame:
    """Wikitext route: filters → rule chain → fencer → title/filename
    projections → unhandled-template warning column."""
    w = (
        routed.filter(F.col("route") == "wikitext")
        .filter(~wt.is_empty_page(F.col("wikitext")))
        .filter(~wt.is_redirect(F.col("wikitext")))
    )
    bare = wt.title_without_namespace(F.col("title"), F.col("ns_id"))
    return (
        w.withColumn("cleaned", wt.prepare_wikitext(F.col("wikitext"), F.col("ns_name")))
        .withColumn("bare_title", bare)
        .withColumn("filename", wt.safe_filename(bare))
        .withColumn("unhandled_template", wt.unhandled_template(F.col("cleaned")))
    )


def decode_files(files: DataFrame) -> tuple[DataFrame, DataFrame]:
    """File route: base64 guard (process-mw-dump.py:160-163) → decoded
    binary rows + error side-output."""
    ok = files.filter(F.col("encoding") == "base64").select(
        "filename",
        F.unbase64(F.regexp_replace("contents_b64", r"\s+", "")).alias("content"),
    )
    bad = files.filter(
        F.col("encoding").isNull() | (F.col("encoding") != "base64")
    ).select(
        F.lit("file_decoder").alias("source"),
        F.col("filename").alias("key"),
        F.concat(F.lit("expected base64 encoding, got "),
                 F.coalesce(F.col("encoding"), F.lit("NULL"))).alias("message"),
    )
    return ok, bad


def store_blocks(staged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Staged markdown (s3_object_key, markdown[, batch_id]) → (ordered
    block rows, page rows with status NEW).

    The reference mints a uuid4 per file (store_notion_blocks.py:86);
    here batch_id is content-addressed (md5 of key) by default so the
    whole pipeline is deterministic and re-runs are idempotent — an
    explicit batch_id column wins if present."""
    if "batch_id" not in staged.columns:
        staged = staged.withColumn("batch_id", F.md5("s3_object_key"))
    if "s3_bucket" not in staged.columns:
        staged = staged.withColumn("s3_bucket", F.lit("local"))

    blocks = (
        ensure_parallelism(staged.select("batch_id", "s3_object_key", "markdown"))
        .mapInPandas(markdown_to_block_rows, BLOCK_ROWS_DDL)
    )
    bucket = staged.select("batch_id", "s3_bucket").alias("m")
    blocks = (
        blocks.alias("b")
        .join(F.broadcast(bucket), "batch_id")
        .select("b.batch_id", "b.block_index", F.col("m.s3_bucket").alias("s3_bucket"),
                "b.s3_object_key", "b.block_type", "b.block_json",
                F.lit(None).cast("timestamp").alias("uploaded_at"))
    )
    pages = staged.select(
        "batch_id", "s3_object_key",
        F.lit("NEW").alias("status"),
        F.current_timestamp().alias("status_time"),
        F.lit(None).cast("string").alias("page_url"),
    )
    return blocks, pages
