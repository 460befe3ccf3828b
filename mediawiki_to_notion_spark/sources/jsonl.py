"""JSONL corpus source — the interchange format LLM training corpora
actually ship in (one JSON document per line: The Pile, RedPajama,
Dolma all distribute this way).

Design points for 100 TB:

- **Line-delimited, NOT multiLine.**  JSONL files are byte-splittable
  (a reader can start at any newline), so one 500 GB file still fans
  out across the cluster.  `multiLine=true` (JSON arrays) forces one
  task per file — never use it for corpora.
- **Explicit schema.**  Schema inference reads the data twice and
  samples nondeterministically; corpus jobs pass the schema so the
  scan is single-pass and the types are stable.
- **PERMISSIVE with a corrupt-record side-channel.**  Web-scale JSONL
  always contains some malformed lines; they land in
  ``_corrupt_record`` instead of failing the job, and
  ``split_corrupt`` routes them to a quarantine frame (the
  warning-side-output discipline of plans/pipeline.decode_files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long, "
    "_corrupt_record string"
)


def load_documents_jsonl(spark: SparkSession, path: str,
                         schema: str = DOCUMENTS_JSONL_SCHEMA) -> DataFrame:
    """Read a JSONL documents corpus with explicit schema and corrupt-
    record capture.  ``path`` may be a file, directory, or glob.

    Implemented as ``read.text`` + ``from_json`` rather than
    ``read.json``: identical splittability and a single pass, but the
    corrupt-record column of a raw JSON scan is barely queryable
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN blocks any
    plan pruned to it), while a parsed-struct column composes like any
    other data."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    parsed = raw.select(
        "value",
        F.from_json(
            "value", schema,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("d"),
    )
    # from_json leaves _corrupt_record NULL for inputs that are not
    # malformed JSON yet are not documents either — blank/whitespace
    # lines and the JSON scalar `null` (both yield a null / all-null
    # struct).  Those must quarantine, not pass as phantom all-null rows.
    flat = parsed.select(
        "value", F.col("d").isNull().alias("_null_struct"), "d.*"
    )
    corrupt = F.coalesce(
        F.col("_corrupt_record"),
        F.when(
            F.col("_null_struct") | (F.trim("value") == ""), F.col("value")
        ),
    )
    return (
        flat.withColumn("_corrupt_record", corrupt)
        .drop("value", "_null_struct")
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): quarantine carries the raw malformed line
    for offline inspection; clean drops the side-channel column.

    The quarantine frame keeps every column (nulls + the raw line):
    Spark disallows queries whose only referenced column from a raw
    JSON scan is ``_corrupt_record``, and a full-row quarantine is what
    you want to persist anyway (the partial parse is diagnostic)."""
    clean = df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    bad = df.filter(df["_corrupt_record"].isNotNull())
    return clean, bad
