"""CSV corpus source — the tabular interchange twin of the JSONL
source (metadata sidecars, crawl manifests, and labeling exports ship
as CSV).

Same 100 TB design points as sources/jsonl.py:

- **Line-delimited CSV is byte-splittable** when ``multiLine`` is off:
  one huge manifest fans out across tasks.  Fields containing raw
  newlines would force multiLine — corpora should quote or escape them
  instead, and this reader deliberately keeps the splittable path.
- **Explicit schema** — no double-pass nondeterministic inference.
- **PERMISSIVE + corrupt-record side-channel** — malformed rows (wrong
  arity, unparseable numerics) land in ``_corrupt_record`` and route
  to the same quarantine discipline as JSONL (``jsonl.split_corrupt``
  works on this frame unchanged).

Like the JSONL reader, this is ``read.text`` + ``from_csv`` rather
than ``read.csv``: a raw CSV scan's corrupt column is barely queryable
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN blocks any plan
pruned to it — e.g. ``quarantine.count()``), while a parsed-struct
column composes like any other data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_CSV_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long, "
    "_corrupt_record string"
)


def _field_names(schema: str) -> list[str]:
    return [
        part.strip().split()[0]
        for part in schema.split(",")
        if part.strip() and not part.strip().startswith("_corrupt_record")
    ]


def load_documents_csv(spark: SparkSession, path: str,
                       schema: str = DOCUMENTS_CSV_SCHEMA,
                       header: bool = True) -> DataFrame:
    """Read a CSV documents table with explicit schema and corrupt-
    record capture.  ``path`` may be a file, directory, or glob.
    With ``header=True`` the canonical header line (the schema's field
    names, comma-joined) is dropped wherever it appears — per-file
    headers in a multi-file directory all match it."""
    raw = spark.read.text(path)
    if header:
        raw = raw.filter(
            F.col("value") != ",".join(_field_names(schema))
        )
    parsed = raw.select(
        "value",
        F.from_csv(
            "value", schema,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("d"),
    )
    # blank/whitespace lines parse to an all-null struct with no corrupt
    # marker — quarantine them instead of passing phantom rows (same
    # discipline as the JSONL reader)
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
