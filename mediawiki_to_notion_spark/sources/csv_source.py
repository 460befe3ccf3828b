"""CSV corpus source — the tabular interchange twin of the JSONL
source (metadata sidecars, crawl manifests, and labeling exports ship
as CSV).

Same 100 TB design points as sources/jsonl.py:

- **Line-delimited CSV is byte-splittable**: one huge manifest fans
  out across tasks.  The hard constraint that buys this: records must
  be one physical line — fields may contain quotes and commas (RFC4180
  quoting, doubled quotes), but RAW NEWLINES inside quoted fields are
  NOT supported on the splittable path (a newline-spanning record
  cannot be re-assembled after byte splitting).  Corpora must escape
  newlines (\\n) in fields; rows that look like split quoted records
  (odd number of quote characters on the line) are QUARANTINED rather
  than parsed into fabricated rows.
- **Explicit schema** — no double-pass nondeterministic inference.
- **PERMISSIVE + corrupt-record side-channel** — malformed rows (wrong
  arity, unparseable numerics, split-record fragments) land in
  ``_corrupt_record`` and route to the same quarantine discipline as
  JSONL (``jsonl.split_corrupt`` works on this frame unchanged).

Like the JSONL reader, this is ``read.text`` + ``from_csv`` rather
than ``read.csv``: a raw CSV scan's corrupt column is barely queryable
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN blocks any plan
pruned to it), while a parsed-struct column composes like any other
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_CSV_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long, "
    "_corrupt_record string"
)


def _field_names(schema: str) -> list[str]:
    """Top-level field names of a DDL schema string (paren-aware, so
    parameterized types like decimal(18,6) do not split)."""
    names, depth, start = [], 0, 0
    for i, ch in enumerate(schema + ","):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            part = schema[start:i].strip()
            start = i + 1
            if part and not part.startswith("_corrupt_record"):
                names.append(part.split()[0])
    return names


def load_documents_csv(spark: SparkSession, path: str,
                       schema: str = DOCUMENTS_CSV_SCHEMA,
                       header: bool = True,
                       strict_headers: bool = False) -> DataFrame:
    """Read a CSV documents table with explicit schema and corrupt-
    record capture.  ``path`` may be a file, directory, or glob.

    With ``header=True`` (default mode) any line byte-equal to the
    canonical header (the schema's field names, comma-joined) is
    dropped — per-file headers in a multi-file directory all match it.
    Caveat (r2 ADVICE): a MID-FILE line byte-identical to the header is
    dropped too, silently, rather than quarantined.  Under a typed
    schema such a line could never have parsed as data (the header's
    first token cannot parse as ``doc_id long``) — it would have been
    quarantined anyway — so the only loss is quarantine visibility of
    a pathological fragment.

    ``strict_headers=True`` removes that caveat exactly: only each
    file's true FIRST line is header-eligible (per-file min of
    monotonically_increasing_id — correct because split ids increase
    with (partition, row) and file splits are ordered, so the per-file
    min is the file's first physical line); mid-file header-equal
    lines then flow to the typed parse and land in ``_corrupt_record``.
    Costs one extra pass over the text (a map-side-combined per-file
    min + a broadcast join — no corpus shuffle), so it is opt-in for
    audit-grade ingestion rather than the default."""
    raw = spark.read.text(path)
    header_line = ",".join(_field_names(schema))
    if header and strict_headers:
        tagged = raw.select(
            "value",
            F.input_file_name().alias("_f"),
            F.monotonically_increasing_id().alias("_id"),
        )
        first = tagged.groupBy("_f").agg(F.min("_id").alias("_first"))
        raw = (
            tagged.join(F.broadcast(first), "_f")
            .filter(
                ~((F.col("_id") == F.col("_first"))
                  & (F.col("value") == header_line))
            )
            .select("value")
        )
    elif header:
        raw = raw.filter(F.col("value") != header_line)
    # a well-formed single-line RFC4180 record has an EVEN number of
    # quote characters; an odd count means this line is a fragment of a
    # record whose quoted field spanned a newline — parsing it would
    # fabricate a clean-looking row from the fragment, so quarantine it
    balanced = (
        F.length(F.regexp_replace("value", '[^"]', "")) % 2 == 0
    )
    parsed = raw.select(
        "value",
        balanced.alias("_balanced"),
        F.from_csv(
            "value", schema,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record",
             # RFC4180: quotes inside quoted fields are escaped by
             # doubling; Spark's default escape is backslash
             "escape": '"'},
        ).alias("d"),
    )
    # blank/whitespace lines parse to an all-null struct with no corrupt
    # marker — quarantine them instead of passing phantom rows (same
    # discipline as the JSONL reader)
    flat = parsed.select(
        "value", "_balanced",
        F.col("d").isNull().alias("_null_struct"), "d.*",
    )
    corrupt = F.coalesce(
        F.col("_corrupt_record"),
        F.when(
            F.col("_null_struct")
            | ~F.col("_balanced")
            | (F.trim("value") == ""),
            F.col("value"),
        ),
    )
    return (
        flat.withColumn("_corrupt_record", corrupt)
        .drop("value", "_null_struct", "_balanced")
    )
