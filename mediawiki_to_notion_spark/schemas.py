"""Explicit StructTypes for every engine table (SURVEY §1.1 rows 1-9).

The reference keeps schema implicit (dict-shaped items, pickled blocks —
store_notion_blocks.py:128-137); here every table is schema-first and
columnar at rest.  Pickle is replaced by a JSON block payload
(`block_json`) — SURVEY §1.1 row 5 flags pickle as a port-killer.
"""

from __future__ import annotations

from pyspark.sql import types as T

# §1.1 row 1 — wiki page (one <page> element of the dump)
WIKI_PAGE = T.StructType([
    T.StructField("page_id", T.LongType(), False),
    T.StructField("ns_id", T.IntegerType(), False),
    T.StructField("ns_name", T.StringType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("wikitext", T.StringType(), True),
])

# §1.1 row 3 — embedded binary upload
WIKI_FILE = T.StructType([
    T.StructField("filename", T.StringType(), False),
    T.StructField("encoding", T.StringType(), True),
    T.StructField("contents_b64", T.StringType(), True),
])

# §1.1 row 5/7 — NotionBlocks: keyed, order-preserving block store
NOTION_BLOCK = T.StructType([
    T.StructField("batch_id", T.StringType(), False),
    T.StructField("block_index", T.IntegerType(), False),
    T.StructField("s3_bucket", T.StringType(), True),
    T.StructField("s3_object_key", T.StringType(), True),
    T.StructField("block_type", T.StringType(), False),
    T.StructField("block_json", T.StringType(), False),
    T.StructField("uploaded_at", T.TimestampType(), True),  # replaces consume-delete
])

# §1.1 row 8 — NotionPages: per-page status machine
PAGE_STATUSES = ("NEW", "UPLOADING", "SUCCESS", "FAIL", "ABORTED")
NOTION_PAGE = T.StructType([
    T.StructField("batch_id", T.StringType(), False),
    T.StructField("s3_object_key", T.StringType(), True),
    T.StructField("status", T.StringType(), False),
    T.StructField("status_time", T.TimestampType(), False),
    T.StructField("page_url", T.StringType(), True),
])

# §1.1 row 9 — NotionPageFailures: append-only dead letters
PAGE_FAILURE = T.StructType([
    T.StructField("s3_object_key", T.StringType(), False),
    T.StructField("event_time", T.TimestampType(), False),
    T.StructField("s3_bucket", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
])

# warning side-output of the namespace router / template detector
PIPELINE_WARNING = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("key", T.StringType(), True),
    T.StructField("message", T.StringType(), True),
])
