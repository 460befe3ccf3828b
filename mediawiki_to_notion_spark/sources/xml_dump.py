"""MediaWiki XML dump source.

The reference streams the dump with SAX-style iterparse + element.clear()
to bound memory (process-mw-dump.py:35-89).  The Spark-native equivalent
keeps exactly that property per task: `binaryFile` scan → `mapInPandas`
running an incremental iterparse generator, so a 100 TB dump splits into
one task per file (dumps ship as many part files) with constant memory
per task.  No spark-xml dependency needed.

Outputs two frames: pages (ns routing per process-mw-dump.py:46-79) and
embedded files (<upload> elements, :147-155).
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.schemas import WIKI_FILE, WIKI_PAGE

PAGE_SCHEMA_DDL = (
    "page_id long, ns_id int, ns_name string, title string, wikitext string, "
    "upload_filename string, upload_encoding string, upload_contents_b64 string"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def iter_dump(stream) -> Iterator[dict]:
    """Incremental parse of one dump file: yields page dicts; clears
    elements as it goes so memory stays bounded (the reference's
    element.clear() discipline, process-mw-dump.py:89)."""
    namespaces: dict[int, str] = {}
    page_seq = 0
    for event, elem in ET.iterparse(stream, events=("end",)):
        tag = _local(elem.tag)
        if tag == "namespace":
            key = int(elem.get("key", "0"))
            # key 0 has no text; the reference renames it "Main"
            namespaces[key] = elem.text if elem.text else "Main"
            elem.clear()
        elif tag == "page":
            ns_el = elem.find("{*}ns")
            title_el = elem.find("{*}title")
            rev_text = elem.find("{*}revision/{*}text")
            upload = elem.find("{*}upload")
            ns_id = int(ns_el.text) if ns_el is not None else 0
            title = title_el.text if title_el is not None else None
            row = {
                "page_id": page_seq,
                "ns_id": ns_id,
                "ns_name": namespaces.get(ns_id),
                "title": title,
                "wikitext": rev_text.text if rev_text is not None else None,
                "upload_filename": None,
                "upload_encoding": None,
                "upload_contents_b64": None,
            }
            if upload is not None:
                fn = upload.find("{*}filename")
                contents = upload.find("{*}contents")
                row["upload_filename"] = fn.text if fn is not None else None
                if contents is not None:
                    row["upload_encoding"] = contents.get("encoding")
                    row["upload_contents_b64"] = contents.text
            page_seq += 1
            yield row
            elem.clear()


PARSE_CHUNK_ROWS = 1000


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stream pages out in fixed-size chunks: peak task memory is one
    file's bytes (binaryFile's intrinsic bound — dump parts are sized
    accordingly) plus ONE chunk of parsed rows, never the whole file's
    rows at once — a giant part file cannot OOM the parse stage."""
    cols = [
        "page_id", "ns_id", "ns_name", "title", "wikitext",
        "upload_filename", "upload_encoding", "upload_contents_b64",
    ]

    def flush(buf: list, path: str) -> pd.DataFrame:
        out = pd.DataFrame(buf, columns=cols)
        out["source_file"] = path
        return out

    for pdf in batches:
        for path, content in zip(pdf["path"], pdf["content"]):
            buf: list[dict] = []
            for row in iter_dump(io.BytesIO(bytes(content))):
                buf.append(row)
                if len(buf) >= PARSE_CHUNK_ROWS:
                    yield flush(buf, path)
                    buf = []
            if buf:
                yield flush(buf, path)


def read_dump(spark: SparkSession, path: str) -> DataFrame:
    """Dump file(s) → raw page rows (pages and uploads in one frame).

    Real dumps ship as many part files; the in-file sequence number is
    only unique per file, so the global page_id is content-addressed on
    (source file, sequence) — stable across re-runs and partitionings,
    unlike monotonically_increasing_id."""
    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    raw = binary.mapInPandas(_parse_batches, PAGE_SCHEMA_DDL + ", source_file string")
    return raw.withColumn(
        "page_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", "source_file", F.col("page_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long"),
    ).drop("source_file")


def split_pages_files(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route the raw frame into (pages, embedded files) — the ns_id=6
    File namespace carries uploads (process-mw-dump.py:59-68)."""
    pages = raw.select([f.name for f in WIKI_PAGE.fields])
    files = (
        raw.filter(F.col("upload_filename").isNotNull())
        .select(
            F.col("upload_filename").alias("filename"),
            F.col("upload_encoding").alias("encoding"),
            F.col("upload_contents_b64").alias("contents_b64"),
        )
    )
    assert [f.name for f in WIKI_FILE.fields] == files.columns
    return pages, files
