"""Oracle parity and crash-safety under NULL-injected inputs.

Real 100 TB corpora carry NULLs — failed extractions, absent metadata,
truncated embedding rows.  The driver's testdata has none, so this
sweep re-verifies every query on copies of the tables with NULLs (and
empty strings / empty vectors) injected:

- documents: ~10% NULL text, some empty-string text, NULL lang/source,
  NULL n_chars;
- events: NULL value and NULL event_type rows;
- embeddings: NULL vectors, zero-length vectors, NULL labels.

The first run of this sweep found and pinned fixes for: the whole
vector-math family crashing on NULL/empty vectors in BOTH engines
(now hygiene-filtered at the math boundary — functions.vectors),
multimodal Arrow kernels crashing on ``bytes(None)``, Spark
``to_json``'s null-field dropping diverging from SQL string
concatenation, paragraph-synth divergence on blank slices, and a
NULLS FIRST/LAST tie-break flip in knn voting.
"""

from __future__ import annotations

import os
import shutil

import pytest

from mediawiki_to_notion_spark.operators import ORACLES, QUERIES, load_all
from mediawiki_to_notion_spark.oracle import compare

load_all()
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("null_sf"))
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT doc_id,
                 CASE WHEN doc_id % 10 = 3 THEN NULL
                      WHEN doc_id % 20 = 7 THEN ''
                      ELSE text END AS text,
                 CASE WHEN doc_id % 10 = 5 THEN NULL ELSE lang END AS lang,
                 CASE WHEN doc_id % 15 = 2 THEN NULL ELSE source END AS source,
                 CASE WHEN doc_id % 12 = 4 THEN NULL ELSE n_chars END AS n_chars
          FROM '{SRC}/documents.parquet' ORDER BY doc_id)
    TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (SELECT vec_id,
                 CASE WHEN vec_id % 11 = 3 THEN NULL
                      WHEN vec_id % 13 = 5 THEN []::FLOAT[]
                      ELSE embedding END AS embedding,
                 CASE WHEN vec_id % 9 = 2 THEN NULL ELSE label END AS label
          FROM '{SRC}/embeddings.parquet' ORDER BY vec_id)
    TO '{d}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.close()
    # events via pyarrow so ts keeps its physical parquet type exactly
    t = pq.read_table(f"{SRC}/events.parquet")
    vals = [None if i % 7 == 3 else v
            for i, v in enumerate(t.column("value").to_pylist())]
    # Pin the ADVICE-r7 CUPED divergence class: the events holding the
    # min and max timestamps get NULL values, so any query deriving
    # time bounds from a differently-NULL-filtered row set than its
    # oracle shifts its cutover and diverges.
    ts_list = t.column("ts").to_pylist()
    vals[ts_list.index(min(ts_list))] = None
    vals[ts_list.index(max(ts_list))] = None
    types = [None if i % 13 == 4 else v
             for i, v in enumerate(t.column("event_type").to_pylist())]
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa.array(vals, type=t.schema.field("value").type))
    t = t.set_column(t.schema.get_field_index("event_type"), "event_type",
                     pa.array(types, type=t.schema.field("event_type").type))
    pq.write_table(t, f"{d}/events.parquet", version="2.6")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{d}/{name}.parquet")
    return d


def _oracle_for(name: str, sf_dir: str) -> str:
    """Input-pinned sequential-reference oracles are rebuilt for the
    swept dir (same discipline as test_adversarial_distribution): the
    sequential Python twin runs on the null-injected inputs too."""
    if name == "pipeline_prepare_convert":
        from mediawiki_to_notion_spark.operators.pipeline_queries import (
            _prepare_convert_oracle,
        )

        return _prepare_convert_oracle(sf_dirs=(sf_dir,))
    return ORACLES[name]


@pytest.mark.slow  # r11 tier: registry-wide sweep, opt-in (VERDICT r10 #1)
def test_all_oracles_match_on_null_injected_data(spark, null_sf_dir):
    failures = []
    for name in sorted(ORACLES):
        try:
            r = compare(spark, QUERIES[name], _oracle_for(name, null_sf_dir),
                        null_sf_dir)
            if not r["match"]:
                failures.append(f"{name}: {r}")
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_streaming_funnel_survives_null_injected_batch(spark, null_sf_dir,
                                                       tmp_path):
    """Batch/stream unification under NULLs: the same apply_funnel code
    over a readStream of the NULL-injected documents neither crashes
    nor diverges from the batch run (a NULL-text micro-batch at ingest
    must not kill a long-running stream)."""
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        apply_funnel,
    )
    from mediawiki_to_notion_spark.sources.tables import load_table

    docs = load_table(spark, "documents", null_sf_dir) \
        .select("doc_id", "lang", "text", "n_chars")
    # file streams need a DIRECTORY source; stage the single-file
    # fixture table as one
    src = tmp_path / "null_docs_dir"
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        "doc_id long, lang string, text string, n_chars long"
    ).parquet(str(src))
    q = (
        apply_funnel(stream)
        .writeStream.format("memory").queryName("null_funnel_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_null_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.drop_reason, r.keep)
        for r in spark.sql(
            "select doc_id, drop_reason, keep from null_funnel_stream"
        ).collect()
    }
    want = {
        (r.doc_id, r.drop_reason, r.keep)
        for r in apply_funnel(docs).collect()
    }
    assert got == want and len(want) == docs.count()


def test_rows_only_queries_survive_null_injected_data(spark, null_sf_dir):
    failures = []
    for name in sorted(set(QUERIES) - set(ORACLES)):
        try:
            assert QUERIES[name](spark, null_sf_dir).count() >= 0
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
