"""Incremental corpus-index maintenance: the change feed drives
incremental near-dup detection — only newly-arrived documents are
signed and compared against the stored signature index, and the index
update is replay-idempotent.  This is the nightly 100 TB maintenance
loop (new crawl batch vs indexed corpus) end-to-end on the repo's own
storage layer."""

from __future__ import annotations

import pyspark.sql.functions as F

from mediawiki_to_notion_spark.sources.tables import load_table
from mediawiki_to_notion_spark.storage import ParquetTable
from mediawiki_to_notion_spark.streaming.dedup_stream import minhash_signature_col

SF = "/root/testdata/sf0.001"


def test_incremental_corpus_index_maintenance(spark, tmp_path):
    docs = (
        load_table(spark, "documents", SF)
        .select("doc_id", "text").orderBy("doc_id").limit(40).cache()
    )
    base = docs.filter(F.col("doc_id") < 30)

    corpus = ParquetTable(
        spark, str(tmp_path / "corpus"), key_cols=["doc_id"],
        schema="doc_id long, text string",
    )
    index = ParquetTable(
        spark, str(tmp_path / "sig_index"), key_cols=["doc_id"],
        schema="doc_id long, sig string",
    )
    corpus.upsert(base)
    index.upsert(base.select("doc_id", minhash_signature_col("text").alias("sig")))
    n0 = corpus._versions()[-1]

    # new arrival batch: 10 fresh docs + a re-crawl of doc 5 under a new id
    recrawl = base.filter(F.col("doc_id") == 5) \
        .select((F.col("doc_id") + 999).alias("doc_id"), "text")
    batch = docs.filter(F.col("doc_id") >= 30).unionByName(recrawl)
    corpus.upsert(batch)

    # 1. the change feed carries exactly the arrival batch
    feed = corpus.changes_since(n0)
    assert feed.count() == batch.count()

    # 2. only the feed is signed (no corpus re-scan), dups found by
    #    joining the stored index — the incremental O(|batch|) path
    new_sigs = feed.select(
        "doc_id", minhash_signature_col("text").alias("sig")
    ).cache()
    dups = (
        new_sigs.alias("n")
        .join(index.read().alias("o"), F.col("n.sig") == F.col("o.sig"))
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("o.doc_id").alias("dup_of"),
        )
    )
    found = {(r.new_doc, r.dup_of) for r in dups.collect()}
    assert (1004, 5) in found            # the re-crawl is caught
    fresh_ids = {r.new_doc for r in dups.select("new_doc").collect()}
    assert all(i == 1004 or i >= 30 for i in fresh_ids)

    # 3. index update is replay-idempotent (at-least-once delivery safe)
    index.upsert(new_sigs, insert_only=True)
    n_after = index.read().count()
    index.upsert(new_sigs, insert_only=True)  # replay
    assert index.read().count() == n_after == 30 + batch.count()
    docs.unpersist(); new_sigs.unpersist()
