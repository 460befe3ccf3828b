"""The full story in one test: a web crawl (WARC) becomes training
shards through ONLY the engine's registered pieces.

crawl.warc.gz → read_warc (split-parallel scan)
             → warc_to_documents (documents contract)
             → apply_funnel (C4-style quality gates)
             → dedup_normalized_exact-style keep (exact dup cut)
             → shard_assign (content-addressed shuffle-and-shard)
             → write_training_shards (shard-partitioned parquet)

This is the product claim — "a user of the reference could run their
whole pipeline here" extended to the pretraining workflow — verified
end to end on real WARC bytes, with determinism pinned by running the
entire flow twice and requiring identical shard layouts."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _build_crawl(path):
    from mediawiki_to_notion_spark.sources.warc import encode_warc_record_gz

    prose = ("the quick river is of a bright valley and "
             + " ".join(f"word{i}" for i in range(20)))
    out = b""
    for k in range(12):
        if k in (7, 9):           # exact duplicates of page 3
            body = prose + " page3"
        elif k == 11:             # boilerplate page: fails the funnel
            body = "the the the the the " * 10
        else:
            body = f"{prose} page{k}"
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                   + body.encode())
        out += encode_warc_record_gz(
            {"WARC-Type": "response", "WARC-Record-ID": f"<urn:c:{k}>",
             "WARC-Target-URI": f"https://site{k % 3}.example.org/p/{k}",
             "Content-Type": "application/http; msgtype=response"},
            payload,
        )
    with open(path, "wb") as f:
        f.write(out)


def _run(spark, crawl_path, out_dir):
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        apply_funnel,
    )
    from mediawiki_to_notion_spark.operators.physical import (
        write_training_shards,
    )
    from mediawiki_to_notion_spark.operators.training_data import shard_assign
    from mediawiki_to_notion_spark.sources.warc import (
        read_warc,
        warc_to_documents,
    )

    docs = warc_to_documents(read_warc(spark, crawl_path))
    kept = apply_funnel(
        docs.select("doc_id", "lang", "text", "n_chars")
    ).filter("keep").select("doc_id")
    clean = docs.join(kept, "doc_id", "left_semi")
    # exact-dup cut: keep the smallest doc_id per normalized text
    first = clean.groupBy(F.lower(F.trim("text")).alias("norm")).agg(
        F.min("doc_id").alias("doc_id")
    )
    survivors = clean.join(first.select("doc_id"), "doc_id", "left_semi")
    assigned = shard_assign(survivors.select("doc_id", "text"))
    write_training_shards(assigned, out_dir)
    return assigned


def test_crawl_to_training_shards(spark, tmp_path):
    crawl = str(tmp_path / "crawl.warc.gz")
    _build_crawl(crawl)

    out1 = str(tmp_path / "shards1")
    assigned = _run(spark, crawl, out1)
    rows = assigned.collect()
    # 12 pages - 2 exact dups - 1 boilerplate = 9 surviving documents
    assert len(rows) == 9
    # every surviving doc has a shard and a contiguous 1..k position
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # the physical layout: one directory per shard, readable back in
    # replay order with pruning on shard_id
    shard_dirs = sorted(glob.glob(os.path.join(out1, "shard_id=*")))
    assert len(shard_dirs) == len(by_shard)
    back = spark.read.parquet(out1)
    assert back.count() == 9
    one = back.filter(F.col("shard_id") == rows[0].shard_id)
    assert one.count() == len(by_shard[rows[0].shard_id])

    # determinism: the identical crawl produces the identical shards
    out2 = str(tmp_path / "shards2")
    again = {(r.doc_id, r.shard_id, r.pos_in_shard)
             for r in _run(spark, crawl, out2).collect()}
    assert again == {(r.doc_id, r.shard_id, r.pos_in_shard) for r in rows}
