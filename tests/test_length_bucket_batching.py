"""Edge pins for training_length_bucket_batching's integer bucket math.

The bucket edge must be EXACT: a doc of exactly 2^k tokens belongs to
the 2^k bucket, 2^k + 1 to the next — the class of bug a float log2
formulation would hide (one ulp under an exact power of two misbuckets
every edge-sitting doc).
"""

from __future__ import annotations

import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def _run(spark, tmp_path, token_counts):
    docs = [
        (i, " ".join(f"t{j}" for j in range(n)))
        for i, n in enumerate(token_counts)
    ]
    d = spark.createDataFrame(docs, "doc_id int, text string")
    d.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    rows = QUERIES["training_length_bucket_batching"](spark, str(tmp_path)).collect()
    return {r["bucket_len"]: r for r in rows}


def test_bucket_edges_exact(spark, tmp_path):
    by_bucket = _run(spark, tmp_path, [1, 15, 16, 17, 64, 65])
    # 1, 15, 16 -> clamped/exact 16-bucket; 17 -> 32; 64 -> 64; 65 -> 128
    assert by_bucket[16]["n_docs"] == 3
    assert by_bucket[32]["n_docs"] == 1
    assert by_bucket[64]["n_docs"] == 1
    assert by_bucket[128]["n_docs"] == 1


def test_capacity_and_batch_count(spark, tmp_path):
    # Nine 100-token docs -> bucket 128, capacity 4096//128 = 32, 1 batch;
    # pad waste = 1 - 900/(9*128).
    by_bucket = _run(spark, tmp_path, [100] * 9)
    r = by_bucket[128]
    assert r["batch_capacity"] == 32
    assert r["n_batches"] == 1
    assert abs(r["pad_waste"] - (1 - 900 / (9 * 128))) < 1e-9


def test_oversized_doc_clamps_to_one_per_batch(spark, tmp_path):
    # 5000 tokens -> bucket 8192 > budget 4096 -> capacity clamps to 1.
    by_bucket = _run(spark, tmp_path, [5000, 5000])
    r = by_bucket[8192]
    assert r["batch_capacity"] == 1
    assert r["n_batches"] == 2
