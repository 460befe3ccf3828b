"""r10 narrow-rewrite parity pins.

The round-10 optimization replaced the explode + groupBy(doc_id)
aggregations of the MinHash and SimHash substrates with narrow per-row
array computations (``_doc_minhash_stats``) and an Arrow fingerprint
kernel (``_make_simhash_kernel``).  These tests pin the new forms
bit-identical to the ORIGINAL grouped formulations on a corpus that
exercises the edge cases: unicode text, repeated shingles, short docs
(below the 3-token floor), empty and NULL text, and a NULL doc_id.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.functions import hashing as H
from mediawiki_to_notion_spark.operators.dedup import (
    _doc_minhash_stats,
    _hashed_shingles,
    _make_simhash_kernel,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("narrow-stats-parity")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g a b c d"),
        (2, "a b c d e f g a b c d"),          # exact dup of 1
        (3, "x y z w v u t s r q p o n m"),
        (4, "a b"),                             # below the 3-token floor
        (5, ""),                                # empty text
        (6, None),                              # NULL text
        (None, "n u l l d o c i d"),            # NULL doc_id
        (7, "café Ångström ṩtudy café naïve résumé 日本語 テスト 中文 한국어"),
        (8, "tok tok tok tok tok tok tok tok"),  # one distinct shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_minhash_stats_matches_grouped(spark, docs):
    """(n, hs-as-set, mh0..15) of the narrow form == the grouped
    explode+agg original, per doc_id."""
    sh = _hashed_shingles(docs)
    grouped = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set("h").alias("hs"),
        *H.minhash_agg_columns(F.col("h")),
    )
    old = {r["doc_id"]: r for r in grouped.collect() if r["doc_id"] is not None}
    new = {r["doc_id"]: r
           for r in _doc_minhash_stats(docs).collect()
           if r["doc_id"] is not None}
    assert set(old) == set(new)
    for k, ro in old.items():
        rn = new[k]
        assert ro["n"] == rn["n"], k
        assert sorted(ro["hs"]) == sorted(rn["hs"]), k
        for i in range(H.N_MINHASH):
            assert ro[f"mh{i}"] == rn[f"mh{i}"], (k, i)


@pytest.mark.parametrize("n_bits", [16, 48])
def test_simhash_kernel_matches_grouped(spark, docs, n_bits):
    """The Arrow fingerprint kernel == the grouped ±1 bit-weight sums
    + combiner, at both shipped fingerprint widths."""
    sh = _hashed_shingles(docs)
    grouped = (
        sh.groupBy("doc_id")
        .agg(*H.simhash_bit_aggs(F.col("h"), n_bits))
        .select("doc_id", H.simhash_from_weights(n_bits).alias("simhash"))
    )
    old = {r["doc_id"]: r["simhash"] for r in grouped.collect()
           if r["doc_id"] is not None}

    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 3
    )
    new = {r["doc_id"]: r["simhash"]
           for r in toks.mapInPandas(
               _make_simhash_kernel(n_bits), "doc_id long, simhash long"
           ).collect()
           if r["doc_id"] is not None}
    assert old == new


def test_short_and_null_docs_produce_no_stats_row(spark, docs):
    """Docs below the 3-token floor, empty text and NULL text yield no
    stats row — the same population the grouped form produced."""
    ids = [r["doc_id"] for r in _doc_minhash_stats(docs).collect()]
    assert 4 not in ids and 5 not in ids and 6 not in ids
    assert set(i for i in ids if i is not None) == {1, 2, 3, 7, 8}
