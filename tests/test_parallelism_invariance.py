"""Parallelism invariance: the property that makes local results equal
cluster results.  Every helper that claims order-independence is run on
the SAME data partitioned 1-way and 17-way; results must be identical
row sets — not approximately, exactly.  (The cross-engine oracles catch
order dependence too, but only at the partitioning the test session
happens to use; this pins the claim directly.)"""

from __future__ import annotations

import pyspark.sql.functions as F

import pytest

from mediawiki_to_notion_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _both_partitionings(df):
    return df.repartition(1), df.repartition(17)


def test_shard_assign_invariant_under_partitioning(spark):
    from mediawiki_to_notion_spark.operators.training_data import shard_assign

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    one, many = _both_partitionings(docs)
    assert _rows(shard_assign(one)) == _rows(shard_assign(many))


def _norm_row(r):
    return tuple(tuple(v) if isinstance(v, list) else v for v in r)


@pytest.mark.slow  # r11 tier: registry-wide sweep, opt-in (VERDICT r10 #1)
def test_entire_registry_invariant_under_shuffle_partitions(spark):
    """SCALING.md's any-parallelism determinism claim, asserted for the
    WHOLE registry: every query returns the identical row multiset at 2
    and at 29 shuffle partitions.  Double-summation order dependence,
    partition-local state leaks, and first()-style nondeterminism all
    fail this.  The one sanctioned exception is uuid_batch_mint, whose
    uuid() column is nondeterministic BY DESIGN (rows-only at the gate;
    its content-addressed md5 column is covered by the oracle sweeps)."""
    from collections import Counter

    from mediawiki_to_notion_spark.operators import QUERIES, load_all

    load_all()
    skip = {"uuid_batch_mint"}

    def rows_at(n_parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        return {
            name: Counter(_norm_row(r) for r in fn(spark, SF).collect())
            for name, fn in sorted(QUERIES.items()) if name not in skip
        }

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        low, high = rows_at(2), rows_at(29)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    bad = [n for n in low if low[n] != high[n]]
    assert not bad, f"parallelism-dependent results in: {bad}"


def test_pack_sequences_invariant_under_partitioning(spark, tmp_path):
    """The r3 two-pass prefix sum must produce identical packing no
    matter how the input parquet is laid out: the range partitioning
    re-buckets rows, the localCheckpoint freezes ONE boundary sampling,
    and the offsets make the result a pure function of (doc_id,
    n_tokens).  Exercised by rewriting the documents table 1-way and
    17-way and running the registered query against each copy."""
    from mediawiki_to_notion_spark.operators.training_data import (
        pack_sequences_greedy,
    )

    docs = load_table(spark, "documents", SF)
    for n, sub in ((1, "one"), (17, "many")):
        docs.repartition(n).write.mode("overwrite").parquet(
            str(tmp_path / sub / "documents.parquet")
        )
    one = pack_sequences_greedy(spark, str(tmp_path / "one"))
    many = pack_sequences_greedy(spark, str(tmp_path / "many"))
    r_one, r_many = _rows(one), _rows(many)
    assert r_one == r_many
    # and both equal the run on the canonical table layout
    ref = _rows(pack_sequences_greedy(spark, SF))
    assert r_one == ref


def test_funnel_invariant_under_partitioning(spark):
    from mediawiki_to_notion_spark.operators.corpus_quality import apply_funnel

    docs = load_table(spark, "documents", SF) \
        .select("doc_id", "lang", "text", "n_chars")
    one, many = _both_partitionings(docs)
    assert _rows(apply_funnel(one)) == _rows(apply_funnel(many))


def test_shingle_pairs_invariant_under_partitioning(spark):
    from mediawiki_to_notion_spark.operators.dedup import (
        _hashed_shingles,
        _shingle_pairs,
    )

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    one, many = _both_partitionings(docs)
    assert _rows(_shingle_pairs(_hashed_shingles(one))) == \
        _rows(_shingle_pairs(_hashed_shingles(many)))


def test_minhash_signature_invariant_under_partitioning(spark):
    from mediawiki_to_notion_spark.streaming.dedup_stream import (
        minhash_signature_col,
    )

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    one, many = _both_partitionings(docs)
    sig = lambda d: d.select("doc_id", minhash_signature_col("text"))  # noqa: E731
    assert _rows(sig(one)) == _rows(sig(many))


def test_decimal_moments_invariant_under_partitioning(spark):
    """The exact-decimal sufficient-statistics aggregate must not move
    by an ulp between 1 and 17 partitions (a double-accumulating
    stddev/corr would)."""
    from mediawiki_to_notion_spark.operators.registry import QUERIES
    from mediawiki_to_notion_spark.operators import load_all

    load_all()
    # run the registered query twice under different session shuffle
    # parallelism; the load is internal, so vary shuffle partitions
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = _rows(QUERIES["stats_moments_lineitem"](spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(QUERIES["stats_moments_lineitem"](spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
