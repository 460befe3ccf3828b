"""text_bigram_entropy_rate pins: a fully deterministic sequence
measures 0 (every next word determined), a k-way uniform branching
corpus measures ln(k)."""

from __future__ import annotations

import math
import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def _rate(spark, tmp_path, docs):
    d = spark.createDataFrame(
        list(enumerate(docs)), "doc_id int, text string"
    )
    d.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return QUERIES["text_bigram_entropy_rate"](spark, str(tmp_path)).collect()[0]


def test_deterministic_sequence_is_zero_entropy(spark, tmp_path):
    # "a b c a b c ..." — after each word the next is fixed.
    r = _rate(spark, tmp_path, [" ".join(["a", "b", "c"] * 50)])
    assert r["entropy_rate_nats"] == 0.0
    assert r["n_bigram_types"] == 3


def test_empty_bigram_corpus_matches_oracle_arity(spark, tmp_path):
    """ADVICE r7: a corpus where no document has >= 2 tokens must
    produce the SAME one-row (count 0-ish, NULL rates) shape in both
    engines — the old oracle's GROUP BY emitted zero rows there."""
    import os as _os

    from mediawiki_to_notion_spark.operators import ORACLES
    from mediawiki_to_notion_spark.oracle import compare

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int32()),
                  "text": ["single", "word", ""]}),
        _os.path.join(str(tmp_path), "documents.parquet"),
    )
    r = compare(spark, QUERIES["text_bigram_entropy_rate"],
                ORACLES["text_bigram_entropy_rate"], str(tmp_path))
    assert r["match"], r
    assert r["spark_rows"] == 1


def test_uniform_branching_measures_ln_k(spark, tmp_path):
    # From hub word "h", branch uniformly to x0..x3, each returning to
    # "h": bigrams h->xi (uniform over 4) and xi->h (determined).
    # H = p(h,*)*ln(4) + p(xi,h)*0 = 0.5*ln(4) = ln(2) nats.
    seq = []
    for i in range(200):
        seq += ["h", f"x{i % 4}"]
    r = _rate(spark, tmp_path, [" ".join(seq)])
    assert abs(r["entropy_rate_nats"] - math.log(4) / 2) < 2e-2
    assert abs(r["entropy_rate_bits"] - 1.0) < 3e-2  # ln2 nats = 1 bit
