"""corpus_filter_agreement pins: a corpus constructed so two filters are
perfectly redundant reports Jaccard 1.0, and the matrix is computed in
ONE aggregation pass (no doc_id self-join)."""

from __future__ import annotations

import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def test_redundant_and_disjoint_filters(spark, tmp_path):
    # Doc class A (10 docs): 10 tokens, all distinct, half stopwords.
    #   -> r_short=True (10 < 30), r_ttr=False (1.0), r_top=True
    #      (0.1 > 0.10 is False... top share = 1/10 = 0.1, not > 0.1)
    #      so r_top=False, r_stop=False (0.5 >= 0.03).
    # Doc class B (5 docs): 40 tokens of ONE repeated word.
    #   -> r_short=False, r_ttr=True (1/40 < .55), r_top=True (1.0),
    #      r_stop=True (0 < .03).
    docs = []
    for i in range(10):
        toks = [f"u{i}_{j}" for j in range(5)] + ["the", "a", "of", "and", "is"]
        docs.append((i, " ".join(toks)))
    for i in range(5):
        docs.append((100 + i, " ".join(["rep"] * 40)))
    d = spark.createDataFrame(docs, "doc_id int, text string")
    d.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    rows = {
        (r["filter_a"], r["filter_b"]): r
        for r in QUERIES["corpus_filter_agreement"](spark, str(tmp_path)).collect()
    }
    # ttr / top / stop all reject exactly class B -> pairwise redundant.
    for pair in [("ttr", "top"), ("ttr", "stop"), ("top", "stop")]:
        assert rows[pair]["reject_jaccard"] == 1.0, pair
        assert rows[pair]["agree_rate"] == 1.0, pair
        assert rows[pair]["n_both"] == 5
    # short rejects exactly class A -> disjoint from the other three.
    for pair in [("short", "ttr"), ("short", "top"), ("short", "stop")]:
        assert rows[pair]["reject_jaccard"] == 0.0, pair
        assert rows[pair]["n_both"] == 0
        assert rows[pair]["n_only_a"] == 10
        assert rows[pair]["n_only_b"] == 5


def test_matrix_is_single_pass(spark):
    df = QUERIES["corpus_filter_agreement"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # all pair counters from one aggregate
    assert "CartesianProduct" not in plan
