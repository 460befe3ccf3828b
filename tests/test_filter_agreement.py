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


def test_kernel_excludes_tokenless_docs_and_matches_grouped_form(spark, tmp_path):
    """r11 kernel rewrite parity: the row-local signal kernel must
    reproduce the old (doc_id, token) groupBy semantics exactly —
    docs with NULL text or only empty tokens contribute NO row (the
    old per-doc aggregation had no group for them), stopword counts
    are occurrence counts, and the matrix equals the grouped-form
    reference computed here test-side."""
    from pyspark.sql import functions as F

    docs = [
        (1, None),                      # NULL text -> excluded
        (2, ""),                        # one empty token -> excluded
        (3, "   "),                     # only empty tokens -> excluded
        (4, "the the the a of"),        # 5 tokens, all stopwords
        (5, " ".join(f"w{i}" for i in range(40)) + " the"),
        (6, "x " * 60),                 # trailing-space split edge
    ]
    d = spark.createDataFrame(docs, "doc_id int, text string")
    d.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    got = sorted(
        tuple(r) for r in
        QUERIES["corpus_filter_agreement"](spark, str(tmp_path)).collect()
    )

    # grouped-form reference (the pre-r11 shape), same thresholds
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        AGREE_SHORT_TOKENS, AGREE_STOP_SHARE, AGREE_STOPWORDS,
        AGREE_TOP_SHARE, AGREE_TTR, _AGREE_PAIRS,
    )
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("max_cnt"),
        F.coalesce(
            F.sum(F.when(F.col("token").isin(*AGREE_STOPWORDS), F.col("cnt"))),
            F.lit(0),
        ).cast("long").alias("n_stop"),
    )
    assert per_doc.count() == 3  # docs 1-3 excluded
    sig = per_doc.select(
        (F.col("n_tokens") < AGREE_SHORT_TOKENS).alias("r_short"),
        (F.col("n_distinct").cast("double") / F.col("n_tokens") < AGREE_TTR)
        .alias("r_ttr"),
        (F.col("max_cnt").cast("double") / F.col("n_tokens") > AGREE_TOP_SHARE)
        .alias("r_top"),
        (F.col("n_stop").cast("double") / F.col("n_tokens") < AGREE_STOP_SHARE)
        .alias("r_stop"),
    ).collect()
    ref = []
    n = len(sig)
    for a, b in _AGREE_PAIRS:
        both = sum(1 for r in sig if r[f"r_{a}"] and r[f"r_{b}"])
        oa = sum(1 for r in sig if r[f"r_{a}"] and not r[f"r_{b}"])
        ob = sum(1 for r in sig if not r[f"r_{a}"] and r[f"r_{b}"])
        nn = sum(1 for r in sig if not r[f"r_{a}"] and not r[f"r_{b}"])
        agree = round((both + nn) / n, 6)
        jac = round(both / (both + oa + ob), 6) if both + oa + ob else 0.0
        ref.append((a, b, both, oa, ob, nn, agree, jac))
    assert got == sorted(ref)


def test_no_token_scale_exchange(spark):
    """r11 plan pin: the per-doc signals are row-local (MapInPandas);
    no (doc_id, token)-keyed Exchange may reappear before the single
    global aggregate."""
    df = QUERIES["corpus_filter_agreement"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "hashpartitioning(doc_id" not in plan
    assert "hashpartitioning(token" not in plan
