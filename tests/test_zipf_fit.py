"""text_zipf_fit sanity pins: a constructed Zipfian corpus fits slope
~ -1 with high R^2, and the top-N cut plans as TakeOrdered (no global
sort)."""

from __future__ import annotations

import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def test_zipfian_corpus_fits_minus_one(spark, tmp_path):
    # token w_i appears floor(2000 / i) times, i = 1..40: exact Zipf.
    tokens = []
    for i in range(1, 41):
        tokens += [f"w{i:02d}"] * (2000 // i)
    # spread across docs (doc boundaries are irrelevant to the fit)
    docs = [
        (d, " ".join(tokens[d * 200:(d + 1) * 200]))
        for d in range((len(tokens) + 199) // 200)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    row = QUERIES["text_zipf_fit"](spark, str(tmp_path)).collect()[0]
    assert row["n_types"] == 40
    assert row["n_top"] == 40
    assert -1.05 < row["zipf_slope"] < -0.95
    assert row["r2"] > 0.99


def test_top_cut_is_take_ordered(spark):
    df = QUERIES["text_zipf_fit"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
