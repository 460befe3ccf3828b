"""Water-filling pins for source_token_budget_allocation: hand-computed
mixed full/capped case, exact-budget invariant, and the c+1 safety
property (no capped allocation exceeds its source)."""

from __future__ import annotations

import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def _run(spark, tmp_path, source_tokens):
    docs, i = [], 0
    for src, n in source_tokens.items():
        docs.append((i, " ".join(f"{src}t{j}" for j in range(n)), src))
        i += 1
    d = spark.createDataFrame(docs, "doc_id int, text string, source string")
    d.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return {
        r["source"]: r
        for r in QUERIES["source_token_budget_allocation"](
            spark, str(tmp_path)
        ).collect()
    }


def test_hand_computed_water_level(spark, tmp_path):
    # sizes 10, 20, 100, 100 -> total 230, budget 138.
    # sorted: s1=10 (full: 10 + 10*3 = 40 <= 138),
    #         s2=20 (full: 30 + 20*2 = 70 <= 138),
    #         s3=100 (30 + 100*2 = 230 > 138 -> capped),
    #         s4=100 capped.  k=2, prefix_k=30, c=(138-30)//2=54, r=0.
    rows = _run(spark, tmp_path, {"s1": 10, "s2": 20, "s3": 100, "s4": 100})
    assert rows["s1"]["alloc_tokens"] == 10 and not rows["s1"]["capped"]
    assert rows["s2"]["alloc_tokens"] == 20 and not rows["s2"]["capped"]
    assert rows["s3"]["alloc_tokens"] == 54 and rows["s3"]["capped"]
    assert rows["s4"]["alloc_tokens"] == 54 and rows["s4"]["capped"]
    assert sum(r["alloc_tokens"] for r in rows.values()) == 138


def test_remainder_goes_to_first_capped(spark, tmp_path):
    # sizes 10, 90, 90 -> total 190, budget 114.  s1 full (10+10*2=30
    # <=114); s2: 100 + 90 = 190 > 114 capped.  k=1, prefix_k=10,
    # c=(114-10)//2=52, r=0... pick sizes forcing r>0:
    # sizes 11, 90, 90 -> total 191, budget 114 (191*6//10).
    # s1 full (11+22=33<=114); c=(114-11)//2=51, r=1 -> first capped
    # in sort order (s2 by name tie-break on equal sizes) gets 52.
    rows = _run(spark, tmp_path, {"s1": 11, "s2": 90, "s3": 90})
    assert rows["s1"]["alloc_tokens"] == 11
    assert rows["s2"]["alloc_tokens"] == 52
    assert rows["s3"]["alloc_tokens"] == 51
    assert sum(r["alloc_tokens"] for r in rows.values()) == 114
    # c+1 safety: no capped allocation exceeds its source
    for r in rows.values():
        assert r["alloc_tokens"] <= r["n_tokens"]
        assert 0 < r["utilization"] <= 1.0
