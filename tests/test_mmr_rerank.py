"""similarity_mmr_rerank pins: MMR must DEFER a near-duplicate of an
already-selected result in favor of a diverse lower-relevance one —
the behavior that distinguishes it from plain top-k."""

from __future__ import annotations

import math
import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.functions.vectors import EMB_DIM

load_all()


def _vec(axis_rel: int, rel: float, axis_rest: int) -> list[float]:
    """Unit vector: `rel` mass on axis_rel, remainder on axis_rest."""
    v = [0.0] * EMB_DIM
    v[axis_rel] = rel
    v[axis_rest] = math.sqrt(max(0.0, 1.0 - rel * rel))
    return [float(x) for x in v]


def test_near_duplicate_is_deferred(spark, tmp_path):
    # Queries 0..4 point along mutually orthogonal axes 10..14, so no
    # query is a relevant candidate for another.  Candidates relate to
    # QUERY 0 (axis 10):
    #   A (vec 20): rel .95, spill on axis 2
    #   B (vec 21): rel .94, spill on the SAME axis 2
    #       -> cos(A,B) = .95*.94 + .312*.341 = .9995 (near-dup)
    #       -> mmr score 7*940000 - 3*999500  = 3.5815M
    #   C (vec 22): rel .88, spill on axis 3 (diverse)
    #       -> cos(A,C) = .95*.88 = .836
    #       -> mmr score 7*880000 - 3*836000  = 3.652M  > B's
    # Plain top-2 = (A, B); MMR top-2 must be (A, C), B only third.
    rows = [(qid, _vec(10 + qid, 1.0, 1), 0) for qid in range(5)]
    rows.append((20, _vec(10, 0.95, 2), 0))
    rows.append((21, _vec(10, 0.94, 2), 0))
    rows.append((22, _vec(10, 0.88, 3), 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    out = QUERIES["similarity_mmr_rerank"](spark, str(tmp_path)).collect()
    steps = {r["step"]: r["vec_id"] for r in out if r["query_id"] == 0}
    assert steps[0] == 20, steps          # most relevant first
    assert steps[1] == 22, steps          # diverse beats the near-dup
    assert steps[2] == 21, steps          # dup admitted only later


def test_mmr_is_subset_of_candidates_with_unique_steps(spark):
    out = QUERIES["similarity_mmr_rerank"](spark, "/root/testdata/sf0.001").collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        assert sorted(r["step"] for r in rows) == list(range(len(rows)))
        ids = [r["vec_id"] for r in rows]
        assert len(set(ids)) == len(ids)  # no repeats
        # step 0 is the relevance argmax; later scores never exceed it
        s0 = [r for r in rows if r["step"] == 0][0]
        assert all(r["score_u"] <= s0["score_u"] for r in rows)
