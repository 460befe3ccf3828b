"""similarity_prf_rocchio pin: query expansion must surface a document
the ORIGINAL query cannot see (cosine 0 to q) because it aligns with
the feedback set — the recall mechanism that distinguishes PRF from
re-running top-k."""

from __future__ import annotations

import math
import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.functions.vectors import EMB_DIM
from mediawiki_to_notion_spark.operators.similarity import PRF_K

load_all()


def _vec(parts: dict[int, float]) -> list[float]:
    v = [0.0] * EMB_DIM
    for axis, x in parts.items():
        v[axis] = x
    return [float(x) for x in v]


def test_expansion_recovers_orthogonal_doc(spark, tmp_path):
    # Queries 0..4 on orthogonal axes 10..14.  For query 0 (axis 10):
    # - 8 feedback docs: 0.9 on axis 10 + 0.436 on axis 2 (round-1 top-8)
    # - doc 30: PURE axis 2 -> cosine 0 to q, invisible in round 1
    # - docs 31/32: pure axes 4/5 -> orthogonal to q AND the feedback
    # After expansion q' gains axis-2 mass from the centroid, so doc 30
    # must rank directly below the 8 feedback docs (rank 9), above the
    # unrelated fillers.
    spill = math.sqrt(1 - 0.9 * 0.9)
    rows = [(qid, _vec({10 + qid: 1.0}), 0) for qid in range(5)]
    for j in range(PRF_K):
        rows.append((20 + j, _vec({10: 0.9, 2: spill}), 0))
    rows.append((30, _vec({2: 1.0}), 0))
    rows.append((31, _vec({4: 1.0}), 0))
    rows.append((32, _vec({5: 1.0}), 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    out = QUERIES["similarity_prf_rocchio"](spark, str(tmp_path)).collect()
    q0 = {r["rank"]: r for r in out if r["query_id"] == 0}
    # ranks 1..8 are the feedback cluster, in vec_id order (equal cosine)
    assert sorted(q0[r]["vec_id"] for r in range(1, PRF_K + 1)) == list(
        range(20, 20 + PRF_K)
    )
    assert q0[PRF_K + 1]["vec_id"] == 30          # recovered by expansion
    assert q0[PRF_K + 1]["cos_exp_r"] > 0.15      # real signal, not noise
    top_ids = {r["vec_id"] for r in out if r["query_id"] == 0}
    assert q0[PRF_K + 2]["cos_exp_r"] < q0[PRF_K + 1]["cos_exp_r"]
    assert 31 not in top_ids or (
        q0[PRF_K + 1]["vec_id"] == 30
    )  # fillers never outrank the recovered doc
