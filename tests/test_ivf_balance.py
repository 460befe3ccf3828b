"""similarity_ivf_balance_audit pins: a constructed skewed codebook
reports the hot list first with the right load factor; invariants hold
(shares sum to 1, every vector accounted for)."""

from __future__ import annotations

import math
import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.functions.vectors import EMB_DIM
from mediawiki_to_notion_spark.operators.analytics_ext import N_CENTROIDS

load_all()


def _axis(axis: int) -> list[float]:
    v = [0.0] * EMB_DIM
    v[axis] = 1.0
    return [float(x) for x in v]


def test_skewed_codebook_flags_hot_list(spark, tmp_path):
    # Centroids = vec_ids 0..7 on axes 0..7.  24 more vectors all on
    # axis 0 -> list 0 holds 25 of 32 vectors (the 8 centroids assign
    # to themselves at cosine 1).
    rows = [(i, _axis(i), 0) for i in range(N_CENTROIDS)]
    rows += [(100 + j, _axis(0), 0) for j in range(24)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    out = QUERIES["similarity_ivf_balance_audit"](spark, str(tmp_path)).collect()
    assert sum(r["n_vectors"] for r in out) == 32
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-6
    hot = [r for r in out if r["hotness_rank"] == 1][0]
    assert hot["centroid_id"] == 0
    assert hot["n_vectors"] == 25
    assert math.isclose(hot["load_factor"], 25 * N_CENTROIDS / 32, rel_tol=1e-4)
    for r in out:
        if r["centroid_id"] != 0:
            assert r["n_vectors"] == 1
