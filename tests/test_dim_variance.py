"""embedding_dim_variance_audit pins: a constant dimension flags dead,
a spread one doesn't, and variance is exact."""

from __future__ import annotations

import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.functions.vectors import EMB_DIM

load_all()


def test_dead_and_live_dims(spark, tmp_path):
    # dim 0: alternating +/-0.5 -> var .25 -> 250000 micro, rank 1.
    # dim 1: constant 0.3 -> var 0 -> dead.
    # dims 2..: zero -> dead.
    rows = []
    for i in range(40):
        v = [0.0] * EMB_DIM
        v[0] = 0.5 if i % 2 == 0 else -0.5
        v[1] = 0.3
        rows.append((i, [float(x) for x in v], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    out = {r["dim"]: r for r in
           QUERIES["embedding_dim_variance_audit"](spark, str(tmp_path)).collect()}
    assert len(out) == EMB_DIM
    assert out[0]["var_micro"] == 250_000 and out[0]["is_dead"] is False
    assert out[0]["variance_rank"] == 1
    assert out[0]["mean_micro"] == 0
    assert out[1]["var_micro"] == 0 and out[1]["is_dead"] is True
    assert out[1]["mean_micro"] == 300_000
    assert all(out[k]["is_dead"] for k in range(2, EMB_DIM))
