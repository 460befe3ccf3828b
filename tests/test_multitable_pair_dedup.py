"""Multi-table LSH cross-table dedup must key on the PAIR, not on
float bit-equality (ADVICE r8).

A pair of identical vectors lands in the same SRP bucket in EVERY
table (cosine 1 puts them on the same side of every hyperplane), so
the pre-dedup union carries that pair once per table; the output must
carry it exactly once — and that guarantee must hold by construction
(dropDuplicates on (vec_a, vec_b)), not because the verify kernel
happens to emit bit-identical cosine_r in both tables.
"""

from __future__ import annotations

import os

import pytest

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def test_pair_found_by_both_tables_emits_one_row(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(7)
    n, d = 64, 64  # d=64: vector hygiene drops any other dimensionality
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    # plant an exact duplicate: vec 63 := vec 0 (same bucket in every
    # table -> the pair is found independently by both tables)
    vecs[63] = vecs[0]
    rows = [(int(i), [float(x) for x in vecs[i]], 0) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out_dir = os.path.join(str(tmp_path), "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out_dir)

    out = QUERIES["dedup_embedding_cosine_lsh_multitable"](
        spark, str(tmp_path)).collect()
    planted = [r for r in out if (r.vec_a, r.vec_b) == (0, 63)]
    assert len(planted) == 1, planted
    # and globally: one row per (vec_a, vec_b) pair
    pairs = [(r.vec_a, r.vec_b) for r in out]
    assert len(pairs) == len(set(pairs))
