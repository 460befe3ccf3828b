"""Pins for training_curriculum_interleave and dedup_minhash_b_bit."""

from __future__ import annotations

import os

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()


def test_curriculum_easy_first_and_round_robin(spark, tmp_path):
    # Two sources, three docs each, distinct lengths per source.
    docs, i = [], 0
    for src, lens in (("s1", [5, 20, 9]), ("s2", [30, 7, 12])):
        for n in lens:
            docs.append((i, " ".join(f"x{i}_{j}" for j in range(n)), src))
            i += 1
    d = spark.createDataFrame(docs, "doc_id int, text string, source string")
    d.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    rows = QUERIES["training_curriculum_interleave"](spark, str(tmp_path)).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # Within each source, wave follows ascending length.
    assert [by_doc[j]["wave"] for j in (0, 2, 1)] == [0, 1, 2]      # s1: 5,9,20
    assert [by_doc[j]["wave"] for j in (4, 5, 3)] == [0, 1, 2]      # s2: 7,12,30
    # Each wave holds one doc per source, positions 0..1 by source order.
    for w in range(3):
        wave_rows = sorted(
            (r for r in rows if r["wave"] == w), key=lambda r: r["pos_in_wave"]
        )
        assert [r["source"] for r in wave_rows] == ["s1", "s2"]
        assert [r["pos_in_wave"] for r in wave_rows] == [0, 1]
    # Consuming (wave, pos) ascending = easy-first, sources interleaved.
    order = sorted(rows, key=lambda r: (r["wave"], r["pos_in_wave"]))
    assert [r["doc_id"] for r in order] == [0, 4, 2, 5, 1, 3]


def test_bbit_compression_tradeoff(spark):
    row = QUERIES["dedup_minhash_b_bit"](spark, "/root/testdata/sf0.001").collect()[0]
    # The compressed estimator can't beat the full one, but must stay
    # usable (paper's variance bound at b=4, 16 permutations).
    assert row["mean_abs_err_bbit"] >= row["mean_abs_err_full"]
    assert row["mean_abs_err_bbit"] < 0.25
    assert row["sig_bits_bbit"] * 7 <= row["sig_bits_full"]  # >=7x smaller
