"""r11 GEMM tile sizing: dedup_embedding_cosine's block count is now
derived from the corpus size (parquet-footer row count).  The pair set
and every cosine value must be identical at ANY block count — each
unordered pair lands in exactly one tile and the dot-product fold order
is dimension-sequential regardless of tiling."""

from __future__ import annotations

from mediawiki_to_notion_spark.operators import load_all
from mediawiki_to_notion_spark.operators.dedup import (
    COSINE_N_BLOCKS,
    COSINE_TILE_SIDE,
    _cosine_n_blocks,
    _cosine_pairs_blocked,
    _embedding_rows,
)

load_all()
SF = "/root/testdata/sf0.01"


def test_pairs_identical_across_block_counts(spark):
    ref = sorted(
        tuple(r) for r in _cosine_pairs_blocked(spark, SF, 1).collect()
    )
    assert ref, "fixture must produce at least one near-dup pair"
    for nb in (2, 5, 16):
        got = sorted(
            tuple(r) for r in _cosine_pairs_blocked(spark, SF, nb).collect()
        )
        assert got == ref, f"nb={nb} changed the result"


def test_block_count_derivation():
    n = _embedding_rows(SF)
    assert n and n > 0
    expected = max(1, min(2048, max(
        -(-n // COSINE_TILE_SIDE), min(COSINE_N_BLOCKS, -(-n // 128)))))
    assert _cosine_n_blocks(SF) == expected
    # the memory ceiling takes over past the floor: a corpus of 10M
    # rows must tile at ceil(10M / COSINE_TILE_SIDE) blocks, and the
    # bench corpus (2,000 rows at sf0.1) keeps the measured-optimal
    # 16-block floor
    assert _cosine_n_blocks("/root/testdata/sf0.1") == COSINE_N_BLOCKS
    # unknown input falls back to the static constant, never fails
    assert _cosine_n_blocks("/nonexistent/dir") == COSINE_N_BLOCKS
