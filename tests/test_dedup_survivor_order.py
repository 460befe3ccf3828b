"""Survivor-order regression for exact-substring dedup (VERDICT r5 #1).

The survivor of a duplicated window must be the lexicographic
(doc_id, position) minimum.  The r1-r5 implementation encoded that
order as ``min(doc_id * 1_000_000 + p)``, which ALIASES across
documents once any document has >= 1M token windows: position bleeds
into the doc_id digits and the survivor can be picked from the wrong
(higher-doc_id) document.  The DuckDB oracle used the same formula, so
the driver gate could never catch it — this fixture is the only
defence.  Both engines now use a struct/tuple min.
"""

from __future__ import annotations

import os

import pytest

from mediawiki_to_notion_spark.operators import QUERIES, load_all

load_all()

SPAN_W = 8  # must match operators.dedup_ext.SPAN_W

# Enough tokens that doc 1's duplicated window sits at p >= 1_000_000:
# under the old composite key, doc1's key (1*1M + 1_000_050) exceeds
# doc2's (2*1M + 0 = 2_000_000), flipping the survivor to doc 2.
DUP_POS = 1_000_050


@pytest.fixture(scope="module")
def million_token_docs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("survivor_order")
    phrase = [f"dup{i}" for i in range(SPAN_W)]
    doc1 = [f"a{i}" for i in range(DUP_POS)] + phrase
    doc2 = phrase + [f"b{i}" for i in range(SPAN_W)]
    df = spark.createDataFrame(
        [(1, " ".join(doc1)), (2, " ".join(doc2))], "doc_id int, text string"
    )
    df.coalesce(1).write.parquet(os.path.join(str(root), "documents.parquet"))
    return str(root)


def test_substring_cut_survivor_is_lexicographic_min(spark, million_token_docs):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["dedup_substring_cut"](spark, million_token_docs).collect()
    }
    # doc 1 holds the (doc_id, p) minimum occurrence -> survives intact.
    assert rows[1]["n_cut_tokens"] == 0
    assert rows[1]["n_kept_tokens"] == DUP_POS + SPAN_W
    # doc 2's copy of the window (its first SPAN_W tokens) is cut.
    assert rows[2]["n_cut_tokens"] == SPAN_W
    assert rows[2]["clean_text"] == " ".join(f"b{i}" for i in range(SPAN_W))


def test_substring_spans_extents_unaffected(spark, million_token_docs):
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in QUERIES["dedup_substring_spans_exact"](
            spark, million_token_docs
        ).collect()
    }
    assert (1, DUP_POS, DUP_POS + SPAN_W - 1) in spans
    assert (2, 0, SPAN_W - 1) in spans
