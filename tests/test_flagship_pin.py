"""Pin the flagship composition at sf0.1 (VERDICT r2 item 7).

``corpus_prepare_pipeline`` (funnel ∩ dedup-survivorship → shard) is the
query most likely to shift silently when ANY component changes — the
funnel thresholds, the MinHash bands, the CC loop, survivorship
tie-breaks, or the shard salt all feed it.  The oracle gate checks it at
sf0.01; this pins the composed result at sf0.1 so a component rewrite
that changes the composition at larger scale cannot land unnoticed.

If this fails after an INTENTIONAL semantic change to a component,
recompute: rows = sorted(tuple(r) for r in df.collect());
sha256(repr(rows)).hexdigest()[:16] — and update both constants in the
same commit as the semantic change.
"""

from __future__ import annotations

import hashlib

SF01 = "/root/testdata/sf0.1"

EXPECT_ROWS = 795
EXPECT_SHA16 = "a0f2417def7eb395"


def test_corpus_prepare_pipeline_pinned_at_sf01(spark):
    from mediawiki_to_notion_spark.operators import QUERIES, load_all

    load_all()
    df = QUERIES["corpus_prepare_pipeline"](spark, SF01)
    rows = sorted(tuple(r) for r in df.collect())
    sha16 = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    assert (len(rows), sha16) == (EXPECT_ROWS, EXPECT_SHA16)
