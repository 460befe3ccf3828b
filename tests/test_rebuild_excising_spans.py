"""Focused edge cases for the r10 span-merge rebuild
(dedup_ext._rebuild_excising_spans): overlapping / adjacent / nested cut
spans, cuts at the document boundaries, fully-cut documents, documents
with no cuts at all — each checked against the obvious per-row Python
reference (drop every token index covered by any span)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediawiki_to_notion_spark.operators.dedup_ext import (
    _rebuild_excising_spans,
)


def _reference(tokens: list[str], spans: list[tuple[int, int]]):
    cut = {i for s, e in spans for i in range(s, e + 1)}
    kept = [t for i, t in enumerate(tokens) if i not in cut]
    n_cut = sum(1 for i in range(len(tokens)) if i in cut)
    return (
        len(tokens),
        n_cut,
        len(tokens) - n_cut,
        " ".join(kept),
    )


CASES = {
    # doc_id: (tokens, cut spans)
    1: ("a b c d e f g h".split(), [(2, 4)]),            # middle cut
    2: ("a b c d e f g h".split(), [(0, 2)]),            # prefix cut
    3: ("a b c d e f g h".split(), [(5, 7)]),            # suffix cut
    4: ("a b c d e f g h".split(), [(0, 7)]),            # fully cut
    5: ("a b c d e f g h".split(), []),                  # nothing cut
    6: ("a b c d e f g h".split(), [(1, 3), (2, 5)]),    # overlapping
    7: ("a b c d e f g h".split(), [(1, 2), (3, 4)]),    # adjacent
    8: ("a b c d e f g h".split(), [(1, 6), (2, 3)]),    # nested
    9: ("a b c d e f g h".split(), [(0, 1), (3, 3), (6, 7)]),  # islands
}


@pytest.fixture(scope="module")
def frames(spark):
    toks = spark.createDataFrame(
        [(doc, tokens) for doc, (tokens, _) in CASES.items()],
        "doc_id long, t array<string>",
    )
    spans = spark.createDataFrame(
        [(doc, s, e) for doc, (_, sp) in CASES.items() for s, e in sp],
        "doc_id long, s int, e int",
    )
    return toks, spans


def test_rebuild_matches_python_reference(frames):
    toks, spans = frames
    got = {
        r.doc_id: (r.n_tokens, r.n_cut_tokens, r.n_kept_tokens, r.clean_text)
        for r in _rebuild_excising_spans(toks, spans).collect()
    }
    assert set(got) == set(CASES)
    for doc, (tokens, sp) in CASES.items():
        assert got[doc] == _reference(tokens, sp), f"doc {doc}"


def test_rebuild_output_schema(frames):
    toks, spans = frames
    df = _rebuild_excising_spans(toks, spans)
    assert df.columns == [
        "doc_id", "n_tokens", "n_cut_tokens", "n_kept_tokens", "clean_text",
    ]
    dt = dict(df.dtypes)
    assert dt["n_cut_tokens"] == "bigint"
    assert dt["n_kept_tokens"] == "bigint"
    assert dt["clean_text"] == "string"


def test_rebuild_has_no_token_level_shuffle(frames):
    """The point of the rewrite: the only Exchange left is the per-doc
    cut-span aggregate (plus whatever the doc-level join needs) — the
    token stream is never exploded, so no Generate feeds an Exchange."""
    toks, spans = frames
    df = _rebuild_excising_spans(toks, spans)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no posexplode of the token stream
