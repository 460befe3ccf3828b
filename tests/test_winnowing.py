"""Winnowing (MOSS) fingerprint property pins.

The operator's value is the THEOREM (Schleimer/Wilkerson/Aiken, SIGMOD
2003 §4): any verbatim token run of >= K + W - 1 tokens shared by two
documents is guaranteed to share at least one selected fingerprint.
The DuckDB oracle can only confirm the two engines agree — this fixture
pins that what they agree ON actually has the guarantee, on adversarial
inputs where the shared run is exactly at the threshold.
"""

from __future__ import annotations

import os

import pytest

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.operators.dedup_ext import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)

load_all()

GUARANTEE_T = WINNOW_K + WINNOW_W - 1  # minimal guaranteed match length


def _fp_sets(spark, docs):
    d = spark.createDataFrame(docs, "doc_id int, text string")
    rows = winnow_fingerprints(d).collect()
    out: dict[int, set[int]] = {doc_id: set() for doc_id, _ in docs}
    for r in rows:
        out[r["doc_id"]].add(r["h"])
    return out


@pytest.mark.parametrize("offset_a,offset_b", [(0, 0), (0, 5), (9, 2)])
def test_threshold_run_guarantees_shared_fingerprint(spark, offset_a, offset_b):
    """Two docs sharing EXACTLY a K+W-1-token run (all other tokens from
    disjoint vocabularies) must share >= 1 fingerprint, wherever the run
    sits in either document."""
    run = [f"shared{i}" for i in range(GUARANTEE_T)]
    doc_a = [f"a{i}" for i in range(offset_a)] + run + [
        f"a{i}" for i in range(offset_a, offset_a + 6)
    ]
    doc_b = [f"b{i}" for i in range(offset_b)] + run + [
        f"b{i}" for i in range(offset_b, offset_b + 6)
    ]
    fps = _fp_sets(spark, [(1, " ".join(doc_a)), (2, " ".join(doc_b))])
    assert fps[1] & fps[2], (
        f"guarantee violated: {GUARANTEE_T}-token shared run selected no "
        f"common fingerprint (offsets {offset_a},{offset_b})"
    )


def test_disjoint_vocabulary_shares_nothing(spark):
    doc_a = " ".join(f"a{i}" for i in range(40))
    doc_b = " ".join(f"b{i}" for i in range(40))
    fps = _fp_sets(spark, [(1, doc_a), (2, doc_b)])
    assert not (fps[1] & fps[2])


def test_short_document_still_fingerprinted(spark):
    """A doc with fewer than W grams keeps its global-min gram (the
    truncated-frame rule), so every doc >= K tokens has >= 1
    fingerprint."""
    short = " ".join(f"s{i}" for i in range(WINNOW_K))  # exactly 1 gram
    fps = _fp_sets(spark, [(1, short)])
    assert len(fps[1]) == 1


def test_density_bounded_by_windows(spark):
    """Selected fingerprints are a strict winnow: per doc, at most one
    new selection per window position, and far fewer than gram count on
    random-ish text."""
    doc = " ".join(f"t{i * 7 % 53}" for i in range(120))
    fps = _fp_sets(spark, [(1, doc)])
    n_grams = 120 - WINNOW_K + 1
    assert 1 <= len(fps[1]) <= n_grams - WINNOW_W + 1
    assert len(fps[1]) < n_grams / 2  # expected density ~ 2/(W+1)


def test_registered_query_end_to_end(spark, tmp_path):
    """Near-identical docs pair with high fingerprint-Jaccard; the
    unrelated doc appears in no pair."""
    base = [f"w{i}" for i in range(30)]
    edited = list(base)
    edited[15] = "EDIT"
    docs = [
        (1, " ".join(base)),
        (2, " ".join(edited)),
        (3, " ".join(f"z{i}" for i in range(30))),
    ]
    d = spark.createDataFrame(docs, "doc_id int, text string")
    d.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    rows = QUERIES["dedup_winnowing_fingerprint"](spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["jaccard_fp"] > 0.5
