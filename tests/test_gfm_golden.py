"""Pandoc-parity golden corpus for the wikitext→GFM conversion stage.

Each fixture pins the converter's full output string for one construct
family from the reference's pandoc call site (process-mw-dump.py:276-292).
The same expected strings back the ``gfm_convert_golden`` query's DuckDB
VALUES oracle, so a converter regression fails here AND at the driver's
correctness gate.
"""

from __future__ import annotations

import pytest

from mediawiki_to_notion_spark.functions.gfm_convert import (
    convert_document,
    wikitext_to_gfm,
)
from mediawiki_to_notion_spark.functions.gfm_golden import GOLDEN_CASES


@pytest.mark.parametrize(
    "case_id,src,expected", GOLDEN_CASES, ids=[c[0] for c in GOLDEN_CASES]
)
def test_golden_conversion(case_id, src, expected):
    assert wikitext_to_gfm(src) == expected


@pytest.mark.parametrize(
    "case_id,src,expected", GOLDEN_CASES, ids=[c[0] for c in GOLDEN_CASES]
)
def test_convert_document_matches_golden(case_id, src, expected):
    md, err = convert_document(src)
    assert err is None
    assert md == expected


def test_conversion_idempotent_on_plain_text():
    """Text with no wiki constructs passes through unchanged (modulo
    blank-line normalization) — the common case for cleaned pages."""
    plain = "Just a paragraph.\n\nAnother paragraph."
    assert wikitext_to_gfm(plain) == plain
