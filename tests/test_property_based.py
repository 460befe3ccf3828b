"""Property-based tests (hypothesis) for the pure-Python document
transforms — the pieces where hand-picked fixtures miss edge cases.

These run without a SparkSession (the Spark↔Python parity is pinned
separately in test_wikitext.py); here we fuzz the Python twins'
invariants.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from mediawiki_to_notion_spark.functions.gfm_convert import convert_document
from mediawiki_to_notion_spark.functions.markdown_blocks import parse_markdown_blocks
from mediawiki_to_notion_spark.functions.wikitext import (
    fence_code_blocks,
    prepare_wikitext_py,
    safe_filename_py,
)

text_lines = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\r"),
    max_size=120,
)
documents = st.lists(text_lines, max_size=12).map("\n".join)


@settings(max_examples=200, deadline=None)
@given(documents)
def test_fencer_never_crashes_and_balances_pre_tags(doc):
    out = fence_code_blocks(doc)
    opens = out.count("<pre>") - doc.count("<pre>")
    closes = out.count("</pre>") - doc.count("</pre>")
    assert opens == closes
    # fencing only inserts tags / rewrites in-code markup: with markup
    # absent, stripping the inserted tags recovers the original document
    # up to the close-rstrip of line-trailing whitespace
    if "'''" not in doc and "''" not in doc and "<pre>" not in doc and "</pre>" not in doc:
        recovered = (
            out.replace("<pre>\n", "").replace("</pre>\n\n", "\n").replace("</pre>", "")
        )
        norm = lambda s: [ln.rstrip() for ln in s.splitlines()]  # noqa: E731
        assert norm(recovered) == norm(doc)


@settings(max_examples=200, deadline=None)
@given(documents)
def test_prepare_chain_removes_all_handled_constructs(doc):
    cleaned = prepare_wikitext_py("[[Category:x]]\n" + doc + "\n__TOC__", "Main")
    assert "[[Category:x]]" not in cleaned
    assert "__TOC__" not in cleaned
    assert "<nowiki>" not in (cleaned or "")


@settings(max_examples=200, deadline=None)
@given(documents)
def test_markdown_parser_invariants(doc):
    blocks = parse_markdown_blocks(doc)
    # no empty paragraph blocks, known types only, fences always closed
    types = {
        "header", "sub_header", "sub_sub_header", "text", "bulleted_list",
        "numbered_list", "quote", "code", "divider", "image", "table_row",
    }
    for b in blocks:
        assert b["type"] in types
        if b["type"] == "text":
            assert b["title"].strip() != ""
        if b["type"] == "table_row":
            # GFM: row blocks only come from real tables (header +
            # delimiter row) — the r3 '||' divergence regression guard
            t = b["title"]
            assert t.startswith("|") and t.endswith("|")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_safe_filename_is_fs_safe(title):
    fn = safe_filename_py(title)
    assert "/" not in fn
    assert re.fullmatch(r"[\w .\-]*", fn, flags=re.UNICODE) or all(
        c.isalnum() or c in " ._-" for c in fn
    )
    assert not fn.endswith(" ")


@settings(max_examples=100, deadline=None)
@given(documents)
def test_convert_document_never_raises(doc):
    md, err = convert_document(doc)
    assert (md is None) == (err is not None)


# --- XML split scanner: range-union completeness -----------------------------

_xml_text = st.text(
    alphabet=st.characters(blacklist_characters="<>&", max_codepoint=0x2FF),
    max_size=40,
)


@settings(max_examples=50, deadline=None)
@given(
    texts=st.lists(_xml_text, min_size=1, max_size=8),
    cut_seed=st.integers(min_value=1, max_value=10_000),
    n_ranges=st.integers(min_value=1, max_value=6),
)
def test_page_fragment_ranges_partition_exactly(texts, cut_seed, n_ranges):
    """For ANY dump and ANY consecutive byte-range partitioning, each
    page is owned by exactly one range (the one containing its <page>
    start): the union over ranges equals the whole-file scan, with no
    duplicates — the invariant that makes split size a pure tuning knob."""
    import io

    from mediawiki_to_notion_spark.sources.xml_dump import iter_page_fragments

    body = "".join(
        f"<page><title>t{i}</title><revision><text>{t}</text></revision></page>\n"
        for i, t in enumerate(texts)
    )
    data = f'<mediawiki><siteinfo></siteinfo>\n{body}</mediawiki>'.encode()
    whole = list(iter_page_fragments(io.BytesIO(data), 0, len(data)))
    assert len(whole) == len(texts)

    # deterministic pseudo-random consecutive cut points from the seed
    cuts = sorted({(cut_seed * (i + 1) * 7919) % len(data) for i in range(n_ranges - 1)})
    bounds = [0, *cuts, len(data)]
    pieces = []
    for lo, hi in zip(bounds, bounds[1:]):
        pieces.extend(iter_page_fragments(io.BytesIO(data), lo, hi))
    assert sorted(pieces) == sorted(whole)


# ---------------------------------------------------------------------------
# Gopher repetition kernel: the row-local Arrow kernel's per-doc integer
# numerators, pinned against a naive from-the-definition reference
# (Rae et al. 2021 table A1 semantics) on adversarial token streams.

rep_tokens = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               blacklist_characters=" \r"),
        min_size=1, max_size=4,
    ),
    max_size=30,
)


def _naive_rep_features(text):
    """O(m^2) direct reading of the definitions: for each n, the top
    n-gram is the max-count gram (ties -> lexicographically greatest
    joined string) and contributes count * its-char-length; duplicated
    coverage sums the lengths of every token position inside ANY gram
    occurring >= 2 times."""
    toks = [w for w in text.split(" ") if w]
    m = len(toks)
    feats = {"nonspace": len(text.replace(" ", ""))}
    for n in (2, 3, 4):
        if m < n:
            feats[f"topc{n}"] = None
            continue
        grams = [" ".join(toks[i:i + n]) for i in range(m - n + 1)]
        counted = [(grams.count(g), g) for g in grams]
        cmax = max(c for c, _ in counted)
        best = max(g for c, g in counted if c == cmax)
        feats[f"topc{n}"] = cmax * (len(best) - (n - 1))
    for n in (5, 8, 10):
        if m < n:
            feats[f"covc{n}"] = None
            continue
        grams = [" ".join(toks[i:i + n]) for i in range(m - n + 1)]
        covered = set()
        for i, g in enumerate(grams):
            if grams.count(g) >= 2:
                covered.update(range(i, i + n))
        feats[f"covc{n}"] = sum(len(toks[i]) for i in covered)
    return feats


@settings(max_examples=300, deadline=None)
@given(rep_tokens, st.booleans())
def test_repetition_kernel_matches_naive_reference(tokens, double):
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        _REP_OUT_COLS,
        _rep_features_row,
    )

    # doubling the stream manufactures guaranteed duplicated n-grams
    text = " ".join(tokens + tokens if double else tokens)
    row = dict(zip(_REP_OUT_COLS, _rep_features_row(7, text)))
    naive = _naive_rep_features(text)
    assert row["doc_id"] == 7
    for k, v in naive.items():
        assert row[k] == v, (k, v, row[k], text)


def test_repetition_kernel_null_and_empty_text():
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        _REP_OUT_COLS,
        _rep_features_row,
    )

    assert _rep_features_row(1, None) == (1,) + (None,) * (len(_REP_OUT_COLS) - 1)
    empty = dict(zip(_REP_OUT_COLS, _rep_features_row(2, "   ")))
    assert empty["nonspace"] == 0
    assert all(empty[c] is None for c in _REP_OUT_COLS[2:])


def test_chunk_overlap_covers_every_token_exactly(spark, tmp_path):
    """Chunking invariants on crafted lengths around the window/stride
    boundary (W=64, S=48): chunk count = max(1, ceil((n-W)/S)+1), spans
    cover [0, n-1] with no gaps, overlaps are exactly W-S except at the
    tail, and a sub-window doc is one whole chunk."""
    import os

    from pyspark.sql import functions as F

    from mediawiki_to_notion_spark.operators import QUERIES
    from mediawiki_to_notion_spark.operators.training_data import (
        CHUNK_STRIDE,
        CHUNK_W,
    )

    lengths = [1, CHUNK_W - 1, CHUNK_W, CHUNK_W + 1,
               CHUNK_W + CHUNK_STRIDE, 3 * CHUNK_W + 7]
    rows = [(i, " ".join(f"t{k}" for k in range(n)))
            for i, n in enumerate(lengths)]
    root = tmp_path / "chunk_docs"
    spark.createDataFrame(rows, "doc_id int, text string").coalesce(1) \
        .write.parquet(os.path.join(str(root), "documents.parquet"))
    out = QUERIES["chunk_documents_overlap"](spark, str(root)) \
        .orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(lengths):
        chunks = by_doc[i]
        expect = max(1, -(-(n - CHUNK_W) // CHUNK_STRIDE) + 1) if n > CHUNK_W \
            else 1
        assert len(chunks) == expect, (n, len(chunks), expect)
        assert chunks[0].start_tok == 0
        assert chunks[-1].end_tok == n - 1
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok == a.start_tok + CHUNK_STRIDE
            assert b.start_tok <= a.end_tok + 1  # no gap
        for c in chunks:
            assert c.n_tokens == c.end_tok - c.start_tok + 1
            assert len(c.chunk_text.split(" ")) == c.n_tokens
