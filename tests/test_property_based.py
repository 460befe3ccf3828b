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
