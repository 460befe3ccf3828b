"""md2notion-parity golden corpus for the markdown block parser.

Pins ``parse_markdown_blocks`` to the reference's md2notion ``convert()``
contract (store_notion_blocks.py:115-137): flat source-order block
enumeration, three Notion heading levels, "plain text" code-language
default, list-break comments dropped.
"""

from __future__ import annotations

import pytest

from mediawiki_to_notion_spark.functions.markdown_blocks import parse_markdown_blocks
from mediawiki_to_notion_spark.functions.markdown_golden import GOLDEN_BLOCK_CASES


@pytest.mark.parametrize(
    "case_id,md,expected", GOLDEN_BLOCK_CASES, ids=[c[0] for c in GOLDEN_BLOCK_CASES]
)
def test_golden_blocks(case_id, md, expected):
    got = [
        (i, b["type"], b["title"])
        for i, b in enumerate(parse_markdown_blocks(md))
    ]
    assert got == expected


def test_code_language_default():
    blocks = parse_markdown_blocks("```\nx\n```")
    assert blocks[0]["language"] == "plain text"


def test_code_language_preserved():
    blocks = parse_markdown_blocks("```python\nx\n```")
    assert blocks[0]["language"] == "python"
