"""Golden markdown→Notion-block fixtures (md2notion-parity corpus).

The reference converts each staged .md file with md2notion's
CommonMark-based ``convert()`` and stores one item per block in source
order, dropping pandoc's ``<!-- -->`` list-break comments
(store_notion_blocks.py:115-137).  These fixtures pin the repo's block
parser to that contract over the constructs md2notion actually
distinguishes: headings (3 Notion levels), merged paragraphs, nested
bullet / numbered list items, fenced code (with the "plain text"
language default), quotes, dividers, images, pipe-table rows, and the
list-break drop.

Used twice: ``tests/test_markdown_golden.py`` and the registered
``markdown_blocks_golden`` query whose DuckDB oracle is a VALUES table
of these rows.
"""

from __future__ import annotations

# (case_id, markdown, [(block_index, block_type, title), ...])
GOLDEN_BLOCK_CASES: list[tuple[str, str, list[tuple[int, str, str]]]] = [
    (
        "headings_levels",
        "# Title\n\nIntro line one.\ncontinues here.\n\n## Section\n\n### Sub\n\n#### Deep",
        [
            (0, "header", "Title"),
            (1, "text", "Intro line one. continues here."),
            (2, "sub_header", "Section"),
            (3, "sub_sub_header", "Sub"),
            (4, "sub_sub_header", "Deep"),  # Notion caps at 3 levels
        ],
    ),
    (
        "nested_lists_and_break",
        "- parent\n  - child one\n  - child two\n- second\n\n"
        "1. first\n2. second\n\n<!-- -->\n\n1. restarted",
        [
            (0, "bulleted_list", "parent"),
            (1, "bulleted_list", "child one"),
            (2, "bulleted_list", "child two"),
            (3, "bulleted_list", "second"),
            (4, "numbered_list", "first"),
            (5, "numbered_list", "second"),
            # the <!-- --> list-break comment creates NO block
            (6, "numbered_list", "restarted"),
        ],
    ),
    (
        "fenced_code",
        "```python\ndef f():\n    return 1\n```\n\n```\nplain body\n```",
        [
            (0, "code", "def f():\n    return 1"),
            (1, "code", "plain body"),
        ],
    ),
    (
        "quote_divider_image",
        "> quoted wisdom\n\n---\n\n![diagram](diagram.png)\n\nTrailing text.",
        [
            (0, "quote", "quoted wisdom"),
            (1, "divider", ""),
            (2, "image", "diagram"),
            (3, "text", "Trailing text."),
        ],
    ),
    (
        "pipe_table_rows",
        "| Name  | Size |\n|-------|------|\n| alpha | 10   |\n| beta  | 2    |",
        [
            (0, "table_row", "| Name  | Size |"),
            (1, "table_row", "| alpha | 10   |"),
            (2, "table_row", "| beta  | 2    |"),
        ],
    ),
    (
        "paragraph_merge_boundaries",
        "First para line a.\nline b.\n\nSecond para.\n- bullet stops merge\nThird para.",
        [
            (0, "text", "First para line a. line b."),
            (1, "text", "Second para."),
            (2, "bulleted_list", "bullet stops merge"),
            (3, "text", "Third para."),
        ],
    ),
    (
        # markdown syntax inside a fence is CONTENT, never blocks
        "markdown_inside_fence_is_content",
        "```\n# not a heading\n- not a list\n```",
        [(0, "code", "# not a heading\n- not a list")],
    ),
    (
        # tight constructs: no blank line between heading/list/table/text
        "tight_heading_list",
        "## Tight\n- item one\n- item two",
        [
            (0, "sub_header", "Tight"),
            (1, "bulleted_list", "item one"),
            (2, "bulleted_list", "item two"),
        ],
    ),
    (
        "tight_table_then_text",
        "| A | B |\n|---|---|\n| 1 | 2 |\nTrailing line.",
        [
            (0, "table_row", "| A | B |"),
            (1, "table_row", "| 1 | 2 |"),
            (2, "text", "Trailing line."),
        ],
    ),
    (
        # GFM: a pipe line is a table ONLY when the NEXT line is the
        # alignment-delimiter row; '||' and a delimiter-less pipe row
        # are plain paragraph text (the r3 '||'→table_row divergence)
        "pipe_without_delimiter_is_text",
        "||\n\n| not | a table |\nplain tail.",
        [
            (0, "text", "||"),
            (1, "text", "| not | a table | plain tail."),
        ],
    ),
    (
        # CommonMark: an unterminated fence runs to EOF as code
        "unterminated_fence_runs_to_eof",
        "Intro.\n\n```python\ncode line\n",
        [(0, "text", "Intro."), (1, "code", "code line")],
    ),
    (
        # inline markup stays verbatim in titles (md2notion passes the
        # raw span through; Notion renders it)
        "inline_markup_verbatim",
        "# **Bold** title\n\ntext `code` span.",
        [(0, "header", "**Bold** title"), (1, "text", "text `code` span.")],
    ),
]


def golden_block_values_sql() -> str:
    """Expected block rows as a DuckDB VALUES relation (oracle for
    ``markdown_blocks_golden``)."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n      ".join(
        f"({q(cid)}, {idx}, {q(btype)}, {q(title)})"
        for cid, _, expected in GOLDEN_BLOCK_CASES
        for idx, btype, title in expected
    )
    return (
        "SELECT case_id, block_index, block_type, title FROM (VALUES\n      "
        + rows
        + "\n    ) AS t(case_id, block_index, block_type, title)"
    )
