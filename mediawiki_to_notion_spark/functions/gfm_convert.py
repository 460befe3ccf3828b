"""Wikitext → GitHub-Flavored-Markdown conversion stage.

The reference shells out to pandoc (process-mw-dump.py:276-292:
``pandoc.read(format="mediawiki")`` → ``pandoc.write(format="gfm",
--wrap=none)``).  Pandoc is not installed in this environment, so the
conversion engine is pluggable:

- if a pandoc binding is importable, use it (the real path on a cluster
  image that ships pandoc);
- otherwise fall back to a small deterministic wikitext→GFM converter
  covering the constructs the reference's own cleanup chain leaves
  behind (headings, lists, bold/italic, links, <pre> blocks).

Errors never fail the job: failed documents flow to an error side-output
(the reference logs ERROR and skips, :278-283).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

try:  # pragma: no cover - pandoc not present in this container
    import pandoc as _pandoc
    HAVE_PANDOC = True
except ImportError:
    _pandoc = None
    HAVE_PANDOC = False

_HEADING = re.compile(r"^(={1,6})\s*(.*?)\s*={1,6}\s*$")
_BOLD = re.compile(r"'''(.+?)'''")
_ITALIC = re.compile(r"''(.+?)''")
_LINK_PIPED = re.compile(r"\[\[([^\]|]+)\|([^\]]+)\]\]")
_LINK_BARE = re.compile(r"\[\[([^\]|]+)\]\]")
_EXT_LINK = re.compile(r"\[(\S+)\s+([^\]]+)\]")
_FILE_LINK = re.compile(r"\[\[File:([^\]]+)\]\]")
_BULLET = re.compile(r"^(\*+)\s*(.*)$")
_NUMBERED = re.compile(r"^(#+)\s*(.*)$")


def wikitext_to_gfm(text: str) -> str:
    """Deterministic fallback converter (pandoc-shaped output: one line
    per paragraph, ``---``-free, GFM syntax)."""
    out: list[str] = []
    in_pre = False
    for line in text.splitlines():
        if "<pre>" in line:
            in_pre = True
            out.append(line.replace("<pre>", "```"))
            continue
        if "</pre>" in line:
            in_pre = False
            out.append(line.replace("</pre>", "```"))
            continue
        if in_pre:
            out.append(line)
            continue
        m = _HEADING.match(line)
        if m:
            out.append("#" * len(m.group(1)) + " " + m.group(2))
            continue
        m = _BULLET.match(line)
        if m:
            line = "  " * (len(m.group(1)) - 1) + "- " + m.group(2)
        else:
            m = _NUMBERED.match(line)
            if m:
                line = "  " * (len(m.group(1)) - 1) + "1. " + m.group(2)
        line = _FILE_LINK.sub(lambda g: f"![{g.group(1)}]({g.group(1)})", line)
        line = _LINK_PIPED.sub(lambda g: f"[{g.group(2)}]({g.group(1)})", line)
        line = _LINK_BARE.sub(lambda g: f"[{g.group(1)}]({g.group(1)})", line)
        line = _EXT_LINK.sub(lambda g: f"[{g.group(2)}]({g.group(1)})", line)
        line = _BOLD.sub(r"**\1**", line)
        line = _ITALIC.sub(r"*\1*", line)
        out.append(line)
    return "\n".join(out)


def convert_document(text: str) -> tuple[str | None, str | None]:
    """→ (gfm, error).  Never raises (error side-output discipline)."""
    try:
        if HAVE_PANDOC:  # pragma: no cover
            doc = _pandoc.read(text, format="mediawiki")
            return _pandoc.write(doc, format="gfm", options=["--wrap=none"]), None
        return wikitext_to_gfm(text), None
    except Exception as exc:  # noqa: BLE001 - anything pandoc throws
        return None, f"{type(exc).__name__}: {exc}"


CONVERT_DDL_SUFFIX = "markdown string, convert_error string"


def convert_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: passes through all input columns and appends
    (markdown, convert_error)."""
    for pdf in batches:
        md, err = [], []
        for text in pdf["cleaned"]:
            g, e = convert_document(text) if text is not None else (None, "empty")
            md.append(g)
            err.append(e)
        pdf = pdf.copy()
        pdf["markdown"] = md
        pdf["convert_error"] = err
        yield pdf
