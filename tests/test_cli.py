"""End-to-end CLI parity test: dump → markdown tree → ingest → upload →
status (the full reference workflow, SURVEY §3, in four commands)."""

from __future__ import annotations

import os

from mediawiki_to_notion_spark import cli
from tests.test_xml_pipeline import PNG_BYTES, _dump_xml


def test_cli_full_workflow(spark, tmp_path, capsys):
    dump = tmp_path / "dump.xml"
    dump.write_text(_dump_xml())
    outdir = tmp_path / "out"

    assert cli.main(["process-dump", "-outdir", str(outdir), str(dump)]) == 0
    err = capsys.readouterr().err
    assert "WARNING: ignoring namespace 2" in err
    assert "WARNING: unhandled wiki template: {{Mystery|x}}" in err

    # side-outputs are persisted in full as parquet, stderr is bounded
    # (the reference streams every warning to the driver's stderr)
    warn_dir = outdir / "_warnings"
    skipped = spark.read.parquet(str(warn_dir / "skipped_pages"))
    assert skipped.filter("message like 'ignoring namespace%'").count() >= 1
    unhandled = spark.read.parquet(str(warn_dir / "unhandled_templates"))
    assert unhandled.filter("unhandled_template = '{{Mystery|x}}'").count() == 1

    md = outdir / "Main" / "Router Notes.md"
    assert md.exists()
    assert "RFC 2328" in md.read_text()
    assert (outdir / "Category" / "Net.md").exists()
    assert (outdir / "File" / "diagram one.png").read_bytes() == PNG_BYTES
    # redirect/empty/user pages produce no files
    assert not (outdir / "Main" / "Old Page.md").exists()
    assert not (outdir / "Main" / "Empty Page.md").exists()

    tables = str(tmp_path / "tables")
    assert cli.main(["ingest", "--input", str(outdir / "Main"), "--tables", tables]) == 0
    out = capsys.readouterr().out
    assert "pages table now has 1 rows" in out

    assert cli.main(["upload", "--tables", tables]) == 0
    out = capsys.readouterr().out
    assert "SUCCESS    1" in out

    # widget-parity dashboard: markdown table, newest first, widget fmt
    assert cli.main(["dashboard", "--tables", tables]) == 0
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[0] == "| Time | Page | Status"
    # keys are stored URI-encoded (file-source paths), like S3 event keys
    assert any("SUCCESS" in ln and "Notes.md" in ln for ln in lines[2:])
