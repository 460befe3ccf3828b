"""End-to-end CLI parity test: dump → markdown tree → ingest → upload →
status (the full reference workflow, SURVEY §3, in four commands)."""

from __future__ import annotations

import os

import pytest

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


def test_cli_crawl_to_shards(spark, tmp_path, capsys):
    """The `crawl` command: WARC in, funnel report + shard manifest out,
    shard-partitioned parquet + drop side-output on disk."""
    from mediawiki_to_notion_spark.sources.warc import encode_warc_record_gz

    # kept pages must now clear the Gopher battery too: >= 50 words,
    # mean word length 3-10, >= 2 distinct stop words, >= 80% alphabetic
    # words, low symbol ratio — while staying under the C4 500-char cap
    prose = ("the quick river is of a bright valley and "
             + " ".join(f"wrd{i % 9}x{i}" for i in range(48)))
    bodies = {k: f"{prose} page{k}" for k in range(5)}
    bodies[5] = "the the the " * 20            # C4 low_diversity
    # one page per Gopher rule (each passes every C4 gate first):
    stop = "the be to of and that have with a"
    bodies[6] = f"{stop} " + " ".join(           # < 50 words
        f"alpha{i} beta{i}" for i in range(8))
    import itertools as _it
    two = [a + b for a, b in _it.product("abcdefgh", repeat=2)][:60]
    bodies[7] = f"{stop} " + " ".join(two)          # mean word len < 3
    bodies[8] = (f"{stop} " + " ".join(             # '#' symbol ratio
        f"tok{i}##" for i in range(20)) + " "
        + " ".join(f"plain{i}" for i in range(28)))
    bodies[9] = (f"{stop} " + " ".join(             # numeric words
        "12345" for _ in range(20)) + " "
        + " ".join(f"word{i}" for i in range(28)))
    # ONE distinct stop word ("the", repeated for lang-ID anchoring) —
    # below the 2-distinct Gopher minimum but still detectably English
    bodies[10] = "the " * 5 + " ".join(f"token{i}" for i in range(50))
    raw = b""
    for k, body in sorted(bodies.items()):
        raw += encode_warc_record_gz(
            {"WARC-Type": "response", "WARC-Record-ID": f"<urn:cli:{k}>",
             "WARC-Target-URI": f"https://example.org/p/{k}",
             "Content-Type": "application/http; msgtype=response"},
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + body.encode(),
        )
    warc = tmp_path / "crawl.warc.gz"
    warc.write_bytes(raw)
    outdir = tmp_path / "corpus"

    assert cli.main(["crawl", "--warc", str(warc),
                     "--outdir", str(outdir)]) == 0
    out = capsys.readouterr().out
    assert "kept" in out and "wrote 5 documents" in out
    # the boilerplate page is attributed to its failing gate
    assert "low_diversity" in out or "too_long" in out
    # each Gopher rule attributes its own page in the funnel report
    for gate in ("gopher_word_count", "gopher_mean_word_len",
                 "gopher_symbol_ratio", "gopher_alpha_ratio",
                 "gopher_stopwords"):
        assert f"{gate:18s} 1" in out, (gate, out)
    # shard layout on disk, readable with pruning
    import glob as _glob

    assert _glob.glob(os.path.join(str(outdir), "shards", "shard_id=*"))
    back = spark.read.parquet(os.path.join(str(outdir), "shards"))
    assert back.count() == 5
    # full drop detail persisted
    dropped = spark.read.parquet(
        os.path.join(str(outdir), "_warnings", "crawl_dropped")
    )
    assert dropped.count() == 6


def test_cli_crawl_min_quality_score(spark, tmp_path, capsys):
    """The optional --min-quality-score stage: funnel survivors are
    scored by the hashed-bigram classifier and sub-threshold docs drop,
    reported as their own gate + side output."""
    from mediawiki_to_notion_spark.operators.corpus_quality import (
        apply_quality_classifier,
    )
    from mediawiki_to_notion_spark.sources.warc import (
        encode_warc_record_gz,
        read_warc,
        warc_to_documents,
    )

    prose = ("the quick river is of a bright valley and "
             + " ".join(f"wrd{i % 9}x{i}" for i in range(48)))
    raw = b""
    for k in range(5):
        raw += encode_warc_record_gz(
            {"WARC-Type": "response", "WARC-Record-ID": f"<urn:qs:{k}>",
             "WARC-Target-URI": f"https://example.org/q/{k}",
             "Content-Type": "application/http; msgtype=response"},
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + f"{prose} page{k}".encode(),
        )
    warc = tmp_path / "qs.warc.gz"
    warc.write_bytes(raw)
    outdir = tmp_path / "corpus_qs"

    # every page passes the hard funnel; choose the 3rd-highest score
    # as the cut so exactly the docs strictly below it drop
    docs = warc_to_documents(read_warc(spark, str(warc)))
    scores = sorted(
        r.score for r in apply_quality_classifier(spark, docs).collect()
    )
    assert len(scores) == 5 and len(set(scores)) == 5  # distinct
    thr = scores[2]
    n_drop = sum(1 for v in scores if v < thr)
    assert n_drop == 2

    assert cli.main(["crawl", "--warc", str(warc),
                     "--outdir", str(outdir),
                     "--min-quality-score", str(thr)]) == 0
    out = capsys.readouterr().out
    assert f"classifier_below   {n_drop}" in out
    assert "wrote 3 documents" in out
    dropped = spark.read.parquet(
        os.path.join(str(outdir), "_warnings", "crawl_classifier_dropped")
    )
    assert dropped.count() == n_drop


@pytest.mark.parametrize("family", ["bpe", "unigram", "wordpiece"])
def test_cli_tokenizer_train(spark, tmp_path, capsys, family):
    import json

    from mediawiki_to_notion_spark import cli

    out = tmp_path / f"{family}.json"
    assert cli.main([
        "tokenizer-train", "--family", family,
        "--data", "/root/testdata/sf0.001", "--out", str(out),
    ]) == 0
    text = capsys.readouterr().out
    assert "corpus fertility:" in text
    artifact = json.loads(out.read_text())
    assert artifact["family"] == family
    assert artifact["fertility"] > 1.0   # subwords per word
    if family == "unigram":
        assert len(artifact["pieces"]) > 10
    else:
        assert len(artifact["merges"]) == 8
