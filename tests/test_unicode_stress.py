"""Oracle parity under unicode-rich text.

A real corpus is not ASCII; JVM and DuckDB string semantics can diverge
on exactly the operations this engine leans on — code-point vs byte
lengths, regex classes over non-Latin scripts, md5 of multi-byte
encodings.  This sweep re-verifies every oracled query on documents
whose text carries CJK, emoji (outside the BMP), combining accents, and
RTL Arabic appended to the original content.

First run caught multimodal_audio_energy's oracle reading CODE POINTS
(`ord(substr(text, ...))`) where the Arrow kernel reads UTF-8 BYTES —
now byte-true via hex pairs.
"""

from __future__ import annotations

import shutil

import pytest

from mediawiki_to_notion_spark.operators import ORACLES, QUERIES, load_all
from mediawiki_to_notion_spark.oracle import compare

load_all()
SRC = "/root/testdata/sf0.001"

_SUFFIX = """
             CASE CAST(doc_id % 5 AS INTEGER)
               WHEN 0 THEN text || ' 这是中文测试 文本 分析'
               WHEN 1 THEN text || ' emoji 🚀🔥 mixed ✨ text'
               WHEN 2 THEN text || ' café naïve résumé'
               WHEN 3 THEN text || ' مرحبا بالعالم'
               ELSE text END
"""


@pytest.fixture(scope="session")
def unicode_sf_dir(tmp_path_factory):
    import duckdb

    d = str(tmp_path_factory.mktemp("uni_sf"))
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT doc_id, {_SUFFIX} AS text, lang, source,
                 CAST(length({_SUFFIX}) AS BIGINT) AS n_chars
          FROM '{SRC}/documents.parquet' ORDER BY doc_id)
    TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    con.close()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{d}/{name}.parquet")
    return d


def _oracle_for(name: str, sf_dir: str) -> str:
    """Input-pinned sequential-reference oracles are rebuilt for the
    swept dir (the test_adversarial_distribution discipline): the
    sequential Python twin runs on the unicode-mutated inputs too."""
    if name == "pipeline_prepare_convert":
        from mediawiki_to_notion_spark.operators.pipeline_queries import (
            _prepare_convert_oracle,
        )

        return _prepare_convert_oracle(sf_dirs=(sf_dir,))
    return ORACLES[name]


@pytest.mark.slow  # r11 tier: registry-wide sweep, opt-in (VERDICT r10 #1)
def test_all_oracles_match_on_unicode_text(spark, unicode_sf_dir):
    failures = []
    for name in sorted(ORACLES):
        try:
            r = compare(spark, QUERIES[name], _oracle_for(name, unicode_sf_dir),
                        unicode_sf_dir)
            if not r["match"]:
                failures.append(f"{name}: {r}")
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_nfc_kernel_matches_duckdb_ucd_on_arbitrary_codepoints():
    """Pin Python's unicodedata NFC against DuckDB's independent
    nfc_normalize (utf8proc UCD tables) on randomized strings over the
    full non-surrogate codepoint space — including combining-mark
    pileups that force canonical reordering.  The two implementations
    share no code, so agreement here certifies the normalization the
    text_unicode_nfc_normalize kernel ships."""
    import random
    import unicodedata

    import duckdb

    rng = random.Random(0)
    combining = [0x0301, 0x0300, 0x0308, 0x030A, 0x0323, 0x0327, 0x0307]
    base_ranges = [(0x20, 0x7E), (0xA0, 0x2FF), (0x370, 0x3FF),
                   (0x400, 0x4FF), (0x1E00, 0x1EFF), (0x3040, 0x30FF),
                   (0xAC00, 0xD7A3), (0x1F300, 0x1F5FF)]

    def rand_char() -> str:
        if rng.random() < 0.35:
            return chr(rng.choice(combining))
        lo, hi = rng.choice(base_ranges)
        return chr(rng.randint(lo, hi))

    con = duckdb.connect()
    mismatches = []
    for _ in range(300):
        s = "".join(rand_char() for _ in range(rng.randint(0, 24)))
        want = unicodedata.normalize("NFC", s)
        got = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        if got != want:
            mismatches.append((s, want, got))
    assert not mismatches, mismatches[:3]
