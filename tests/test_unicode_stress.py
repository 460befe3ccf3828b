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


def test_all_oracles_match_on_unicode_text(spark, unicode_sf_dir):
    failures = []
    for name in sorted(ORACLES):
        try:
            r = compare(spark, QUERIES[name], ORACLES[name], unicode_sf_dir)
            if not r["match"]:
                failures.append(f"{name}: {r}")
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
