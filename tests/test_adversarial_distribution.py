"""Oracle parity under adversarial data distributions.

The normal testdata is well-behaved; this sweep re-verifies every
oracled query on a worst-case distribution the driver never generates:

- documents: every row IDENTICAL text/lang/source — maximal duplicate
  density (the LSH candidate set becomes a clique, connected components
  collapse to one giant component, every similarity score ties);
- events: a single hot user_id — every per-user window/aggregate lands
  in ONE group (the skew pathology of reference FAQ.md:68);
- embeddings: every vector identical — all cosine similarities tie at
  1.0 and all centroid distances at 0, so any rank/top-k whose ordering
  is not fully tie-broken diverges between engines.

A query that hash-matches here cannot hide an under-specified ORDER BY,
a divide-by-zero on degenerate groups, or an engine-divergent tie.
"""

from __future__ import annotations

import os
import shutil

import pytest

from mediawiki_to_notion_spark.operators import ORACLES, QUERIES, load_all
from mediawiki_to_notion_spark.oracle import compare

load_all()
SRC = "/root/testdata/sf0.001"

ADV_TEXT = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark woods tonight again"
)


@pytest.fixture(scope="session")
def adversarial_sf_dir(tmp_path_factory):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    adv = str(tmp_path_factory.mktemp("adv_sf"))
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT doc_id, '{ADV_TEXT}' AS text, 'en' AS lang,
                 'src0' AS source, CAST({len(ADV_TEXT)} AS BIGINT) AS n_chars
          FROM '{SRC}/documents.parquet' ORDER BY doc_id)
    TO '{adv}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (SELECT vec_id,
                 (SELECT embedding FROM '{SRC}/embeddings.parquet'
                  ORDER BY vec_id LIMIT 1) AS embedding,
                 label
          FROM '{SRC}/embeddings.parquet' ORDER BY vec_id)
    TO '{adv}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.close()
    # events via pyarrow so the ts column keeps its physical parquet
    # type exactly (tables.load_table branches on it); only user_id
    # becomes the single hot key
    t = pq.read_table(f"{SRC}/events.parquet")
    idx = t.schema.get_field_index("user_id")
    hot = pa.array([1] * len(t), type=t.schema.field("user_id").type)
    t = t.set_column(idx, "user_id", hot)
    pq.write_table(t, f"{adv}/events.parquet", version="2.6")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{adv}/{name}.parquet")
    return adv


def _oracle_for(name: str, sf_dir: str) -> str:
    """Registered oracle, except input-pinned sequential-reference
    oracles (whose VALUES tables are computed from specific SF dirs)
    are REBUILT for the swept dir — a stronger check than exempting
    them: the sequential Python reference runs on the adversarial
    inputs too."""
    if name == "pipeline_prepare_convert":
        from mediawiki_to_notion_spark.operators.pipeline_queries import (
            _prepare_convert_oracle,
        )

        return _prepare_convert_oracle(sf_dirs=(sf_dir,))
    return ORACLES[name]


@pytest.mark.slow  # r11 tier: registry-wide sweep, opt-in (VERDICT r10 #1)
def test_all_oracles_match_on_adversarial_distribution(spark,
                                                       adversarial_sf_dir):
    failures = []
    for name in sorted(ORACLES):
        try:
            r = compare(spark, QUERIES[name], _oracle_for(name, adversarial_sf_dir),
                        adversarial_sf_dir)
            if not r["match"]:
                failures.append(f"{name}: {r}")
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="session")
def skewed_sf_dir(tmp_path_factory):
    """Relational-side skew: every order belongs to ONE customer and a
    single part carries most lineitem rows — the hot-key pathology
    (reference FAQ.md:68) hitting joins, RFM, retention, and the
    market-basket pair fan-out."""
    import duckdb

    d = str(tmp_path_factory.mktemp("skew_sf"))
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT * REPLACE (CAST(1 AS BIGINT) AS o_custkey)
          FROM '{SRC}/orders.parquet' ORDER BY o_orderkey)
    TO '{d}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (SELECT * REPLACE (
            CASE WHEN l_linenumber <= 4
                 THEN (SELECT min(p_partkey) FROM '{SRC}/part.parquet')
                 ELSE l_partkey END AS l_partkey)
          FROM '{SRC}/lineitem.parquet' ORDER BY l_orderkey, l_linenumber)
    TO '{d}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.close()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "events", "documents", "embeddings"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{d}/{name}.parquet")
    return d


@pytest.mark.slow  # r11 tier: registry-wide sweep, opt-in (VERDICT r10 #1)
def test_all_oracles_match_on_hot_key_skew(spark, skewed_sf_dir):
    failures = []
    for name in sorted(ORACLES):
        try:
            r = compare(spark, QUERIES[name], ORACLES[name], skewed_sf_dir)
            if not r["match"]:
                failures.append(f"{name}: {r}")
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_percentile_band_on_fully_tied_values(spark, tmp_path):
    """A constant value column is the worst case for the GK rank-band
    certificate: every value shares the rank interval [1, n], so a
    max-rank-only probe reports out-of-band for every q (the r5 review
    catch).  The interval-overlap probe must certify TRUE — matching
    the oracle's hard-coded guarantee — on ties too."""
    import duckdb

    d = str(tmp_path / "tied_sf")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT user_id, ts, event_type, CAST(1.0 AS DOUBLE) AS value
          FROM '{SRC}/events.parquet' ORDER BY ts)
    TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    con.close()
    import shutil as _sh

    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"):
        _sh.copy(f"{SRC}/{name}.parquet", f"{d}/{name}.parquet")
    r = compare(spark, QUERIES["approx_percentile_within_band"],
                ORACLES["approx_percentile_within_band"], d)
    assert r["match"], r
