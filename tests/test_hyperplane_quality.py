"""Pins for the SRP hyperplane generator (r7 sf10-soak root-cause fix).

The r1-r6 generator was a Weyl translate — component k of plane j was
(j*dim+k)*c mod 2^31, so plane j+1 = plane j + one shared constant and
successive planes had |cosine| up to 0.82.  Nominal p planes then
carried far fewer effective sign bits: SRP buckets skewed, the hot
bucket grew linearly with the corpus, and candidate pairs
quadratically (measured 144M candidates at sf10 before the fix, 1.47
soak exponent; 0.55 after).  These tests pin (a) the decorrelation
property itself, (b) exact Python/DuckDB agreement of the generator,
so a future "simplification" back to a linear index map fails loudly.
"""

from __future__ import annotations

import numpy as np

C = 2654435761
M = 2147483648
DIM = 64


def _plane(j: int) -> np.ndarray:
    i = np.arange(DIM, dtype=np.int64) + j * DIM + 1
    return ((i * (i + 1)) * C % M) / M - 0.5


def test_planes_decorrelated():
    """Plane correlations among the families actually in use (primary
    adaptive 0..23, multitable base 100..123) look like RANDOM 64-dim
    vectors: typical |cos| ~ 1/sqrt(64) = 0.125, and the max over
    ~1.1k pairs concentrates near 0.125 * sqrt(2 ln pairs) ~ 0.47.
    The linear generator sat at 0.82 with a DENSE band of high
    correlations; we gate both the bulk (p99) and the extreme."""
    planes = [_plane(j) for j in list(range(24)) + list(range(100, 124))]
    H = np.stack(planes)
    Hn = H / np.linalg.norm(H, axis=1, keepdims=True)
    corrm = np.abs(Hn @ Hn.T - np.eye(len(planes)))
    pairs = corrm[np.triu_indices(len(planes), 1)]
    assert np.percentile(pairs, 99) < 0.40, np.percentile(pairs, 99)
    assert pairs.max() < 0.75, pairs.max()


def test_linear_generator_was_correlated():
    """The regression this fix exists for: the old linear index map
    produces near-translate planes (documents WHY the quadratic mix is
    load-bearing — do not 'simplify' it back)."""
    def old_plane(j):
        idx = np.arange(DIM, dtype=np.int64) + j * DIM
        return (idx * C % M) / M - 0.5

    H = np.stack([old_plane(j) for j in range(13)])
    Hn = H / np.linalg.norm(H, axis=1, keepdims=True)
    corr = np.abs(Hn @ Hn.T - np.eye(13)).max()
    assert corr > 0.7  # the measured pathology


def test_generator_matches_duckdb_twin_exactly():
    import duckdb

    from mediawiki_to_notion_spark.functions.vectors import hyperplane_sql

    con = duckdb.connect()
    for j in (0, 3, 23, 100, 123):
        got = np.array(
            con.execute(f"SELECT {hyperplane_sql(j)}").fetchone()[0])
        want = _plane(j)
        assert np.array_equal(got, want), j


def test_bucket_skew_bounded_on_real_embeddings():
    """On the actual sf0.01 embeddings at 13 planes, the hottest bucket
    stays small (the linear generator gave max occupancy ~14x higher
    on the same data shape)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT embedding FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet') "
        "WHERE embedding IS NOT NULL AND len(embedding) = 64"
    ).fetchall()
    E = np.array([r[0] for r in rows], dtype=np.float64)
    H = np.stack([_plane(j) for j in range(13)])
    bits = (E @ H.T) > 0
    bucket = (bits * (1 << np.arange(13, dtype=np.int64))).sum(axis=1)
    _, counts = np.unique(bucket, return_counts=True)
    # n ~ 1000 over 8192 buckets: a healthy generator keeps the hot
    # bucket in single digits
    assert counts.max() <= 8, counts.max()
