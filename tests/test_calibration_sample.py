"""_calibration_sample pins: exact power-of-two modulus, ~2^11-doc
target at any scale, and the whole-corpus identity below the target."""

from __future__ import annotations

from mediawiki_to_notion_spark.operators.dedup import (
    CALIB_TARGET_BITS,
    _calibration_sample,
)


def _sample_size(spark, n):
    d = spark.range(n).withColumnRenamed("id", "doc_id")
    return _calibration_sample(d).count()


def test_small_corpus_is_untouched(spark):
    # below 2^CALIB_TARGET_BITS the modulus is 1: the gate SFs see the
    # unsampled op (driver rows bit-identical to the pre-sampling op)
    for n in (1, 500, 2048):
        assert _sample_size(spark, n) == n


def test_large_corpus_clamps_near_target(spark):
    target = 1 << CALIB_TARGET_BITS
    for n in (5_000, 50_000, 500_000):
        size = _sample_size(spark, n)
        assert target // 2 < size <= 2 * target, (n, size)


def test_sample_is_deterministic_and_prefix_closed(spark):
    d = spark.range(10_000).withColumnRenamed("id", "doc_id")
    ids1 = sorted(r["doc_id"] for r in _calibration_sample(d).collect())
    ids2 = sorted(r["doc_id"] for r in _calibration_sample(d).collect())
    assert ids1 == ids2
    # modulus membership: every kept id divisible by the same power of 2
    m = ids1[1] - ids1[0]
    assert m & (m - 1) == 0  # power of two
    assert all(i % m == 0 for i in ids1)
