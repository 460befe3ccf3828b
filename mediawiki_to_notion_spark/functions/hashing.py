"""Engine-portable hashing primitives for dedup / LSH.

Everything here must produce *bit-identical* values in Spark (Java) and
DuckDB (the oracle), so the base token hash is md5 — available in both —
mapped to a 60-bit integer, and all derived hashes are plain integer
arithmetic on top.

MinHash background: Broder, "On the resemblance and containment of
documents" (1997); LSH banding: Leskovec/Rajaraman/Ullman, Mining of
Massive Datasets ch.3.  SimHash: Charikar (2002).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Fixed (a, b) parameter pairs for the 16 minhash permutations
# h_i(x) = (a_i * x + b_i) mod P.  Arbitrary odd constants, hardcoded so
# Spark and the SQL oracle share them verbatim.
MINHASH_PARAMS: list[tuple[int, int]] = [
    (48271, 11), (16807, 23), (69621, 37), (40692, 41),
    (10007, 53), (28657, 67), (75571, 71), (32749, 83),
    (51349, 97), (12345, 101), (65497, 113), (22651, 127),
    (91019, 131), (30269, 139), (45989, 149), (18257, 151),
]

N_MINHASH = len(MINHASH_PARAMS)
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS

SIMHASH_BITS = 16


def token_hash60(col: Column) -> Column:
    """String → 60-bit non-negative integer via md5 (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`token_hash60`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_agg_columns(hash_col: Column) -> list[Column]:
    """The 16 ``min((a_i*h + b_i) mod P)`` aggregate expressions over a
    grouped, exploded token-hash column (reduced mod P first so the
    product stays < 2^47, well inside int64)."""
    h = hash_col % MERSENNE_P
    return [
        F.min((h * a + b) % MERSENNE_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]


def minhash_agg_sql(hash_expr: str) -> list[str]:
    h = f"(({hash_expr}) % {MERSENNE_P})"
    return [
        f"min(({h} * {a} + {b}) % {MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]


def band_signature(band: int) -> Column:
    """Concatenated signature of one LSH band over the mh* columns."""
    cols = [F.col(f"mh{band * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
    return F.concat_ws("_", *[c.cast("string") for c in cols])


def band_signature_sql(band: int) -> str:
    cols = [f"mh{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
    return " || '_' || ".join(cols)


def simhash_band_bounds(max_hamming: int = 2,
                        n_bits: int = SIMHASH_BITS) -> list[tuple[int, int]]:
    """(bit_offset, width) per pigeonhole band: ``max_hamming + 1``
    near-equal slices of the ``n_bits``-wide hash.  Any pair within
    ``max_hamming`` differs in at most ``max_hamming`` bands, so at
    least one band matches exactly — band equi-join is lossless."""
    n_bands = max_hamming + 1
    base, extra = divmod(n_bits, n_bands)
    bounds: list[tuple[int, int]] = []
    off = 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        bounds.append((off, width))
        off += width
    return bounds


def simhash_bit_aggs(hash_col: Column,
                     n_bits: int = SIMHASH_BITS) -> list[Column]:
    """Per-bit ±1 weight sums over grouped token hashes (SimHash)."""
    return [
        F.sum(
            F.when(F.shiftright(hash_col, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"w{j}")
        for j in range(n_bits)
    ]


def simhash_from_weights(n_bits: int = SIMHASH_BITS) -> Column:
    out = F.lit(0).cast("long")
    for j in range(n_bits):
        out = out + F.when(F.col(f"w{j}") > 0, F.lit(1 << j)).otherwise(0)
    return out


def simhash_sql(hash_expr: str,
                n_bits: int = SIMHASH_BITS) -> tuple[list[str], str]:
    """(per-bit weight aggregates, combiner expression) for DuckDB."""
    aggs = [
        f"sum(CASE WHEN (({hash_expr}) >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS w{j}"
        for j in range(n_bits)
    ]
    combine = " + ".join(
        f"(CASE WHEN w{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(n_bits)
    )
    return aggs, combine


def hamming_band_pairs(hashed, hash_col: str, max_hamming: int,
                       id_col: str = "doc_id",
                       n_bits: int = SIMHASH_BITS):
    """(id_a, id_b, hamming) pairs within ``max_hamming`` of each other,
    via pigeonhole band blocking over a SIMHASH_BITS-wide hash column —
    the shared candidate generator of dedup_simhash and the multimodal
    pHash dedup.

    Lossless: a pair within ``max_hamming`` differs in at most
    ``max_hamming`` of the ``max_hamming + 1`` disjoint bands, so at
    least one band matches exactly and the (band, value) equi-join
    finds every qualifying pair; the exact bit_count check runs on
    candidates only.  Pairs matching in several bands collapse via
    distinct (the hash is functionally dependent on the id, so carrying
    it through adds no groups).

    Candidate volume is bounded by band-value cardinality: with
    SIMHASH_BITS=16, bands hold 2^6/2^5/2^5 values, so expect
    ~N^2/2^5-ish candidates — fine for a demonstration hash; a
    production 64-bit fingerprint makes the buckets sparse and the
    same plan linear-ish.  Callers at scale should size the hash width
    to their corpus."""
    band_vals = [
        F.shiftright(F.col(hash_col), off).bitwiseAND(F.lit((1 << width) - 1))
        for off, width in simhash_band_bounds(max_hamming, n_bits)
    ]
    bands = hashed.select(
        id_col, hash_col, F.posexplode(F.array(*band_vals)).alias("band", "bv")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("h_a"),
            F.col(f"b.{hash_col}").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cands.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
