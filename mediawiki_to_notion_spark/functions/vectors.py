"""Vector math over ArrayType(FloatType) embedding columns.

Pure `pyspark.sql.functions` higher-order functions (zip_with /
aggregate / transform) — sequential left-fold accumulation in double
precision, which is also what the DuckDB oracle's list functions do, so
results are bit-comparable.  For the 100 TB path these expressions run
inside codegen; no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


EMB_DIM = 64  # the corpus embedding dimensionality (TESTDATA.md)


def hygiene(df, col: str = "embedding", dim: int = EMB_DIM):
    """Drop NULL and wrong-dimension vectors before whole-vector math.

    Cosine/dot/norm are undefined on missing, empty, or mis-sized
    vectors, and both engines CRASH rather than degrade (Spark: ANSI
    divide-by-zero on the norm; DuckDB: list_inner_product rejects NULL
    elements and unequal lengths) — at 100 TB one malformed row must
    not kill the job.  The vector-math query family filters through
    this (and its SQL twin ``hygiene_oracle``) so both engines operate
    on the identical clean set; malformed vectors are the corrupt-
    record-quarantine concern of the ingest layer, not of similarity
    math."""
    return df.filter(F.col(col).isNotNull() & (F.size(col) == dim))


def _emb_clean(dim: int) -> str:
    return ('(SELECT * FROM "embeddings" '
            f"WHERE embedding IS NOT NULL AND len(embedding) = {dim})")


def hygiene_oracle(sql: str, dim: int = EMB_DIM) -> str:
    """SQL twin of :func:`hygiene`: rewrite every reference to the raw
    ``embeddings`` view into the hygiene-filtered derived table.  Single
    pass, so the quoted view name inside the replacement is not itself
    rewritten; the word boundary keeps the ``embedding`` column and
    other identifiers untouched."""
    import re

    return re.sub(r'(?<!")\bembeddings\b(?!")', _emb_clean(dim), sql)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane(j: int, dim: int = 64) -> Column:
    """Deterministic pseudo-random hyperplane j as a literal-free column
    expression: with i = j*dim + k + 1, component k is
    frac-ish(i*(i+1) * Knuth-constant) - 0.5.  Integer arithmetic only,
    so Spark and SQL agree exactly.

    The QUADRATIC index mix is load-bearing (r7 sf10 soak finding): the
    r1-r6 generator used the linear stream (j*dim+k)*c mod 2^31, under
    which plane j+1 is plane j plus ONE shared constant (a Weyl
    translate) — successive planes had |cosine| up to 0.82, so p
    nominal planes carried far fewer effective bits and SRP buckets
    skewed hard (max occupancy 273 of 20k vectors at p=13; grew
    linearly with the corpus, candidate pairs quadratically).  With
    i*(i+1) the inter-plane offset varies per component: measured
    |cosine| <= 0.31, max occupancy 17, same-bucket pairs down 17x on
    the same corpus.  i*(i+1)*c <= ~1.7e17 for every plane family in
    use, well inside int64 in both engines."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda k: (
            (F.lit(j * dim + 1).cast("long") + k)
            * (F.lit(j * dim + 2).cast("long") + k)
            * 2654435761 % 2147483648
        ) / 2147483648.0 - 0.5,
    )


def np_hyperplane(j: int, dim: int = 64):
    """Numpy twin of :func:`hyperplane`, bit-identical: the formula is
    integer-exact (products <= ~1.7e17 < 2^63 in int64), the division
    by 2^31 and the 0.5 subtraction are IEEE-exact, so the float64
    components equal the JVM/DuckDB values to the last bit."""
    import numpy as np

    k = np.arange(dim, dtype=np.int64)
    v = ((j * dim + 1 + k) * (j * dim + 2 + k) * 2654435761) % 2147483648
    return v.astype(np.float64) / 2147483648.0 - 0.5


def np_srp_buckets(X, base: int, n_planes: int):
    """SRP bucket ids for rows of X under planes base..base+n_planes-1,
    with DIMENSION-SEQUENTIAL dot accumulation (np_fold_dots order) so
    every sign decision is bit-identical to the engines' aggregate
    folds.  Returns int64 bucket ids."""
    import numpy as np

    H = np.stack([np_hyperplane(base + j, X.shape[1])
                  for j in range(n_planes)])        # (p, d)
    dots = np_fold_dots(X, H)                        # (n, p), exact order
    bits = (dots > 0).astype(np.int64)
    return (bits << np.arange(n_planes, dtype=np.int64)).sum(axis=1)


def hyperplane_sql(j: int, dim: int = 64) -> str:
    """DuckDB twin of :func:`hyperplane` (a DOUBLE[] literal expression)."""
    return (
        f"list_transform(range(0, {dim}), k -> "
        f"((({j * dim + 1} + k) * ({j * dim + 2} + k) * 2654435761)"
        f" % 2147483648) / 2147483648.0 - 0.5)"
    )


def np_fold_dots(A, B):
    """Pairwise dot products with *dimension-sequential* accumulation —
    the same left-fold order as the engines' `aggregate(zip_with(...))`,
    so results are bit-identical to the JVM/DuckDB folds (a BLAS matmul
    would differ in the last ulp and break 6-dp-rounded parity)."""
    import numpy as np

    acc = np.zeros((A.shape[0], B.shape[0]))
    for k in range(A.shape[1]):
        acc += np.multiply.outer(A[:, k], B[:, k])
    return acc


def np_fold_sq(A):
    """Row-wise squared norms, dimension-sequential (see np_fold_dots)."""
    import numpy as np

    acc = np.zeros(A.shape[0])
    for k in range(A.shape[1]):
        acc += A[:, k] * A[:, k]
    return acc
