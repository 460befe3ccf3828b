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
    expression: component k = frac-ish((j*dim+k) * Knuth-constant) - 0.5.
    Integer arithmetic only, so Spark and SQL agree exactly."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda k: ((F.lit(j * dim).cast("long") + k) * 2654435761 % 2147483648)
        / 2147483648.0 - 0.5,
    )


def hyperplane_sql(j: int, dim: int = 64) -> str:
    """DuckDB twin of :func:`hyperplane` (a DOUBLE[] literal expression)."""
    return (
        f"list_transform(range(0, {dim}), k -> "
        f"((({j * dim} + k) * 2654435761) % 2147483648) / 2147483648.0 - 0.5)"
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
