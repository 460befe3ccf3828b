"""Shared quartile-scoring machinery (the RFM / quality-ensemble
pattern): one 1-row percentile-boundary aggregate, broadcast back, with
4-way CASE scoring — never an ntile/rank window over the corpus.

Both the DataFrame expressions and the DuckDB SQL fragments live here
so the two engines' tie handling can only change in one place.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUARTILE_PROBS = ((1, 0.25), (2, 0.5), (3, 0.75))


def quartile_bounds(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """1-row frame of quartile boundaries: for each ``prefix -> col``
    pair, columns ``<prefix>1 <prefix>2 <prefix>3`` (q25/q50/q75).
    Percentiles skip NULLs (both engines agree)."""
    return df.agg(
        *[
            F.expr(f"percentile({col}, {p})").alias(f"{prefix}{i}")
            for prefix, col in cols.items()
            for i, p in QUARTILE_PROBS
        ]
    )


def quartile_score(col: str, prefix: str,
                   null_score: int | None = None) -> Column:
    """1..4 score of ``col`` against broadcast ``<prefix>N`` bounds.
    NULL values score ``null_score`` when given (they would otherwise
    fall through every <= comparison into the top bucket)."""
    scored = (
        F.when(F.col(col) <= F.col(f"{prefix}1"), 1)
        .when(F.col(col) <= F.col(f"{prefix}2"), 2)
        .when(F.col(col) <= F.col(f"{prefix}3"), 3)
        .otherwise(4)
    )
    if null_score is not None:
        return F.when(F.col(col).isNull(), null_score).otherwise(scored)
    return scored


def quartile_bounds_sql(cols: dict[str, str]) -> str:
    """DuckDB twin of :func:`quartile_bounds` (SELECT-list fragment)."""
    return ", ".join(
        f"quantile_cont({col}, {p}) AS {prefix}{i}"
        for prefix, col in cols.items()
        for i, p in QUARTILE_PROBS
    )


def quartile_score_sql(col: str, prefix: str,
                       null_score: int | None = None) -> str:
    """DuckDB twin of :func:`quartile_score` (CASE expression)."""
    case = (
        f"CASE WHEN {col} <= {prefix}1 THEN 1"
        f" WHEN {col} <= {prefix}2 THEN 2"
        f" WHEN {col} <= {prefix}3 THEN 3 ELSE 4 END"
    )
    if null_score is not None:
        return f"CASE WHEN {col} IS NULL THEN {null_score} ELSE {case} END"
    return case
