"""Central registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 (and the north-star extensions) registers
itself here.  The driver contract (``__spark_entry__.queries()`` /
``oracle_sql()``) is served straight from these dicts.

A query is a ``Callable[[SparkSession, str], DataFrame]`` taking the
session and a scale-factor directory.  The oracle is ANSI SQL that DuckDB
runs against the same parquet tables (pre-registered views).  Queries with
no SQL-expressible oracle register with ``oracle=None`` and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from mediawiki_to_notion_spark.operators import (  # noqa: F401
        analytics_ext,
        corpus_quality,
        data_prep,
        dedup,
        dedup_ext,
        graph_ops,
        kmeans,
        multimodal,
        pipeline_queries,
        relational,
        scalar_ops,
        similarity,
        text_analysis,
        training_data,
        unigram_lm,
        wordpiece,
        wikitext_queries,
    )

    # cross-module composed oracles (need every part registered first)
    similarity._register_rrf_oracle()
    training_data._register_pipeline_oracle()
