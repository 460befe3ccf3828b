"""mediawiki_to_notion_spark — a PySpark-native document ETL & analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
knightjoel/mediawiki-to-notion (see SURVEY.md) as idiomatic Spark:

- ``sources``    — MediaWiki XML dump scan, streaming markdown file source,
                   star-schema parquet loaders.
- ``functions``  — wikitext rule-chain (regexp_replace rule table + stateful
                   code fencer), markdown→Notion-block parser, text analysis,
                   vector math.
- ``operators``  — the relational operator library (SURVEY §2) plus the
                   north-star extensions: dedup, similarity search,
                   multimodal column plumbing.
- ``plans``      — the three end-to-end entry points of the reference as
                   batch DataFrame pipelines.
- ``streaming``  — Structured Streaming ingest (md → blocks/pages) and the
                   ordered, rate-limited, fail-fast idempotent upload sink.

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join
selection; Python appears only in Arrow-batched `mapInPandas`/`pandas_udf`
stages (document conversion) and the external-API sink.
"""

__version__ = "0.1.0"
