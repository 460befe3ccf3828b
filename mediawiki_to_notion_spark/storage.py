"""Parquet-backed keyed tables with MERGE-upsert semantics.

The reference's DynamoDB tables do conditional puts for idempotency
(store_notion_blocks.py:128-150) and delete-on-consume
(upload_notion_blocks.py:304-309).  Here each table is a columnar
parquet directory and mutation is a versioned rewrite:

    merged = target FULL OUTER JOIN source ON keys → coalesce columns

written to a new version directory then atomically pointed-to — the same
copy-on-write shape Delta Lake's MERGE plans (we avoid the Delta
dependency; swap `ParquetTable` for `DeltaTable.merge` on a cluster with
Delta available and nothing above this module changes).  Consume-delete
becomes an `uploaded_at` status flip + anti-join, avoiding the
delete-heavy pattern (SURVEY §1.1 row 7).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTable:
    """A keyed table stored as parquet with copy-on-write upserts."""

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str],
                 schema=None) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    # -- versioning -----------------------------------------------------------

    def _versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit():
                out.append(int(name[1:]))
        return sorted(out)

    def _current_dir(self) -> str | None:
        vs = self._versions()
        return os.path.join(self.path, f"v{vs[-1]}") if vs else None

    def exists(self) -> bool:
        return self._current_dir() is not None

    def read(self) -> DataFrame:
        cur = self._current_dir()
        if cur is None:
            if self.schema is None:
                raise FileNotFoundError(f"empty table {self.path} and no schema")
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(cur)

    def _write_version(self, df: DataFrame) -> None:
        vs = self._versions()
        nxt = (vs[-1] + 1) if vs else 0
        target = os.path.join(self.path, f"v{nxt}")
        df.write.mode("overwrite").parquet(target)
        # retain only the latest two versions (cheap time travel + GC)
        for old in vs[:-1]:
            shutil.rmtree(os.path.join(self.path, f"v{old}"), ignore_errors=True)

    # -- mutations ------------------------------------------------------------

    def overwrite(self, df: DataFrame) -> None:
        self._write_version(df)

    def append(self, df: DataFrame) -> None:
        if self.exists():
            self._write_version(self.read().unionByName(df))
        else:
            self._write_version(df)

    def upsert(self, source: DataFrame,
               insert_only: bool = False,
               update_cols: list[str] | None = None) -> None:
        """MERGE: matched rows take source values (or are kept untouched
        when ``insert_only`` — the conditional-put idempotency of
        store_notion_blocks.py:136), unmatched source rows insert."""
        if not self.exists():
            base = self.spark.createDataFrame([], self.schema) if self.schema else None
            if base is not None:
                missing = [c for c in base.columns if c not in source.columns]
                for c in missing:
                    source = source.withColumn(
                        c, F.lit(None).cast(base.schema[c].dataType)
                    )
                source = source.select(base.columns)
            self._write_version(source)
            return
        target = self.read()
        cols = target.columns
        t = target.alias("t")
        s = source.alias("s")
        cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in self.key_cols]
        joined = t.join(s, cond, "full_outer")
        out_cols = []
        for c in cols:
            tc = F.col(f"t.{c}")
            # a source missing non-key columns only updates what it carries
            sc = (
                F.col(f"s.{c}") if c in source.columns
                else F.lit(None).cast(target.schema[c].dataType)
            )
            if c in self.key_cols:
                out_cols.append(F.coalesce(tc, sc).alias(c))
            elif insert_only or c not in source.columns:
                # keep target when the key already exists
                out_cols.append(
                    F.when(F.col(f"t.{self.key_cols[0]}").isNotNull(), tc)
                    .otherwise(sc).alias(c)
                )
            elif update_cols is not None and c not in update_cols:
                out_cols.append(F.coalesce(tc, sc).alias(c))
            else:
                # source wins when present (matched-update + insert)
                out_cols.append(
                    F.when(F.col(f"s.{self.key_cols[0]}").isNotNull(), sc)
                    .otherwise(tc).alias(c)
                )
        self._write_version(joined.select(out_cols))

    def delete_where(self, condition) -> None:
        self._write_version(self.read().filter(~condition))
