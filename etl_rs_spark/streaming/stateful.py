"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stream state is Kafka's committed offset
(src/kafka.rs:134); a CDC engine needs per-key state that survives
micro-batches. This module provides the canonical one: a per-doc_id
running aggregate (event count, last (lsn, offset) seen, last op) kept
in Spark's state store, emitted as an update stream.

Arrow-batched per group (pandas DataFrames in, pandas DataFrames out) —
the GroupState API is the supported PySpark surface for custom
stateful logic (Spark >= 3.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events bigint, last_lsn bigint, last_offset bigint, last_op string"
OUTPUT_SCHEMA = (
    "doc_id string, n_events bigint, last_lsn bigint, last_offset bigint, last_op string"
)


def _track_doc(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (doc_id,) = key
    if state.exists:
        n_events, last_lsn, last_offset, last_op = state.get
    else:
        n_events, last_lsn, last_offset, last_op = 0, -1, -1, None
    for pdf in pdfs:
        n_events += len(pdf)
        # LWW ordering: track the max (lsn, offset) and its op
        idx = pdf[["lsn", "offset"]].astype("int64")
        best = idx.sort_values(["lsn", "offset"]).index[-1]
        if (int(pdf.at[best, "lsn"]), int(pdf.at[best, "offset"])) > (last_lsn, last_offset):
            last_lsn = int(pdf.at[best, "lsn"])
            last_offset = int(pdf.at[best, "offset"])
            last_op = str(pdf.at[best, "op"])
    state.update((n_events, last_lsn, last_offset, last_op))
    yield pd.DataFrame(
        {
            "doc_id": [doc_id],
            "n_events": [n_events],
            "last_lsn": [last_lsn],
            "last_offset": [last_offset],
            "last_op": [last_op],
        }
    )


def track_doc_state(events: DataFrame) -> DataFrame:
    """Streaming per-doc running state. ``events`` must be a streaming
    DataFrame with (doc_id, op, lsn, offset). Emits one updated row per
    doc per micro-batch."""
    return (
        events.select("doc_id", "op", "lsn", "offset")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _track_doc,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
