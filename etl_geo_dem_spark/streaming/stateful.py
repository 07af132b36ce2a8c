"""Custom stateful streaming operator via applyInPandasWithState.

Per-conversation running state (turns seen, max lsn, last event time) carried
across micro-batches — the streaming analog of the reference's per-tile
accumulated state between flood levels (`pipeline_transform_sea_level.py:
1424-1545`, W1): state lives in the state store, keyed exactly like the table.

Arrow-batched per group (P3 analog: `pool.map(geomorphon_process_files, ...)`,
`pipeline_flows.py:194-234`) — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, turns_seen long, max_lsn long, batch_rows long"
STATE_SCHEMA = "turns_seen long, max_lsn long"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (conv_id,) = key
    turns, max_lsn = state.get if state.exists else (0, -1)
    batch_rows = 0
    seen = set()
    for pdf in pdfs:
        batch_rows += len(pdf)
        seen.update(pdf["turn_idx"].unique().tolist())
        m = int(pdf["lsn"].max())
        if m > max_lsn:
            max_lsn = m
    turns = turns + len(seen)  # approximation: per-batch new-turn count
    state.update((turns, max_lsn))
    yield pd.DataFrame(
        [{"conv_id": conv_id, "turns_seen": turns, "max_lsn": max_lsn, "batch_rows": batch_rows}]
    )


def running_conversation_state(stream_df):
    """Attach the stateful per-conversation tracker to a change stream."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
