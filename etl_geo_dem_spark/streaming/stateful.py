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
STATE_SCHEMA = "seen_turns array<int>, max_lsn long"

# exact distinct-turn tracking saturates here; transcripts are bounded in
# practice (a conversation has thousands of turns at most), so the cap is a
# state-size guard, not an expected path. Past the cap, turns_seen stays at
# the cap (monotone, never overcounts): the stored set is truncated AFTER
# merging each batch — never left to overshoot and never frozen below the cap
# while new distinct turns still arrive.
# NOTE (checkpoint compatibility): STATE_SCHEMA changed in round 2 from
# (long, long) to (array<int>, long); the streaming state store encodes the
# state schema, so checkpoints written by the old layout CANNOT be restored —
# discard the checkpoint dir (replaying the source reconstructs the state).
MAX_TRACKED_TURNS = 65536


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (conv_id,) = key
    seen_list, max_lsn = state.get if state.exists else ([], -1)
    seen = {int(v) for v in (seen_list or [])}
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        seen.update(int(x) for x in pdf["turn_idx"].unique())
        m = int(pdf["lsn"].max())
        if m > max_lsn:
            max_lsn = m
    if len(seen) > MAX_TRACKED_TURNS:
        # deterministic truncation (keep the smallest turn indices) so restarts
        # and retried micro-batches converge to identical state
        seen = set(sorted(seen)[:MAX_TRACKED_TURNS])
    # exact distinct count: turn_idx values re-seen across micro-batches are
    # counted once (the seen-set lives in the state store with the key).
    state.update((sorted(seen), max_lsn))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "turns_seen": len(seen),
                "max_lsn": max_lsn,
                "batch_rows": batch_rows,
            }
        ]
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
