"""Single-threaded Python reference replayer — the dual oracle.

Analog of the reference's dual-oracle test design: the same answer computed
through two fully independent paths must agree (PostGIS table vs GDAL-on-tif with
the ``db == tif − 1`` invariant, `/root/reference/tests/test_module.py:98-141`).
Here: the distributed Spark MERGE replay vs this trivial in-memory fold. Equality
is asserted per turn, under stable ``(conv_id, turn_idx)`` ordering
(BASELINE.json input_hint).

Deliberately naive — correctness by obviousness, not speed.
"""

from __future__ import annotations

from typing import Any


def replay_reference(events: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Fold change events into final state; returns live rows sorted by key.

    Apply order is ``(epoch, lsn)``; the LWW decision is on ``(ts, lsn)`` — an
    arriving event older than the applied one (including one older than an applied
    DELETE tombstone) is a no-op. Duplicate deliveries (same lsn) are no-ops.
    """
    state: dict[tuple, dict[str, Any]] = {}
    payload_cols: set[str] = set()
    for ev in sorted(events, key=lambda e: (e["epoch"], e["lsn"])):
        key = (ev["conv_id"], ev["turn_idx"])
        cur = state.get(key)
        stamp = (ev["ts"], ev["lsn"])
        if cur is not None and stamp <= (cur["ts"], cur["lsn"]):
            continue  # older or duplicate → LWW no-op
        row = {k: v for k, v in ev.items() if k not in ("op", "epoch")}
        row["_deleted"] = ev["op"] == "D"
        payload_cols.update(row.keys())
        state[key] = row
    out = []
    for (conv_id, turn_idx) in sorted(state.keys()):
        row = state[(conv_id, turn_idx)]
        if row["_deleted"]:
            continue
        full = {c: row.get(c) for c in sorted(payload_cols) if c != "_deleted"}
        out.append(full)
    return out
