"""Schemas for the CDC engine.

The transcript row is the analog of the reference's per-tile feature row (typed
attributes declared per source, ``scripts/pipelines/pipeline_transform_sea_level.py:621-633``);
the change-event envelope is the analog of its (filename-keyed, mtime-stamped) file
events. Shapes follow ``BASELINE.json:input_hint`` and ``FIXTURES.md``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# key of the upsert — analog of the reference geocellid key
# (`scripts/pipelines/tile_utils.py:82-107`), but composite.
KEY_COLS = ["conv_id", "turn_idx"]

# LWW ordering: major ts, minor lsn (`scripts/pipelines/pipeline_transform_sea_level.py`
# level-k-supersedes-level-(k-1) semantics flipped to event time).
ORDER_COLS = ["ts", "lsn"]

PAYLOAD_COLS = ["role", "text", "tool"]

# Public transcript table shape (BASELINE.json input_hint, exact).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Internal state shape: public columns + LWW minor key + tombstone marker.
# Tombstones must be RETAINED (not physically dropped) so that a late/out-of-order
# event older than an applied delete cannot resurrect the row — the engine's
# strengthening of the reference's racy skip-if-exists idempotence
# (`pipeline_transform_sea_level.py:1377-1380`).
STATE_EXTRA_COLS = ["lsn", "_deleted"]
STATE_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)
    + [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), False),
    ]
)

# Change-event envelope (FIXTURES.md §2).
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # I / U / D
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
    ]
)

# Post-evolution envelope (FIXTURES.md §3): additive nullable column appears
# mid-stream; the engine must union-by-name and null-fill old rows (analog of the
# reference's pre-union type harmonization, `pipeline_transform_vrt_gdal.py:258-306`).
CHANGE_EVOLVED_SCHEMA = T.StructType(
    list(CHANGE_SCHEMA.fields) + [T.StructField("tool_args", T.StringType(), True)]
)
