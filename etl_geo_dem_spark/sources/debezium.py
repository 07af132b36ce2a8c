"""Debezium-style CDC envelope adapter.

Binlog/WAL tails in the wild arrive as Debezium-format envelopes (public
format: https://debezium.io — op 'c'/'u'/'d'/'r', before/after images, source
LSN, ts_ms). This adapter normalizes that envelope into the engine's CHANGE
shape with pure column expressions — the boundary where an external connector
plugs into `plans/merge.apply_changes` / `streaming/ingest.start_cdc_ingest`.

Reference analog: per-source filename regexes normalizing heterogeneous inputs
to one key scheme (`scripts/settings.py:80-81` ESA vs USGS patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# envelope as landed from a Kafka topic / file dump (payload already unwrapped)
DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # c / u / d / r (snapshot read)
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField(
            "before",
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType()),
                    T.StructField("turn_idx", T.IntegerType()),
                    T.StructField("role", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("tool", T.StringType()),
                ]
            ),
            True,
        ),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType()),
                    T.StructField("turn_idx", T.IntegerType()),
                    T.StructField("role", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("tool", T.StringType()),
                ]
            ),
            True,
        ),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("lsn", T.LongType(), False),
                    T.StructField("db", T.StringType()),
                    T.StructField("table", T.StringType()),
                ]
            ),
            False,
        ),
    ]
)


def from_debezium(
    df: DataFrame, epoch: int | None = None, extra_cols: list[str] | None = None
) -> DataFrame:
    """Normalize a Debezium envelope DataFrame to the engine CHANGE shape.

    - op: c (create) and r (snapshot read) → I; u → U; d → D
    - payload image: `after` for upserts, `before` for deletes (keys only —
      payload columns are nulled, matching CHANGE_SCHEMA delete semantics)
    - LWW stamp: (to_timestamp(ts_ms), source.lsn)
    - ``extra_cols``: passthrough columns (e.g. Kafka topic/partition/offset
      lineage) appended unchanged after the CHANGE columns.
    """
    img = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    is_del = F.col("op") == "d"
    out = df.select(
        F.when(F.col("op").isin("c", "r"), F.lit("I"))
        .when(F.col("op") == "u", F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("op"),
        img["conv_id"].alias("conv_id"),
        img["turn_idx"].alias("turn_idx"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(img["role"]).alias("role"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(img["text"]).alias("text"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(img["tool"]).alias("tool"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        F.col("source.lsn").alias("lsn"),
        *[F.col(c) for c in (extra_cols or [])],
    )
    return out.withColumn("epoch", F.lit(epoch if epoch is not None else 0).cast("long"))


def read_debezium_json(spark, path: str, epoch: int | None = None) -> DataFrame:
    """Read a directory/file of Debezium JSON events and normalize."""
    return from_debezium(spark.read.schema(DEBEZIUM_SCHEMA).json(path), epoch=epoch)
