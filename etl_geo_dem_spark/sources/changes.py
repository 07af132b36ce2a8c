"""Deterministic synthetic CDC change-stream generator.

Patterned on the reference's synthetic key-space generation — a bbox range loop
that fabricates keys then fetches per key
(`scripts/pipelines/pipeline_download_s3_global.py:125-169`) — but fully
distributed: one ``spark.range`` with hash-derived pseudo-random columns. No
Python RNG, no driver loops: the stream is a pure function of ``(id, seed)``, so
any slice regenerates identically on any executor (FIXTURES.md §2 requirements).

Properties generated:
- multiple events per key (inserts, superseding updates, deletes — including
  out-of-order deletes that must LOSE last-writer-wins);
- out-of-order ``ts`` relative to ``lsn`` (bounded backward jitter);
- duplicate deliveries: a deterministic subset of events is emitted twice with the
  same ``lsn`` (idempotence exercise);
- hot-key skew: ``hot_mass`` of events land on ``hot_frac`` of conv_ids
  (default: top 1% of keys carry 50% of events — the salting exercise);
- additive schema evolution: epochs ≥ ``evolve_from_epoch`` carry an extra
  ``tool_args`` column (earlier batches don't have the column at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH_SECONDS = 1_704_067_200  # 2024-01-01T00:00:00Z


def generate_changes(
    spark: SparkSession,
    n_events: int,
    n_conv: int = 500,
    turns_per_conv: int = 40,
    hot_frac: float = 0.01,
    hot_mass: float = 0.5,
    n_epochs: int = 8,
    dup_pct: int = 5,
    ooo_seconds: int = 900,
    seed: int = 42,
    evolve_from_epoch: int | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Return the change stream as a DataFrame in CHANGE(_EVOLVED) shape.

    ``lsn`` is the range id (globally monotone); duplicates re-emit the same lsn.
    """

    def h(k: int):
        return F.xxhash64(F.col("id"), F.lit(seed), F.lit(k))

    def u(k: int, m: int):
        return F.pmod(h(k), F.lit(m))

    n_hot = max(1, int(n_conv * hot_frac))
    df = spark.range(0, n_events, 1, n_partitions or spark.sparkContext.defaultParallelism)

    is_hot = u(1, 1000) < int(hot_mass * 1000)
    conv_num = F.when(is_hot, u(2, n_hot)).otherwise(F.lit(n_hot) + u(3, max(1, n_conv - n_hot)))
    turn_idx = u(4, turns_per_conv).cast("int")
    opsel = u(5, 100)
    op = (
        F.when(opsel < 55, F.lit("I"))
        .when(opsel < 90, F.lit("U"))
        .otherwise(F.lit("D"))
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.pmod(turn_idx, F.lit(3)) + 1).cast("int"),
    )
    events_per_epoch = max(1, n_events // n_epochs)
    epoch = F.least(F.floor(F.col("id") / events_per_epoch), F.lit(n_epochs - 1)).cast("long")
    # event time: forward with id, bounded backward jitter → out-of-order vs lsn
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH_SECONDS) + F.col("id") - u(6, ooo_seconds))

    base = df.select(
        op.alias("op"),
        F.format_string("conv_%06d", conv_num).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(op == "D", F.lit(None).cast("string")).otherwise(role).alias("role"),
        F.when(op == "D", F.lit(None).cast("string"))
        .otherwise(
            F.format_string(
                "msg conv=%d turn=%d lsn=%d", conv_num, turn_idx, F.col("id")
            )
        )
        .alias("text"),
        F.when((op != "D") & (role == F.lit("tool")), F.format_string("tool_%d", u(8, 12)))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        ts.alias("ts"),
        F.col("id").alias("lsn"),
        epoch.alias("epoch"),
        u(7, 100).alias("_dupsel"),
    )
    if evolve_from_epoch is not None:
        base = base.withColumn(
            "tool_args",
            F.when(
                (F.col("epoch") >= evolve_from_epoch) & F.col("tool").isNotNull(),
                F.format_string('{"arg": %d}', F.col("lsn") % 7),
            ).otherwise(F.lit(None).cast("string")),
        )
    # duplicate deliveries: re-emit a deterministic subset with identical lsn
    dups = base.filter(F.col("_dupsel") < dup_pct)
    return base.unionByName(dups).drop("_dupsel")


def epoch_batches(changes: DataFrame, evolve_from_epoch: int | None = None):
    """Yield ``(epoch_id, batch_df)`` ascending; pre-evolution batches physically
    lack the evolved column (true mid-stream schema change, FIXTURES.md §2)."""
    epoch_ids = sorted(r[0] for r in changes.select("epoch").distinct().collect())
    for e in epoch_ids:
        batch = changes.filter(F.col("epoch") == e)
        if (
            evolve_from_epoch is not None
            and e < evolve_from_epoch
            and "tool_args" in batch.columns
        ):
            batch = batch.drop("tool_args")
        yield e, batch
