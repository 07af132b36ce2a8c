"""Round-5 tests, part 2 — the streaming-tail fixed-cost shave (VERDICT r4
Next #6): the single-shuffle ``bucket_sorted`` LWW strategy, the
``pre_partitioned`` writer fast path it enables on MOR, and the async
advisory epoch-manifest write. Each must be result-identical to the default
config — the shave moves cost, never semantics.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_geo_dem_spark.config import EngineConfig
from etl_geo_dem_spark.operators.lww import lww_winners
from etl_geo_dem_spark.plans.lake_table import BUCKET_COL, LakeTable, bucket_expr
from etl_geo_dem_spark.plans.merge import apply_changes, flush_epoch_manifests, replay
from etl_geo_dem_spark.schemas import CHANGE_SCHEMA, STATE_SCHEMA
from etl_geo_dem_spark.sources.changes import generate_changes
from etl_geo_dem_spark.streaming.ingest import start_cdc_ingest

TAIL_CFG = EngineConfig(
    dedup_strategy="bucket_sorted", merge_mode="mor", epoch_manifest_async=True
)


def _changes(spark, n=3000, n_epochs=3):
    return generate_changes(
        spark, n, n_conv=50, turns_per_conv=8, n_epochs=n_epochs,
        evolve_from_epoch=None, n_partitions=8,
    )


def _final_pd(table):
    return table.read_public().orderBy("conv_id", "turn_idx").toPandas()


def test_bucket_sorted_winners_match_agg(spark):
    """Same logical result as the reference ``agg`` strategy: the run-boundary
    filter over a (bucket-partitioned, key-asc/order-desc) sort picks exactly
    the per-key argmax(ts, lsn)."""
    ch = _changes(spark).withColumn(BUCKET_COL, bucket_expr("conv_id", 8))
    cols = ["conv_id", "turn_idx", "ts", "lsn", "op", "text"]
    outs = {
        strat: (
            lww_winners(ch, strategy=strat)
            .orderBy("conv_id", "turn_idx")
            .select(*cols)
            .toPandas()
        )
        for strat in ("agg", "bucket_sorted")
    }
    assert len(outs["agg"]) > 0
    assert outs["agg"].equals(outs["bucket_sorted"])


def test_bucket_sorted_is_single_exchange(spark):
    """The whole point of the strategy: dedup and write clustering share ONE
    shuffle. The winners plan must contain exactly one Exchange, and it must
    be partitioned by the storage bucket (so write_data_files can take the
    output pre_partitioned without re-shuffling)."""
    ch = _changes(spark).withColumn(BUCKET_COL, bucket_expr("conv_id", 8))
    winners = lww_winners(ch, strategy="bucket_sorted")
    plan = winners._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, f"expected 1 Exchange, got {n_exchanges}:\n{plan}"
    assert BUCKET_COL in plan.split("Exchange", 1)[1].split("\n", 1)[0]


@pytest.mark.parametrize("merge_mode", ["mor", "cow"])
def test_replay_bucket_sorted_async_matches_default(spark, warehouse, merge_mode):
    """Full replay under the streaming-tail config (single-shuffle dedup +
    pre-partitioned MOR write + async manifests) is state-identical to the
    default agg/sync config, and every advisory manifest still lands."""
    n_epochs = 3
    ch = _changes(spark, n_epochs=n_epochs)

    ref = LakeTable.create(
        spark, os.path.join(warehouse, f"ref_{merge_mode}"), STATE_SCHEMA, n_buckets=8
    )
    replay(ref, ch, EngineConfig(dedup_strategy="agg", merge_mode=merge_mode))

    tail = LakeTable.create(
        spark, os.path.join(warehouse, f"tail_{merge_mode}"), STATE_SCHEMA, n_buckets=8
    )
    cfg = EngineConfig(
        dedup_strategy="bucket_sorted", merge_mode=merge_mode,
        epoch_manifest_async=True,
    )
    replay(tail, ch, cfg)
    flush_epoch_manifests()  # barrier for the async advisory writes

    got, exp = _final_pd(tail), _final_pd(ref)
    assert len(got) == len(exp) > 0
    for col in ["conv_id", "turn_idx", "ts", "text"]:
        assert got[col].fillna("∅").tolist() == exp[col].fillna("∅").tolist(), col

    manifests = tail.read_epoch_manifests()
    assert sorted(m["epoch_id"] for m in manifests) == list(range(n_epochs))
    assert all(m["status"] == "committed" for m in manifests)


def test_stream_ingest_tail_config_matches_batch(spark, warehouse, tmp_path):
    """End-to-end micro-batch ingest under the tail config: exactly-once
    result equality with a single-shot batch apply, manifests complete."""
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    n_epochs = 3
    ch = _changes(spark, n=1500, n_epochs=n_epochs)
    for e in range(n_epochs):
        (
            ch.filter(F.col("epoch") == e)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"batch_{e}"))
        )

    stable = LakeTable.create(
        spark, os.path.join(warehouse, "tail_stream"), STATE_SCHEMA, n_buckets=8
    )
    q = start_cdc_ingest(
        spark, stable, src + "/*/", CHANGE_SCHEMA, ckpt, TAIL_CFG,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    flush_epoch_manifests()

    btable = LakeTable.create(
        spark, os.path.join(warehouse, "tail_batch"), STATE_SCHEMA, n_buckets=8
    )
    apply_changes(btable, ch, 0)

    got, exp = _final_pd(stable), _final_pd(btable)
    assert len(got) == len(exp) > 0
    for col in ["conv_id", "turn_idx", "text", "ts"]:
        assert got[col].fillna("∅").tolist() == exp[col].fillna("∅").tolist(), col
    assert len(stable.read_epoch_manifests()) == n_epochs


def test_bucket_sorted_replay_with_schema_evolution_matches_agg(spark, warehouse):
    """Mid-stream additive evolution (tool_args appears at epoch 2) under the
    single-shuffle strategy: the bucket column is added BEFORE dedup, so the
    evolved batch shape must flow through unchanged — state identical to the
    default strategy including the evolved column."""
    ch = generate_changes(
        spark, 3000, n_conv=50, turns_per_conv=8, n_epochs=3,
        evolve_from_epoch=2, n_partitions=8,
    )

    def _run(name, strategy):
        t = LakeTable.create(
            spark, os.path.join(warehouse, name), STATE_SCHEMA, n_buckets=8
        )
        for e in range(3):
            batch = ch.filter(F.col("epoch") == e)
            if e < 2 and "tool_args" in batch.columns:
                batch = batch.drop("tool_args")
            apply_changes(
                t, batch, e,
                EngineConfig(dedup_strategy=strategy, merge_mode="mor"),
            )
        return t.read_public().orderBy("conv_id", "turn_idx").toPandas()

    exp = _run("evo_agg", "agg")
    got = _run("evo_tail", "bucket_sorted")
    assert "tool_args" in got.columns  # evolution reached the tail config
    assert len(got) == len(exp) > 0
    for col in ("conv_id", "turn_idx", "ts", "text", "tool_args"):
        assert got[col].fillna("∅").tolist() == exp[col].fillna("∅").tolist(), col
