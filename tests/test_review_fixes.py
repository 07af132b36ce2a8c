"""Regression tests for the round-3 self-review findings: drop_column CAS
re-derivation, CDF stamps for GC'd-tombstone deletes vs later re-inserts,
type-correct bucket_of on numeric keys, vacuum on a clone()d replica, and
the bucketing-key widening guard."""

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_geo_dem_spark.config import EngineConfig
from etl_geo_dem_spark.plans.lake_table import BUCKET_COL, LakeTable, bucket_expr
from etl_geo_dem_spark.plans.merge import (
    SchemaEvolutionError,
    apply_changes,
    replay,
    sync_from,
)
from etl_geo_dem_spark.schemas import STATE_SCHEMA
from etl_geo_dem_spark.sources.changes import generate_changes

UTC = datetime.timezone.utc


def _mk_table(spark, warehouse, name="t", n_buckets=4):
    return LakeTable.create(
        spark, os.path.join(warehouse, name), STATE_SCHEMA, n_buckets=n_buckets
    )


def test_drop_column_rederives_schema_after_commit_conflict(spark, warehouse):
    """A schema evolution that lands between drop_column's snapshot read and
    its commit must survive the drop (previously the stale pre-conflict
    schema erased the interloper's column without tombstoning it)."""
    table = _mk_table(spark, warehouse)
    ch = generate_changes(spark, 600, n_conv=15, n_epochs=1)
    replay(table, ch)

    real_commit = table.commit
    state = {"interfered": False}

    def racing_commit(*args, **kwargs):
        if not state["interfered"]:
            state["interfered"] = True
            # interloper: additive evolution commits first
            evolved = ch.withColumn("epoch", F.lit(1).cast("long")).withColumn(
                "extra_col", F.lit("x")
            )
            apply_changes(table, evolved, 1)
            # the outer attempt's CAS must now fail and re-derive
        return real_commit(*args, **kwargs)

    table.commit = racing_commit
    try:
        table.drop_column("tool")
    finally:
        table.commit = real_commit

    names = [f.name for f in table.schema().fields]
    assert "tool" not in names
    assert "extra_col" in names, "concurrent evolution was erased by drop_column"
    assert table.snapshot()["dropped_columns"] == ["tool"]


def test_cdf_gc_delete_stamp_does_not_shadow_later_reinsert(spark, warehouse):
    """Delete K, expire its tombstone, sync; then re-insert K in the source
    with a ts SMALLER than other events in the sync range — the re-insert
    must still win downstream (the fabricated delete stamp is minimal, not
    range-max)."""
    src = _mk_table(spark, warehouse, "src")
    dst = _mk_table(spark, warehouse, "dst")

    def ev(op, conv, ts_s, lsn, epoch, text="t"):
        return {
            "op": op, "conv_id": conv, "turn_idx": 0, "role": "user",
            "text": text, "tool": None,
            "ts": datetime.datetime(2024, 1, 1, tzinfo=UTC)
            + datetime.timedelta(seconds=ts_s),
            "lsn": lsn, "epoch": epoch,
        }

    from etl_geo_dem_spark.schemas import CHANGE_SCHEMA

    # epoch 0: K at ts=100; unrelated key far in the future (ts=1e6)
    e0 = spark.createDataFrame(
        [ev("I", "K", 100, 1, 0), ev("I", "other", 1_000_000, 2, 0)], CHANGE_SCHEMA
    )
    apply_changes(src, e0, 0)
    sync_from(dst, src)

    # epoch 1: delete K at ts=110, then GC the tombstone before the next sync
    e1 = spark.createDataFrame([ev("D", "K", 110, 3, 1)], CHANGE_SCHEMA)
    apply_changes(src, e1, 1)
    src.expire_tombstones(below_lsn=2 ** 62)
    sync_from(dst, src)
    assert dst.read_public().filter(F.col("conv_id") == "K").count() == 0

    # epoch 2: source re-inserts K at ts=200 — far below the range's max ts
    e2 = spark.createDataFrame([ev("I", "K", 200, 4, 2, text="back")], CHANGE_SCHEMA)
    apply_changes(src, e2, 2)
    sync_from(dst, src)
    rows = dst.read_public().filter(F.col("conv_id") == "K").collect()
    assert len(rows) == 1 and rows[0]["text"] == "back"
    assert sorted(r["conv_id"] for r in dst.read_public().collect()) == ["K", "other"]


def _long_key_table(spark, warehouse):
    schema = T.StructType(
        [
            T.StructField("conv_id", T.LongType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("lsn", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), False),
        ]
    )
    return LakeTable.create(
        spark, os.path.join(warehouse, "longkey"), schema, n_buckets=8
    )


def test_bucket_of_casts_literal_to_stored_key_type(spark, warehouse):
    """xxhash64 is type-sensitive: point_lookup on a LONG key column given a
    small Python int must hash the LONG representation, not int32."""
    table = _long_key_table(spark, warehouse)
    rows = [
        (i, 0, f"txt{i}", datetime.datetime(2024, 1, 1, tzinfo=UTC), i, False)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, table.schema()).withColumn(
        BUCKET_COL, bucket_expr("conv_id", 8)
    )
    files = table.write_data_files(df)
    table.commit(files, summary={"operation": "merge", "epoch_id": 0})

    for key in (0, 7, 19):
        got = table.point_lookup(key).collect()
        assert len(got) == 1 and got[0]["text"] == f"txt{key}", (
            f"point_lookup({key}) probed the wrong bucket"
        )


def test_widening_bucketing_key_refused(spark, warehouse):
    """Widening the BUCKETING key column would re-hash every key into a
    different bucket — refused; widening non-bucketing key parts stays OK."""
    schema_int = T.StructType(
        [
            T.StructField("conv_id", T.IntegerType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("lsn", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), False),
        ]
    )
    t2 = LakeTable.create(
        spark, os.path.join(warehouse, "intkey"), schema_int, n_buckets=4
    )
    wide_batch = spark.createDataFrame(
        [("I", 1, 0, "x", datetime.datetime(2024, 1, 1, tzinfo=UTC), 1, 0)],
        T.StructType(
            [
                T.StructField("op", T.StringType(), False),
                T.StructField("conv_id", T.LongType(), False),  # widens the bucket key
                T.StructField("turn_idx", T.IntegerType(), False),
                T.StructField("text", T.StringType(), True),
                T.StructField("ts", T.TimestampType(), False),
                T.StructField("lsn", T.LongType(), False),
                T.StructField("epoch", T.LongType(), False),
            ]
        ),
    )
    with pytest.raises(SchemaEvolutionError, match="bucketing key"):
        apply_changes(t2, wide_batch, 0)


def test_vacuum_on_cloned_replica_with_expired_history(spark, warehouse):
    """clone() omits expired snapshots' JSONs; replica vacuum must skip the
    holes instead of crashing on a missing snapshot file."""
    table = _mk_table(spark, warehouse, "vsrc")
    ch = generate_changes(spark, 1200, n_conv=25, n_epochs=4)
    replay(table, ch)
    table.vacuum(keep_versions=1, orphan_grace_sec=0.0)
    replica = table.clone(os.path.join(warehouse, "vdst"))
    removed = replica.vacuum(keep_versions=3, orphan_grace_sec=0.0)
    assert isinstance(removed, list)  # no FileNotFoundError
    assert replica.read_public().count() == table.read_public().count()


def test_empty_batch_with_expectations_commits_cleanly(spark, warehouse):
    """F.sum over an empty batch is NULL — the gate must treat it as zero
    violations, not crash, and the manifest must record 0."""
    table = _mk_table(spark, warehouse, "empt")
    from etl_geo_dem_spark.schemas import CHANGE_SCHEMA

    empty = spark.createDataFrame([], CHANGE_SCHEMA)
    m = apply_changes(
        table, empty, 0,
        expectations={"ts_set": "ts IS NOT NULL"},
        fail_on_violation=True,
    )
    assert m["status"] == "committed"
    assert m["expectations"] == {"ts_set": 0}


def test_sync_from_mirrors_source_column_drop(spark, warehouse):
    """A metadata-only drop in the source emits no CDF rows; sync must still
    drop the column at the replica (else pre-drop ghosts diverge)."""
    src = _mk_table(spark, warehouse, "dsrc")
    dst = _mk_table(spark, warehouse, "ddst")
    ch = generate_changes(spark, 800, n_conv=20, n_epochs=1, evolve_from_epoch=0)
    replay(src, ch)  # table has tool_args
    sync_from(dst, src)
    assert "tool_args" in [f.name for f in dst.schema().fields]

    src.drop_column("tool_args")
    m = sync_from(dst, src)
    # round 4: the drop arrives via the exact DDL replay (commit-ordered),
    # with the sweep as fallback — either way the replica converges
    assert (
        ["drop", "tool_args"] in m.get("schema_ops_replayed", [])
        or m.get("dropped_columns_mirrored") == ["tool_args"]
    )
    assert "tool_args" not in [f.name for f in dst.schema().fields]
    assert dst.snapshot()["dropped_columns"] == ["tool_args"]


def test_expire_tombstones_clears_dropped_columns(spark, warehouse):
    table = _mk_table(spark, warehouse, "exptomb")
    ch = generate_changes(spark, 800, n_conv=20, n_epochs=1, evolve_from_epoch=0)
    replay(table, ch)
    table.drop_column("tool_args")
    assert table.snapshot()["dropped_columns"] == ["tool_args"]
    table.expire_tombstones(below_lsn=2 ** 62)  # full rewrite purges bytes
    assert table.snapshot()["dropped_columns"] == []


def test_suggest_n_buckets_rejects_nonpositive_target(spark, warehouse):
    table = _mk_table(spark, warehouse, "sz2")
    with pytest.raises(ValueError, match="positive"):
        table.suggest_n_buckets(target_bucket_bytes=0)


def test_table_changes_works_with_timestamp_minor_order_key(spark, warehouse):
    """A table whose LAST order col is non-numeric (ts only) must still
    produce a CDF — the +1 stamp bump is numeric-only and must not even be
    constructed for other types."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("lsn", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), False),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(warehouse, "tsorder"), schema,
        n_buckets=2, order_cols=["ts"],
    )
    rows = [
        ("a", 0, "x", datetime.datetime(2024, 1, 1, tzinfo=UTC), 1, False),
        ("b", 0, "y", datetime.datetime(2024, 1, 2, tzinfo=UTC), 2, False),
    ]
    df = spark.createDataFrame(rows, schema).withColumn(
        BUCKET_COL, bucket_expr("conv_id", 2)
    )
    table.commit(table.write_data_files(df), summary={"operation": "merge", "epoch_id": 0})
    v1 = table.current_version()
    rows2 = [("c", 0, "z", datetime.datetime(2024, 1, 3, tzinfo=UTC), 3, False)]
    df2 = spark.createDataFrame(rows2, schema).withColumn(
        BUCKET_COL, bucket_expr("conv_id", 2)
    )
    table.commit(
        table.snapshot()["files"] + table.write_data_files(df2),
        summary={"operation": "merge", "epoch_id": 1},
    )
    feed = table.table_changes(v1).collect()  # no AnalysisException
    assert {r["conv_id"] for r in feed} == {"c"}


def test_run_ingest_stream_mode_end_to_end(spark, warehouse, tmp_path, capsys):
    """The cluster entrypoint's streaming-tail mode: segments drain into the
    table exactly-once; a rerun from the same checkpoint is a no-op."""
    import json as _json

    import run_ingest

    src = tmp_path / "wal"
    ch = generate_changes(spark, 900, n_conv=20, n_epochs=3)
    for e in range(3):
        ch.filter(F.col("epoch") == e).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"seg_{e}")
        )
    argv = [
        "--table", os.path.join(warehouse, "st"),
        "--stream-source", str(src) + "/*",
        "--checkpoint", str(tmp_path / "ckpt"),
        "--n-buckets", "4",
        "--max-files-per-trigger", "1",
    ]
    assert run_ingest.main(argv) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["mode"] == "stream" and out1["final_rows"] > 0
    assert list(out1["stream_watermarks"].values()) == [2]  # 3 micro-batches

    assert run_ingest.main(argv) == 0  # same checkpoint -> metadata no-op
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["snapshot_version"] == out1["snapshot_version"]
    assert out2["final_rows"] == out1["final_rows"]


def test_concurrent_dml_race_does_not_drop_an_operation(spark, warehouse):
    """Two predicate-DML calls racing to the same epoch id: the loser must
    re-derive (fresh epoch AND fresh batch), not be silently SKIPPED by the
    winner's advanced watermark."""
    from etl_geo_dem_spark.plans.merge import update_where

    table = _mk_table(spark, warehouse, "dmlrace")
    ch = generate_changes(spark, 800, n_conv=20, n_epochs=1)
    replay(table, ch)

    real_commit = table.commit
    state = {"interfered": False}

    def racing_commit(*args, **kwargs):
        if not state["interfered"]:
            state["interfered"] = True
            # a concurrent DML wins the race for epoch 0 on the dml stream
            table.commit = real_commit
            update_where(table, F.col("role") == "user", {"tool": F.lit("A")})
            table.commit = racing_commit
        return real_commit(*args, **kwargs)

    table.commit = racing_commit
    try:
        m = update_where(table, F.col("role") == "assistant", {"tool": F.lit("B")})
    finally:
        table.commit = real_commit

    assert m["status"] == "committed"
    # BOTH operations took effect
    a = table.read_public().filter(F.col("role") == "user")
    b = table.read_public().filter(F.col("role") == "assistant")
    if a.count():
        assert a.filter(F.col("tool") != "A").count() == 0
    if b.count():
        assert b.filter(F.col("tool") != "B").count() == 0
    # two distinct dml-stream epochs committed
    assert table.last_stream_epoch("dml") == 1
