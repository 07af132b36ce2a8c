"""Failure-path robustness: corrupted metadata and missing data files fail
loudly and never corrupt committed state."""

import glob
import json
import os

import pytest

from etl_geo_dem_spark.plans.lake_table import LakeTable
from etl_geo_dem_spark.plans.merge import apply_changes, replay
from etl_geo_dem_spark.schemas import STATE_SCHEMA
from etl_geo_dem_spark.sources.changes import generate_changes


def _loaded(spark, warehouse):
    table = LakeTable.create(spark, os.path.join(warehouse, "r"), STATE_SCHEMA, n_buckets=4)
    ch = generate_changes(spark, 600, n_conv=20, n_epochs=2)
    replay(table, ch)
    return table


def test_time_travel_survives_corrupt_latest_snapshot(spark, warehouse):
    """A torn write of a NEW snapshot (crash mid-commit before the pointer
    swap) must leave the committed version fully readable."""
    table = _loaded(spark, warehouse)
    v = table.current_version()
    rows = table.read_public().count()
    # torn write: next snapshot file exists but is garbage; pointer NOT swapped
    with open(table._snap_path(v + 1), "w") as f:
        f.write("{corrupt")
    t2 = LakeTable.load(spark, table.path)
    assert t2.current_version() == v
    assert t2.read_public().count() == rows
    # and the next committer refuses to reuse the damaged version slot
    from etl_geo_dem_spark.plans.lake_table import CommitConflict

    with pytest.raises(CommitConflict):
        t2.commit([], summary={"operation": "noop", "epoch_id": 99})


def test_missing_data_file_fails_loudly(spark, warehouse):
    table = _loaded(spark, warehouse)
    victim = table.snapshot()["files"][0]["path"]
    os.remove(victim)
    with pytest.raises(Exception):
        table.read_public().count()


def test_vacuum_never_touches_current_snapshot_files(spark, warehouse):
    table = _loaded(spark, warehouse)
    table.compact()
    table.vacuum(keep_versions=1)
    live = {f["path"] for f in table.snapshot()["files"]}
    on_disk = set(glob.glob(os.path.join(table.path, "data", "*", "_bucket=*", "*.parquet")))
    assert live <= on_disk
    assert table.read_public().count() > 0


def test_epoch_manifest_json_is_valid(spark, warehouse):
    table = _loaded(spark, warehouse)
    for p in glob.glob(os.path.join(table.manifest_dir, "epoch_*.json")):
        with open(p) as f:
            m = json.load(f)
        assert {"epoch_id", "lineage", "phase_sec", "merge_mode"} <= set(m)
