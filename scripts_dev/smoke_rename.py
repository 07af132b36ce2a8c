"""Dev smoke: column rename + ghost-safe re-add + sync replay."""
import datetime
import os, sys, shutil, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_geo_dem_spark.session import get_spark
from etl_geo_dem_spark.config import EngineConfig
from etl_geo_dem_spark.plans.lake_table import LakeTable
from etl_geo_dem_spark.plans.merge import apply_changes, sync_from
from etl_geo_dem_spark.schemas import CHANGE_SCHEMA, STATE_SCHEMA
from pyspark.sql import functions as F
from pyspark.sql import types as T

spark = get_spark(master="local[4]", app_name="smoke_rename", shuffle_partitions=4)
cfg = EngineConfig(merge_mode="mor", n_buckets=4)
wh = tempfile.mkdtemp(prefix="smoke_rn_")
ts = datetime.datetime(2026, 1, 1)
try:
    t = LakeTable.create(spark, os.path.join(wh, "t"), STATE_SCHEMA, n_buckets=4)
    sch = T.StructType(list(CHANGE_SCHEMA.fields) + [T.StructField("score", T.DoubleType(), True)])
    rows = [("I", f"c{i}", i, "user", f"t{i}", None, ts, i, 0, float(i)) for i in range(20)]
    apply_changes(t, spark.createDataFrame(rows, sch), 0, cfg)
    # rename score -> quality (metadata only)
    t.rename_column("score", "quality")
    got = t.read_public().orderBy("turn_idx").select("quality").limit(3).collect()
    print("after rename:", [r[0] for r in got], "cols:", [f.name for f in t.schema().fields])
    assert [r[0] for r in got] == [0.0, 1.0, 2.0]
    # new data arrives under the NEW logical name
    sch2 = T.StructType(list(CHANGE_SCHEMA.fields) + [T.StructField("quality", T.DoubleType(), True)])
    rows2 = [("U", f"c{i}", i, "user", f"n{i}", None, ts + datetime.timedelta(hours=1), 100 + i, 1, 50.0 + i) for i in range(5)]
    apply_changes(t, spark.createDataFrame(rows2, sch2), 1, cfg)
    q = {r["turn_idx"]: r["quality"] for r in t.read_public().collect()}
    print("mixed:", q[0], q[10])
    assert q[0] == 50.0 and q[10] == 10.0
    # point lookup still prunes on key
    assert t.point_lookup("c3").count() == 1
    # drop then RE-ADD same logical name with new values: old bytes must not resurrect
    t.drop_column("quality")
    rows3 = [("U", f"c{i}", i, "user", f"z{i}", None, ts + datetime.timedelta(hours=2), 200 + i, 2, 999.0) for i in (0, 1)]
    apply_changes(t, spark.createDataFrame(rows3, sch2), 2, cfg)
    meta = t.snapshot_meta()
    print("mapping:", meta.get("column_mapping"), "tombstones:", meta.get("dropped_columns"))
    vals = {r["turn_idx"]: r["quality"] for r in t.read_public().collect()}
    print("re-add: turn0", vals[0], "turn5(pre-drop)", vals[5])
    assert vals[0] == 999.0
    assert vals[5] is None, f"ghost resurrection! {vals[5]}"
    # full rewrite normalizes mapping + purges ghost bytes
    t.compact()
    meta2 = t.snapshot_meta()
    print("post-compact mapping:", meta2.get("column_mapping"), "tombstones:", meta2.get("dropped_columns"))
    assert meta2.get("column_mapping") == {} and meta2.get("dropped_columns") == []
    vals2 = {r["turn_idx"]: r["quality"] for r in t.read_public().collect()}
    assert vals2[0] == 999.0 and vals2[5] is None
    # sync_from replays the rename
    src = LakeTable.create(spark, os.path.join(wh, "src"), STATE_SCHEMA, n_buckets=4)
    apply_changes(src, spark.createDataFrame(rows, sch), 0, cfg)
    dest = LakeTable.create(spark, os.path.join(wh, "dest"), STATE_SCHEMA, n_buckets=4)
    sync_from(dest, src, cfg)
    assert "score" in [f.name for f in dest.schema().fields]
    src.rename_column("score", "quality")
    m = sync_from(dest, src, cfg)
    print("sync ddl:", m.get("schema_ops_replayed"), "status", m.get("status"))
    cols = [f.name for f in dest.schema().fields]
    assert "quality" in cols and "score" not in cols
    dq = {r["turn_idx"]: r["quality"] for r in dest.read_public().collect()}
    assert dq[7] == 7.0, dq  # replica data SURVIVED the rename (no CDF rows flowed)
    print("SMOKE RENAME OK")
finally:
    shutil.rmtree(wh, ignore_errors=True)
    spark.stop()
