"""Dev smoke: round-4 metadata tier — sidecars, roll-forward, expire, pruned DML."""
import os, sys, json, glob, shutil, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_geo_dem_spark.session import get_spark
from etl_geo_dem_spark.config import EngineConfig
from etl_geo_dem_spark.plans.lake_table import LakeTable
from etl_geo_dem_spark.plans.merge import apply_changes, delete_where, _extract_key_values
from etl_geo_dem_spark.schemas import STATE_SCHEMA
from etl_geo_dem_spark.sources.changes import generate_changes
from pyspark.sql import functions as F

spark = get_spark(master="local[4]", app_name="smoke_r4", shuffle_partitions=4)
wh = tempfile.mkdtemp(prefix="smoke_r4_")
try:
    t = LakeTable.create(spark, os.path.join(wh, "t"), STATE_SCHEMA, n_buckets=8)
    ch = generate_changes(spark, 20_000, n_conv=200, turns_per_conv=10, n_epochs=3, n_partitions=8)
    for e in range(3):
        m = apply_changes(t, ch.filter(F.col("epoch") == e), e, EngineConfig(merge_mode="mor", n_buckets=8))
        print("epoch", e, m["status"], "v", m.get("snapshot_version"))
    n1 = t.read_public().count()
    print("rows:", n1)
    meta = t.snapshot_meta()
    print("manifests:", len(meta["manifests"]), "snapshot json bytes:",
          os.path.getsize(t._snap_path(meta["version"])))
    # compat: snapshot()['files']
    print("files:", len(t.snapshot()["files"]))
    # extraction
    kv = t.read_public().select("conv_id").first()[0]
    print("extract eq:", _extract_key_values(t, F.col("conv_id") == kv))
    print("extract isin:", _extract_key_values(t, F.col("conv_id").isin(kv, "zzz")))
    print("extract and:", _extract_key_values(t, (F.col("conv_id") == kv) & (F.col("turn_idx") < 5)))
    print("extract or:", _extract_key_values(t, (F.col("conv_id") == kv) | (F.col("conv_id") == "zz")))
    print("extract str:", _extract_key_values(t, f"conv_id = '{kv}'"))
    print("extract nonkey:", _extract_key_values(t, F.col("turn_idx") == 3))
    # pruned delete
    before = t.read_public().filter(F.col("conv_id") == kv).count()
    dm = delete_where(t, F.col("conv_id") == kv, EngineConfig(merge_mode="mor", n_buckets=8))
    after = t.read_public().filter(F.col("conv_id") == kv).count()
    print("delete:", before, "->", after, "status", dm["status"])
    # compact + time travel
    v_pre = t.current_version()
    t.compact()
    print("compacted, rows:", t.read_public().count(), "== expect", n1 - before)
    # expire
    res = t.expire_snapshots(keep_versions=2)
    print("expired:", res["snapshots_removed"], "filelists:", res["filelists_removed"],
          "manifests:", res["epoch_manifests_removed"])
    print("history len:", len(t.history()))
    # torn snapshot recovery: plant a truncated v{N+1}
    cur = t.current_version()
    with open(t._snap_path(cur + 1), "w") as f:
        f.write('{"version": ' + str(cur + 1))  # torn
    m = apply_changes(t, ch.filter(F.col("epoch") == 0).withColumn("epoch", F.lit(99).cast("long")),
                      99, EngineConfig(merge_mode="mor", n_buckets=8))
    print("commit after torn:", m["status"], "v", m["snapshot_version"])
    assert m["status"] == "committed"
    # crash-between-link-and-pointer: simulate by writing pointer backwards
    t2 = LakeTable(spark, t.path)
    real = t2.current_version()
    t2._write_pointer(real - 1)
    print("rolled forward to:", LakeTable(spark, t.path).current_version(), "== expect", real)
    print("SMOKE OK")
finally:
    shutil.rmtree(wh, ignore_errors=True)
    spark.stop()
