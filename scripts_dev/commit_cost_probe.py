"""Commit-metadata cost probe — evidence for the manifest-list tier.

Replays many small MOR epochs into a table with a high bucket count and
reports the per-epoch `commit_and_manifest` phase time and the current
snapshot's JSON size as files accumulate. Under the pre-round-4 format the
snapshot re-serialized EVERY file descriptor each epoch (O(total files),
growing per epoch); under the manifest-list tier the cost is O(touched
buckets) and flat.

    python scripts_dev/commit_cost_probe.py [n_buckets] [epochs] [events_per_epoch]
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_geo_dem_spark.config import EngineConfig  # noqa: E402
from etl_geo_dem_spark.plans.lake_table import LakeTable  # noqa: E402
from etl_geo_dem_spark.plans.merge import apply_changes  # noqa: E402
from etl_geo_dem_spark.schemas import STATE_SCHEMA  # noqa: E402
from etl_geo_dem_spark.session import get_spark  # noqa: E402
from etl_geo_dem_spark.sources.changes import generate_changes  # noqa: E402


def main():
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    per_epoch = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    spark = get_spark(master="local[8]", app_name="commit_cost", shuffle_partitions=16)
    wh = tempfile.mkdtemp(prefix="commit_cost_")
    try:
        t = LakeTable.create(spark, os.path.join(wh, "t"), STATE_SCHEMA, n_buckets=n_buckets)
        cfg = EngineConfig(merge_mode="mor", n_buckets=n_buckets, max_deltas_per_bucket=0)
        from pyspark.sql import functions as F

        rows = []
        for e in range(epochs):
            ch = generate_changes(
                spark, per_epoch, n_conv=per_epoch // 10, turns_per_conv=10,
                n_epochs=1, n_partitions=16,
            ).withColumn("epoch", F.lit(e).cast("long"))
            m = apply_changes(t, ch, e, cfg)
            meta = t.snapshot_meta()
            rows.append({
                "epoch": e,
                "total_files": sum(r["n_files"] for r in meta["manifests"]),
                "snapshot_bytes": os.path.getsize(t._snap_path(meta["version"])),
                "commit_and_manifest_sec": m["phase_sec"]["commit_and_manifest"],
            })
        out = {
            "n_buckets": n_buckets,
            "epochs": epochs,
            "events_per_epoch": per_epoch,
            "first5": rows[:5],
            "last5": rows[-5:],
            "commit_sec_first5_avg": round(
                sum(r["commit_and_manifest_sec"] for r in rows[:5]) / 5, 3),
            "commit_sec_last5_avg": round(
                sum(r["commit_and_manifest_sec"] for r in rows[-5:]) / 5, 3),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
