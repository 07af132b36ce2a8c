"""Per-epoch phase timing probe under any master — localizes replay cost.

    python scripts_dev/phase_probe.py 'local-cluster[4,2,8192]' 10000000 2 3
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_geo_dem_spark.config import EngineConfig  # noqa: E402
from etl_geo_dem_spark.plans.lake_table import LakeTable  # noqa: E402
from etl_geo_dem_spark.plans.merge import apply_changes  # noqa: E402
from etl_geo_dem_spark.schemas import STATE_SCHEMA  # noqa: E402
from etl_geo_dem_spark.session import get_spark  # noqa: E402
from etl_geo_dem_spark.sources.changes import generate_changes  # noqa: E402


def main():
    master = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[4,2,8192]"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    extra = {}
    cpus = 8
    if master.startswith("local-cluster"):
        spec = master.split("[")[-1].rstrip("]").split(",")
        extra["spark.executor.memory"] = f"{spec[2]}m"
        cpus = int(spec[0]) * int(spec[1])
    spark = get_spark(master=master, app_name="phase_probe",
                      shuffle_partitions=cpus, driver_memory="24g", extra_conf=extra)
    from pyspark.sql import functions as F

    for rep in range(reps):
        wh = tempfile.mkdtemp(prefix="phase_probe_")
        try:
            t = LakeTable.create(spark, os.path.join(wh, "t"), STATE_SCHEMA, n_buckets=32)
            ch = generate_changes(spark, n_events, n_conv=max(1000, n_events // 200),
                                  turns_per_conv=50, n_epochs=n_epochs,
                                  evolve_from_epoch=max(1, n_epochs - 1), n_partitions=64)
            t0 = time.time()
            phases = []
            for e in range(n_epochs):
                b = ch.filter(F.col("epoch") == e)
                if e < max(1, n_epochs - 1) and "tool_args" in b.columns:
                    b = b.drop("tool_args")
                m = apply_changes(t, b, e, EngineConfig(dedup_strategy="agg", merge_mode="mor"))
                phases.append({"epoch": e, **m["phase_sec"], "dur": m["duration_sec"]})
            wall = time.time() - t0
            print(json.dumps({"rep": rep, "wall": round(wall, 2),
                              "ev_per_sec": round(n_events * 1.05 / wall / 1000) * 1000,
                              "phases": phases}), flush=True)
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
