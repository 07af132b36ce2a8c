"""Resident replay worker for the paired scaling ladder (multijvm_paired.py).

Builds one Spark session at the given master, runs the standard untimed
warmups, then performs exactly one timed CDC replay per "go" line on stdin,
printing a JSON result line per replay. Staying resident keeps the JVM
JIT-warm across the whole ladder, so every timed run is steady-state and the
only thing that varies between paired runs is host load — which the pairing
is designed to cancel.

    python scripts_dev/scaling_worker.py 'local-cluster[1,2,8192]' 10000000 2
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root harness: _warmup/_one_replay)
from etl_geo_dem_spark.session import get_spark  # noqa: E402


def main():
    master = sys.argv[1]
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    extra = {}
    cpus = 8
    if master.startswith("local-cluster"):
        spec = master.split("[")[-1].rstrip("]").split(",")
        extra["spark.executor.memory"] = f"{spec[2]}m"
        cpus = int(spec[0]) * int(spec[1])
    spark = get_spark(
        master=master,
        app_name=f"scaling_worker_{cpus}",
        shuffle_partitions=cpus,
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        extra_conf=extra,
    )
    bench._warmup(spark, n_events, n_epochs)
    print(json.dumps({"ready": True, "master": master, "cores": cpus}), flush=True)

    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        if cmd != "go":
            continue
        r = bench._one_replay(spark, n_events, n_epochs)
        # release shuffle files between runs (ContextCleaner is GC-driven)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        print(json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
