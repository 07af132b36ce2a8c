"""Profile one streaming drain: per-trigger durationMs breakdown from the
StreamingQuery progress events + per-epoch phase_sec from the engine's own
manifests — directive r4 #6 (find the fixed per-micro-batch cost)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_geo_dem_spark.config import EngineConfig  # noqa: E402
from etl_geo_dem_spark.plans.lake_table import LakeTable  # noqa: E402
from etl_geo_dem_spark.schemas import CHANGE_SCHEMA, STATE_SCHEMA  # noqa: E402
from etl_geo_dem_spark.session import get_spark  # noqa: E402
from etl_geo_dem_spark.sources.changes import generate_changes  # noqa: E402
from etl_geo_dem_spark.streaming.ingest import start_cdc_ingest  # noqa: E402


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mfpt = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark(app_name="streaming_phase_probe")
    src = tempfile.mkdtemp(prefix="sprobe_src_")
    wh = tempfile.mkdtemp(prefix="sprobe_wh_")
    try:
        ch = generate_changes(
            spark, n_events, n_conv=max(1000, n_events // 200), turns_per_conv=50,
            n_epochs=n_files, evolve_from_epoch=None, n_partitions=64,
        )
        for e in range(n_files):
            ch.filter(F.col("epoch") == e).coalesce(4).write.mode("overwrite").parquet(
                os.path.join(src, f"seg_{e:04d}")
            )
        table = LakeTable.create(spark, os.path.join(wh, "t"), STATE_SCHEMA, n_buckets=32)
        t0 = time.time()
        q = start_cdc_ingest(
            spark, table, src + "/*", CHANGE_SCHEMA, os.path.join(wh, "ckpt"),
            EngineConfig(dedup_strategy="agg", merge_mode="mor"),
            max_files_per_trigger=mfpt, available_now=True,
        )
        q.awaitTermination()
        wall = time.time() - t0
        print(f"\nwall={wall:.2f}s  ev/s={n_events/wall:,.0f}")
        print("\n--- per-trigger durationMs (Spark progress) ---")
        for p in q.recentProgress:
            d = p.get("durationMs", {})
            print(
                f"batch {p.get('batchId')}: rows={p.get('numInputRows'):>9,} "
                f"total={d.get('triggerExecution'):>6} addBatch={d.get('addBatch'):>6} "
                f"latestOffset={d.get('latestOffset'):>5} getBatch={d.get('getBatch'):>4} "
                f"walCommit={d.get('walCommit'):>4} commitOffsets={d.get('commitOffsets'):>4} "
                f"queryPlanning={d.get('queryPlanning'):>4}"
            )
        print("\n--- per-epoch engine phase_sec (epoch manifests) ---")
        for m in table.read_epoch_manifests():
            print(
                f"epoch {m['epoch_id']}: in={m.get('input_events'):>9} "
                f"phases={json.dumps(m.get('phase_sec'))} total={m.get('duration_sec')}"
            )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
