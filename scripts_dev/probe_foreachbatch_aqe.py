"""Isolate the streaming-vs-batch merge_write gap: same 500k-row epoch applied
(a) from a plain batch read, (b) from a plain batch read with AQE off,
(c) inside foreachBatch. If (b) ~= (c) >> (a), the gap is AQE not applying
to micro-batch plans."""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_geo_dem_spark.config import EngineConfig  # noqa: E402
from etl_geo_dem_spark.plans.lake_table import LakeTable  # noqa: E402
from etl_geo_dem_spark.plans.merge import apply_changes  # noqa: E402
from etl_geo_dem_spark.schemas import CHANGE_SCHEMA, STATE_SCHEMA  # noqa: E402
from etl_geo_dem_spark.session import get_spark  # noqa: E402
from etl_geo_dem_spark.sources.changes import generate_changes  # noqa: E402

CFG = EngineConfig(dedup_strategy="agg", merge_mode="mor")

spark = get_spark(app_name="probe_aqe")
src = tempfile.mkdtemp(prefix="aqe_src_")
whroot = tempfile.mkdtemp(prefix="aqe_wh_")
try:
    ch = generate_changes(
        spark, 500_000, n_conv=2500, turns_per_conv=50, n_epochs=1, n_partitions=64
    )
    ch.coalesce(4).write.mode("overwrite").parquet(os.path.join(src, "seg"))

    def timed(tag, fn, runs=3):
        best = min(fn() for _ in range(runs))
        print(f"{tag}: best {best:.3f}s over {runs}")

    def batch_apply(aqe: str):
        def run():
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            t = LakeTable.create(
                spark, os.path.join(whroot, f"t{time.time_ns()}"), STATE_SCHEMA, n_buckets=32
            )
            df = spark.read.schema(CHANGE_SCHEMA).parquet(os.path.join(src, "seg"))
            t0 = time.time()
            apply_changes(t, df, 0, CFG)
            return time.time() - t0
        return run

    timed("batch aqe=on ", batch_apply("true"))
    timed("batch aqe=off", batch_apply("false"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    def stream_run():
        wh = tempfile.mkdtemp(prefix="aqe_s_", dir=whroot)
        t = LakeTable.create(spark, os.path.join(wh, "t"), STATE_SCHEMA, n_buckets=32)
        durations = []

        def sink(bdf, bid):
            t0 = time.time()
            apply_changes(t, bdf, bid, CFG)
            durations.append(time.time() - t0)

        q = (
            spark.readStream.schema(CHANGE_SCHEMA)
            .parquet(src + "/*")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(wh, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return min(durations)

    timed("foreachBatch  ", stream_run)
finally:
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(whroot, ignore_errors=True)
