"""Hot-key skew microbench (reproduces BENCH/SKEW.md).

One (conv_id, turn_idx) key carries the bulk of all events — the worst case
the BASELINE's salting requirement targets. Times all three LWW strategies on
the same cached input and asserts they return identical winners.

    python scripts_dev/skew_bench.py [hot_rows] [cold_rows] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_geo_dem_spark.operators.lww import lww_winners  # noqa: E402
from etl_geo_dem_spark.session import get_spark  # noqa: E402
from etl_geo_dem_spark.sources.changes import generate_changes  # noqa: E402


def main():
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cold = int(sys.argv[2]) if len(sys.argv) > 2 else 2_500_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark(master="local[8]", app_name="skew_bench", shuffle_partitions=8)
    base = generate_changes(spark, cold, n_conv=2_000, n_epochs=1, evolve_from_epoch=None)
    hot_df = (
        spark.range(hot)
        .select(
            F.lit("U").alias("op"),
            F.lit("conv_hot").alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.format_string("h%d", "id").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("id") % 86400)).alias("ts"),
            (F.col("id") + 10_000_000).alias("lsn"),
            F.lit(0).cast("long").alias("epoch"),
        )
    )
    df = base.unionByName(hot_df).persist()
    total = df.count()  # materialize the cache

    results, winners_counts = {}, {}
    for strategy in ("window", "salted_window", "agg"):
        kw = {"hot_keys": ["conv_hot"]} if strategy == "salted_window" else {}
        best = None
        for _ in range(repeats):
            t0 = time.time()
            n = lww_winners(df, strategy=strategy, **kw).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[strategy] = round(best, 2)
        winners_counts[strategy] = n
    assert len(set(winners_counts.values())) == 1, winners_counts
    print(json.dumps({
        "hot_rows": hot, "total_rows": total, "winners": winners_counts["agg"],
        "best_sec": results, "repeats": repeats,
    }))


if __name__ == "__main__":
    main()
