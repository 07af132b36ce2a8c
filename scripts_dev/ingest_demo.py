"""User-style demo driver (referenced by .claude/skills/verify): replay a
synthetic change stream into a transcript lake table, with an optional
simulated crash. Usage: python ingest_demo.py <warehouse> <stop_after_epoch|-1>
"""

import sys

from etl_geo_dem_spark.plans.lake_table import LakeTable
from etl_geo_dem_spark.plans.merge import apply_changes
from etl_geo_dem_spark.schemas import STATE_SCHEMA
from etl_geo_dem_spark.session import get_spark
from etl_geo_dem_spark.sources.changes import epoch_batches, generate_changes

wh, stop_after = sys.argv[1], int(sys.argv[2])
spark = get_spark(master="local[4]", shuffle_partitions=8)
path = wh + "/transcripts"
table = (
    LakeTable.load(spark, path)
    if LakeTable(spark, path).exists()
    else LakeTable.create(spark, path, STATE_SCHEMA, n_buckets=8)
)
ch = generate_changes(spark, 3000, n_conv=80, n_epochs=6, evolve_from_epoch=4)
for e, b in epoch_batches(ch, evolve_from_epoch=4):
    m = apply_changes(table, b, e)
    print(f"epoch {e}: {m['status']}", flush=True)
    if stop_after >= 0 and e >= stop_after:
        print("SIMULATED CRASH — exiting without further commits", flush=True)
        sys.exit(0)
print("final rows:", table.read_public().count())
print("last epoch:", table.last_epoch())
