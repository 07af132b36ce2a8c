"""Manifest-driven batch source with restart semantics.

Reference analogs: the URL-manifest download driver (`get_url_from_file`,
`pipeline_download_USGS_DEM.py:5-60`, S4), idempotent skip-existing ingest
(`download_data(..., skip_existing_files=True)`,
`pipeline_download_utils_soils.py:53-84`, S2), and the restart anti-join of
work list vs produced outputs (`pipeline_flows.py:210-221`, J13/T2).

Here: a text manifest lists change-file paths (one per line, '#' comments);
`unapplied_paths` anti-joins it against the paths already recorded in the
table's epoch manifests, so a restarted loader downloads/applies only new work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_geo_dem_spark.plans.lake_table import LakeTable


def read_manifest(path: str) -> list[str]:
    """Parse the manifest file → ordered list of data paths."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


def applied_paths(table: LakeTable) -> set[str]:
    """Paths already ingested, from the table's epoch manifests."""
    done = set()
    for m in table.read_epoch_manifests():
        src = m.get("source_path")
        if src and m.get("status") == "committed":
            done.add(src)
    return done


def unapplied_paths(table: LakeTable, manifest_path: str) -> list[str]:
    """The restart anti-join: manifest entries minus already-applied paths,
    in manifest order (deterministic schedule — reference sorts its work list,
    `pipeline_transform_vrt_gdal.py:211,406`)."""
    done = applied_paths(table)
    return [p for p in read_manifest(manifest_path) if p not in done]


def load_change_file(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """One manifest entry → a change batch (format by extension)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ""):
        return spark.read.schema(schema).parquet(path)
    if ext == ".json":
        return spark.read.schema(schema).json(path)
    if ext == ".csv":
        return spark.read.schema(schema).option("header", "true").csv(path)
    raise ValueError(f"unsupported change-file format: {path}")


def ingest_manifest(
    spark: SparkSession,
    table: LakeTable,
    manifest_path: str,
    schema: T.StructType,
    cfg=None,
) -> list[dict]:
    """Apply every unapplied manifest entry as one epoch each (epoch id
    continues from the committed watermark). Each epoch manifest records the
    source path — that record IS the applied-set for the next restart, so it is
    passed through ``extra_manifest`` and lands in the epoch manifest's FIRST
    write, atomically with the commit (a re-write after the commit would leave
    a crash window in which the epoch is committed but invisible to
    ``applied_paths``, double-counting lineage on restart)."""
    from etl_geo_dem_spark.config import EngineConfig
    from etl_geo_dem_spark.plans.merge import apply_changes

    cfg = cfg or EngineConfig()
    out = []
    next_epoch = table.last_epoch() + 1
    for p in unapplied_paths(table, manifest_path):
        batch = load_change_file(spark, p, schema)
        m = apply_changes(table, batch, next_epoch, cfg, extra_manifest={"source_path": p})
        if m.get("status") == "committed":
            next_epoch += 1
        out.append(m)
    return out
