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
    """Paths already ingested, from the table's epoch manifests (both the
    single-file ``source_path`` and the grouped ``source_paths`` records)."""
    done = set()
    for m in table.read_epoch_manifests():
        if m.get("status") != "committed":
            continue
        src = m.get("source_path")
        if src:
            done.add(src)
        for p in m.get("source_paths") or []:
            done.add(p)
    return done


def unapplied_paths(table: LakeTable, manifest_path: str) -> list[str]:
    """The restart anti-join: manifest entries minus already-applied paths,
    in manifest order (deterministic schedule — reference sorts its work list,
    `pipeline_transform_vrt_gdal.py:211,406`)."""
    done = applied_paths(table)
    return [p for p in read_manifest(manifest_path) if p not in done]


def load_change_file(
    spark: SparkSession, path: str, schema: T.StructType, paths: list[str] | None = None
) -> DataFrame:
    """One manifest entry (or a same-format group via ``paths``) → a change
    batch (format by extension). A multi-path read opens every file in
    parallel — one task per file split."""
    targets = paths or [path]
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ""):
        return spark.read.schema(schema).parquet(*targets)
    if ext == ".json":
        return spark.read.schema(schema).json(targets if paths else path)
    if ext == ".csv":
        return spark.read.schema(schema).option("header", "true").csv(
            targets if paths else path
        )
    raise ValueError(f"unsupported change-file format: {path}")


def ingest_manifest(
    spark: SparkSession,
    table: LakeTable,
    manifest_path: str,
    schema: T.StructType,
    cfg=None,
    files_per_epoch: int = 1,
) -> list[dict]:
    """Apply unapplied manifest entries, ``files_per_epoch`` at a time (epoch
    id continues from the committed watermark).

    ``files_per_epoch > 1`` is the parallel partitioned fetch (SURVEY §2.1 S5,
    the reference's ``Pool(5)`` tile downloads): one Spark read opens every
    file of the group concurrently — one task per file split — and the group
    commits as ONE epoch, so restart granularity is the group. Each epoch
    manifest records ALL of its source paths atomically with the commit (a
    re-write after the commit would leave a crash window in which the epoch is
    committed but invisible to ``applied_paths``, double-counting lineage on
    restart); ``source_path`` stays for the single-file case."""
    from etl_geo_dem_spark.config import EngineConfig
    from etl_geo_dem_spark.plans.merge import apply_changes

    cfg = cfg or EngineConfig()
    out = []
    next_epoch = table.last_epoch() + 1
    todo = unapplied_paths(table, manifest_path)
    for i in range(0, len(todo), max(1, files_per_epoch)):
        group = todo[i : i + max(1, files_per_epoch)]
        if len(group) == 1:
            batch = load_change_file(spark, group[0], schema)
            extra = {"source_path": group[0], "source_paths": group}
        else:
            exts = {os.path.splitext(p)[1].lower() for p in group}
            if len(exts) > 1:  # mixed formats: per-file readers unioned
                batch = load_change_file(spark, group[0], schema)
                for p in group[1:]:
                    batch = batch.unionByName(load_change_file(spark, p, schema))
            else:  # one reader, all paths — parallel fetch, one task per split
                batch = load_change_file(spark, group[0], schema, paths=group)
            extra = {"source_paths": group}
        m = apply_changes(table, batch, next_epoch, cfg, extra_manifest=extra)
        if m.get("status") == "committed":
            next_epoch += 1
        out.append(m)
    return out
