"""spark-submit entrypoint: lake-table maintenance & operations CLI.

The operational counterpart of ``run_ingest.py`` — everything a table owner
runs OUT-OF-BAND of the ingest job, each subcommand a thin shell over one
engine method (so behavior is exactly the library's, and the library stays
the single source of truth). All writers take the engine's optimistic
concurrency retries, so maintenance can run concurrently with ingest.

    spark-submit --py-files engine.zip run_maintenance.py <cmd> --table T [...]

Subcommands:
    history                     snapshot log (version, op, epoch, files, rows)
    metrics                     one-call metadata health summary (skew, deltas,
                                watermarks, metadata-tier sizes)
    files                       file inventory incl. per-file min/max stats
    plan                        metadata-only compaction plan (worst-first)
    compact [--buckets ...]     fold deltas / small files (all or planned set)
            [--cluster-by ...]  re-cluster rolled files (e.g. ts) for range pruning
    vacuum [--keep N]           reclaim files outside the retention window
    expire-snapshots [--keep N] expire snapshot/manifest METADATA past the
                                window (vacuums first; tagged versions kept)
    expire-tombstones --below-lsn L
    rebucket --n N              bucket-count evolution (atomic spec change)
    rename --old A --new B      metadata-only column rename (name mapping)
    rollback --version V        re-point the table at snapshot V
    tag --name NAME [--version V] / untag --name NAME / tags
    sync --from SRC             incremental CDF replication SRC -> --table
    export --dest DIR           plain-parquet interop extract
    changes --from-version V1 [--to-version V2]   print CDF row counts by type

Reference analog: the out-of-band COG rebuild / dump-restore / index steps
(`model_pipeline.py:403-420`, `pipeline_load_localPG.py`) that the reference
runs as ad-hoc scripts — here one audited CLI over atomic snapshot commits.
"""

from __future__ import annotations

import argparse
import json
import sys

from etl_geo_dem_spark.plans.lake_table import LakeTable
from etl_geo_dem_spark.session import get_spark


def _emit(obj) -> None:
    print(json.dumps(obj, default=str))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="run_maintenance")
    p.add_argument("cmd", choices=[
        "history", "metrics", "files", "plan", "compact", "vacuum", "expire-snapshots",
        "expire-tombstones", "rebucket", "rename", "rollback", "tag", "untag",
        "tags", "sync", "export", "changes", "delete-where", "update-where",
    ])
    p.add_argument("--table", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--buckets", type=int, nargs="*", default=None)
    p.add_argument("--cluster-by", nargs="*", default=None)
    p.add_argument("--keep", type=int, default=2)
    p.add_argument("--below-lsn", type=int)
    p.add_argument("--n", type=int)
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--name")
    p.add_argument("--from", dest="src")
    p.add_argument("--dest")
    p.add_argument("--from-version", type=int)
    p.add_argument("--to-version", type=int, default=None)
    p.add_argument("--min-files", type=int, default=4)
    p.add_argument("--max-buckets", type=int, default=None)
    p.add_argument("--old", help="current column name for rename")
    p.add_argument("--new", dest="newname", help="new column name for rename")
    p.add_argument("--where", help="SQL predicate for delete-where/update-where")
    p.add_argument("--set", dest="assignments", nargs="*", default=None,
                   metavar="COL=SQL_EXPR", help="assignments for update-where")
    a = p.parse_args(argv)

    spark = get_spark(master=a.master, app_name=f"maintenance_{a.cmd}")
    t = LakeTable.load(spark, a.table)

    if a.cmd == "history":
        for s in t.history():
            _emit({
                "version": s["version"], "operation": s["summary"].get("operation"),
                "epoch_id": s["summary"].get("epoch_id"), "n_files": len(s["files"]),
                "rows": sum(f["rows"] for f in s["files"]),
            })
    elif a.cmd == "metrics":
        _emit(t.table_metrics())
    elif a.cmd == "files":
        for f in t.snapshot(a.version)["files"]:
            _emit(f)
    elif a.cmd == "plan":
        _emit({"compact_buckets": t.plan_compaction(
            min_files=a.min_files, max_buckets=a.max_buckets)})
    elif a.cmd == "compact":
        if a.buckets:
            if a.cluster_by:
                p.error("--cluster-by applies to full compaction only "
                        "(per-bucket compact_buckets keeps the key sort)")
            v = t.compact_buckets(a.buckets)
        else:
            v = t.compact(cluster_by=a.cluster_by)
        _emit({"committed_version": v})
    elif a.cmd == "vacuum":
        removed = t.vacuum(keep_versions=a.keep)
        _emit({"removed_files": len(removed)})
    elif a.cmd == "expire-snapshots":
        _emit(t.expire_snapshots(keep_versions=a.keep))
    elif a.cmd == "expire-tombstones":
        if a.below_lsn is None:
            p.error("--below-lsn required")
        _emit({"committed_version": t.expire_tombstones(a.below_lsn)})
    elif a.cmd == "rebucket":
        if not a.n:
            p.error("--n required")
        _emit({"committed_version": t.rebucket(a.n)})
    elif a.cmd == "rename":
        if not a.old or not a.newname:
            p.error("--old and --new required")
        _emit({"committed_version": t.rename_column(a.old, a.newname)})
    elif a.cmd == "rollback":
        if a.version is None:
            p.error("--version required")
        _emit({"committed_version": t.rollback(a.version)})
    elif a.cmd == "tag":
        if not a.name:
            p.error("--name required")
        _emit({"tag": a.name, "version": t.create_tag(a.name, a.version)})
    elif a.cmd == "untag":
        if not a.name:
            p.error("--name required")
        t.delete_tag(a.name)
        _emit({"deleted": a.name})
    elif a.cmd == "tags":
        _emit(t.tags())
    elif a.cmd == "sync":
        if not a.src:
            p.error("--from required")
        from etl_geo_dem_spark.plans.merge import sync_from

        src = LakeTable.load(spark, a.src)
        _emit(sync_from(t, src))
    elif a.cmd == "export":
        if not a.dest:
            p.error("--dest required")
        _emit(t.export_parquet(a.dest, version=a.version))
    elif a.cmd == "delete-where":
        if not a.where:
            p.error("--where required")
        from pyspark.sql import functions as F

        from etl_geo_dem_spark.plans.merge import delete_where

        _emit(delete_where(t, F.expr(a.where)))
    elif a.cmd == "update-where":
        if not a.where or not a.assignments:
            p.error("--where and --set required")
        from pyspark.sql import functions as F

        from etl_geo_dem_spark.plans.merge import update_where

        sets = {}
        for kv in a.assignments:
            col, _, expr = kv.partition("=")
            if not expr:
                p.error(f"bad --set entry {kv!r} (want COL=SQL_EXPR)")
            sets[col.strip()] = F.expr(expr)
        _emit(update_where(t, F.expr(a.where), sets))
    elif a.cmd == "changes":
        if a.from_version is None:
            p.error("--from-version required")
        from pyspark.sql import functions as F

        feed = t.table_changes(a.from_version, a.to_version)
        for r in feed.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect():
            _emit({"change_type": r["_change_type"], "rows": r["n"]})
    return 0


if __name__ == "__main__":
    sys.exit(main())
