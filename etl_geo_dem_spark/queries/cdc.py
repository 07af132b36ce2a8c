"""CDC-shaped queries over the driver's ``events`` stream table.

The ``events`` table plays the change stream: ``user_id`` ≙ conv_id (partition
key), ``event_id`` ≙ lsn (monotone), ``ts`` ≙ event time, ``event_type='error'``
≙ tombstone. Each query exercises one CDC-engine operator from SURVEY.md §2
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_geo_dem_spark.operators.lww import (
    lww_winners_agg,
    lww_winners_salted_window,
    lww_winners_window,
)
from etl_geo_dem_spark.queries.registry import register, t

_LWW_ORACLE = """
SELECT user_id, event_id AS last_lsn, event_type AS last_type,
       value AS last_value, ts AS last_ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""

_LWW_SELECT = lambda df: df.select(  # noqa: E731
    "user_id",
    F.col("event_id").alias("last_lsn"),
    F.col("event_type").alias("last_type"),
    F.col("value").alias("last_value"),
    F.col("ts").alias("last_ts"),
)


@register("cdc_lww_latest_window", oracle=_LWW_ORACLE, tags=("cdc", "window", "W1"))
def cdc_lww_latest_window(spark, sf_dir):
    """LWW winner per key via window rank (SURVEY §2.5 W1, window strategy)."""
    ev = t(spark, sf_dir, "events")
    return _LWW_SELECT(lww_winners_window(ev, ["user_id"], ["ts", "event_id"]))


@register("zz_cdc_lww_latest_agg", oracle=_LWW_ORACLE, tags=("cdc", "agg", "W1"))
def cdc_lww_latest_agg(spark, sf_dir):
    """Same winners via skew-free max-of-struct aggregation (map-side combine)."""
    ev = t(spark, sf_dir, "events")
    return _LWW_SELECT(lww_winners_agg(ev, ["user_id"], ["ts", "event_id"]))


@register("zz_cdc_lww_latest_salted", oracle=_LWW_ORACLE, tags=("cdc", "skew", "W1"))
def cdc_lww_latest_salted(spark, sf_dir):
    """Same winners via the two-stage salted window (hot-key path)."""
    ev = t(spark, sf_dir, "events")
    return _LWW_SELECT(
        lww_winners_salted_window(ev, ["user_id"], ["ts", "event_id"], salt_buckets=8)
    )


@register(
    "cdc_lww_composite_key",
    oracle="""
SELECT user_id, event_type, event_id AS last_lsn, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
""",
    tags=("cdc", "window"),
)
def cdc_lww_composite_key(spark, sf_dir):
    """LWW on a composite key — the engine's (conv_id, turn_idx) shape."""
    ev = t(spark, sf_dir, "events")
    win = lww_winners_agg(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return win.select(
        "user_id", "event_type", F.col("event_id").alias("last_lsn"), F.col("value").alias("last_value")
    )


@register(
    "zz_cdc_tombstone_final_state",
    oracle="""
SELECT user_id, event_id AS last_lsn
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
   AND event_type <> 'error'
""",
    tags=("cdc", "delete"),
)
def cdc_tombstone_final_state(spark, sf_dir):
    """Keys whose LWW winner is a tombstone drop out of the final state
    (op='D' semantics, SURVEY §2.3 J5 WHEN MATCHED DELETE)."""
    ev = t(spark, sf_dir, "events")
    win = lww_winners_agg(ev, ["user_id"], ["ts", "event_id"])
    return win.filter(F.col("event_type") != "error").select(
        "user_id", F.col("event_id").alias("last_lsn")
    )


@register(
    "cdc_unapplied_anti_join",
    oracle="""
SELECT e.user_id, e.event_type, count(*) AS n_events
FROM events e
WHERE e.event_id >= 100
  AND NOT EXISTS (
    SELECT 1 FROM events a
    WHERE a.event_id < 100
      AND a.user_id = e.user_id AND a.event_type = e.event_type
  )
GROUP BY e.user_id, e.event_type
""",
    tags=("cdc", "anti_join", "J13"),
)
def cdc_unapplied_anti_join(spark, sf_dir):
    """Anti join of this epoch's keys vs the applied manifest — keys first seen
    now (the reference's restart filter, `pipeline_flows.py:210-221`, SURVEY
    §2.3 J13)."""
    ev = t(spark, sf_dir, "events")
    applied = (
        ev.filter(F.col("event_id") < 100).select("user_id", "event_type").distinct()
    )
    return (
        ev.filter(F.col("event_id") >= 100)
        .join(applied, ["user_id", "event_type"], "left_anti")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "cdc_epoch_lineage_metrics",
    oracle="""
SELECT event_id // 500 AS epoch,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_keys,
       sum(length(props))::BIGINT AS payload_chars,
       min(event_id) AS min_lsn,
       max(event_id) AS max_lsn
FROM events GROUP BY 1
""",
    tags=("cdc", "metrics", "A8", "T6"),
)
def cdc_epoch_lineage_metrics(spark, sf_dir):
    """Per-epoch row/byte lineage metrics (BASELINE requirement; reference
    analog: per-call logging decorator, `model_pipeline.py:37-73`)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("epoch", (F.col("event_id") / 500).cast("long"))
        .groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_keys"),
            F.sum(F.length("props")).alias("payload_chars"),
            F.min("event_id").alias("min_lsn"),
            F.max("event_id").alias("max_lsn"),
        )
    )


@register(
    "zz_cdc_duplicate_delivery_stats",
    oracle="""
WITH delivered AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 20 = 0
)
SELECT sum(c)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_distinct_lsn,
       sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_duplicated_lsn
FROM (SELECT event_id, count(*) AS c FROM delivered GROUP BY 1)
""",
    tags=("cdc", "idempotence"),
)
def cdc_duplicate_delivery_stats(spark, sf_dir):
    """Duplicate-delivery accounting: re-emit a deterministic slice, count
    lsns delivered more than once (at-least-once → effectively-once input)."""
    ev = t(spark, sf_dir, "events")
    delivered = ev.unionByName(ev.filter(F.col("event_id") % 20 == 0))
    per_lsn = delivered.groupBy("event_id").agg(F.count(F.lit(1)).alias("c"))
    return per_lsn.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_lsn"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_duplicated_lsn"),
    )


@register(
    "zz_cdc_out_of_order_share",
    oracle="""
SELECT user_id,
       sum(CASE WHEN prev_max IS NOT NULL AND ts < prev_max THEN 1 ELSE 0 END)::BIGINT AS n_ooo,
       count(*)::BIGINT AS n_total
FROM (
  SELECT user_id, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM events
) GROUP BY user_id
""",
    tags=("cdc", "window", "late_data"),
)
def cdc_out_of_order_share(spark, sf_dir):
    """Late-data rate per key: events whose ts regresses vs the running max in
    lsn order — what watermarking must absorb (SURVEY §2.9 T4)."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn("prev_max", F.max("ts").over(w))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("prev_max").isNotNull() & (F.col("ts") < F.col("prev_max")), 1
                ).otherwise(0)
            ).alias("n_ooo"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@register(
    "zz_cdc_gap_stats",
    oracle="""
SELECT user_id,
       max(gap) AS max_gap,
       round(avg(gap), 4) AS avg_gap
FROM (
  SELECT user_id,
         event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS gap
  FROM events
) WHERE gap IS NOT NULL
GROUP BY user_id
""",
    tags=("cdc", "window", "lag"),
)
def cdc_gap_stats(spark, sf_dir):
    """LSN-gap detection per key via lag() — missing-event monitoring."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    gaps = ev.withColumn("gap", F.col("event_id") - F.lag("event_id").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.max("gap").alias("max_gap"), F.round(F.avg("gap"), 4).alias("avg_gap")
    )


@register(
    "zz_cdc_sessionize",
    oracle="""
SELECT user_id, (1 + sum(is_new))::BIGINT AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
) GROUP BY user_id
""",
    tags=("cdc", "window", "session"),
)
def cdc_sessionize(spark, sf_dir):
    """Sessionization: new session when the gap to the previous event exceeds
    30 min (lag + indicator sum — the batch analog of session_window)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800, 1
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg((F.lit(1) + F.sum("is_new")).alias("n_sessions"))


@register(
    "cdc_merge_two_sources",
    oracle="""
SELECT user_id, event_id AS last_lsn, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
    tags=("cdc", "merge", "J5"),
)
def cdc_merge_two_sources(spark, sf_dir):
    """MERGE semantics check: state(lsn<500) full-outer-merged with
    updates(lsn>=500) under LWW must equal a single replay — the J5
    join-update as a coalesce over a full outer join."""
    ev = t(spark, sf_dir, "events")
    old = lww_winners_agg(ev.filter(F.col("event_id") < 500), ["user_id"], ["ts", "event_id"])
    new = lww_winners_agg(ev.filter(F.col("event_id") >= 500), ["user_id"], ["ts", "event_id"])
    o = old.select(
        F.col("user_id").alias("o_user"), F.col("ts").alias("o_ts"),
        F.col("event_id").alias("o_lsn"), F.col("value").alias("o_value"),
    )
    n = new.select(
        F.col("user_id").alias("n_user"), F.col("ts").alias("n_ts"),
        F.col("event_id").alias("n_lsn"), F.col("value").alias("n_value"),
    )
    j = o.join(n, o.o_user == n.n_user, "full_outer")
    newer = (F.col("n_ts") > F.col("o_ts")) | (
        (F.col("n_ts") == F.col("o_ts")) & (F.col("n_lsn") > F.col("o_lsn"))
    )
    take_new = F.col("o_user").isNull() | (F.col("n_user").isNotNull() & newer)
    return j.select(
        F.coalesce("n_user", "o_user").alias("user_id"),
        F.when(take_new, F.col("n_lsn")).otherwise(F.col("o_lsn")).alias("last_lsn"),
        F.when(take_new, F.col("n_value")).otherwise(F.col("o_value")).alias("last_value"),
    )


@register(
    "zz_cdc_idempotent_reapply",
    oracle="""
WITH delivered AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
)
SELECT user_id, event_id AS last_lsn, value AS last_value
FROM delivered
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
    tags=("cdc", "idempotence"),
)
def cdc_idempotent_reapply(spark, sf_dir):
    """Replaying the whole stream twice yields the identical final state
    (LWW idempotence — exactly-once effect from at-least-once delivery)."""
    ev = t(spark, sf_dir, "events")
    win = lww_winners_agg(ev.unionByName(ev), ["user_id"], ["ts", "event_id"])
    return win.select(
        "user_id", F.col("event_id").alias("last_lsn"), F.col("value").alias("last_value")
    )
