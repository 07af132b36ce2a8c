"""Hot-key detection for skew handling.

The reference partitions work by key count only (``split_list``,
`scripts/pipelines/pipeline_transform_vrt_gdal.py:41-62`) and has no size-aware
balancing — a documented gap (SURVEY.md §4). The CDC engine detects heavy
``conv_id``s per batch and salts only those (operators/lww.py), alongside Spark
AQE skew-join splitting for the join paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_HOT_KEYS = 10_000  # driver-side safety bound; hot keys are by definition few


def detect_hot_keys(
    df: DataFrame,
    key_col: str = "conv_id",
    threshold_frac: float = 0.01,
    sample_frac: float = 0.1,
    seed: int = 42,
) -> list:
    """Return key values carrying more than ``threshold_frac`` of (sampled) rows.

    Runs on a sample so detection itself doesn't shuffle the full batch; the
    collect is bounded (keys above a 1% frequency threshold number ≤100, capped at
    MAX_HOT_KEYS defensively). Deterministic: fixed sample seed.
    """
    sampled = df.sample(fraction=sample_frac, seed=seed) if sample_frac < 1.0 else df
    counts = sampled.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    total = sampled.count()
    if total == 0:
        return []
    rows = (
        counts.filter(F.col("_n") > total * threshold_frac)
        .orderBy(F.col("_n").desc())
        .limit(MAX_HOT_KEYS)
        .select(key_col)
        .collect()
    )
    return [r[0] for r in rows]
