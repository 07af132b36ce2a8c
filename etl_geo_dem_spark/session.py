"""SparkSession factory.

Analog of the reference's import-time environment setup (config + DB engine at
``scripts/settings.py:13-16`` and ``scripts/pipelines/model_data.py:20-59``): one
place that binds the execution environment before any plan runs.

Defaults are tuned for the sandbox (``local[N]``, single JVM) but every knob is a
parameter so the same code runs unchanged under ``spark-submit --py-files`` on a
real multi-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "etl_geo_dem_spark",
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    - AQE on: runtime coalesce + skew-join splitting (the reference's static
      ``split_list`` work partitioning, ``pipeline_transform_vrt_gdal.py:41-62``,
      done adaptively instead).
    - Arrow on: all pandas UDF traffic is Arrow-batched (no per-row Python).
    - UTC session timezone: required for DuckDB-oracle comparability.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # match parallelism, not Spark's default 200 — at cluster scale this is
        # set to ~2-3x total cores by the submitter instead.
        spec = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        if spec == "*":
            shuffle_partitions = 32
        elif "," in spec:  # local-cluster[workers,cores_per_worker,mem_mb]
            parts = spec.split(",")
            shuffle_partitions = max(8, int(parts[0]) * int(parts[1]))
        else:
            shuffle_partitions = max(8, int(spec))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 timestamps carry no usable footer min/max; TIMESTAMP_MICROS
        # stats feed manifest-level file skipping (LakeTable stats) and read
        # identically from every modern engine.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
