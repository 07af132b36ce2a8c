"""Multimodal pipeline queries — rows-only checks (mapInPandas is not
SQL-expressible; the driver records the weaker rows-only result for these,
per the contract in /root/repo/__spark_entry__.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_geo_dem_spark.operators.multimodal import (
    attach_binary_payload,
    decode_metadata,
    sample_frames,
)
from etl_geo_dem_spark.queries.registry import register, t


@register("zz_multimodal_decode_metadata", oracle=None, tags=("multimodal", "pandas_udf", "P2"))
def multimodal_decode_metadata(spark, sf_dir):
    """Binary payload → Arrow-batched stub decode → typed metadata rows."""
    d = attach_binary_payload(t(spark, sf_dir, "documents"))
    return decode_metadata(d)


@register(
    "multimodal_frame_sample_stats",
    oracle="""
SELECT doc_id,
       count(*) AS n_frames,
       sum(least(64, nb - i * 64))::BIGINT AS total_bytes
FROM (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
     unnest(range(0, greatest(nb // 64, 1))) AS t(i)
GROUP BY doc_id
""",
    tags=("multimodal", "explode"),
)
def multimodal_frame_sample_stats(spark, sf_dir):
    """Frame sampling fan-out + per-doc frame accounting. The Spark side is the
    real explode-in-task plan over the binary payload (sequence + substring, no
    Python); the DuckDB oracle derives each sampled frame's byte count
    arithmetically from the payload length — same frame grid, independent
    computation."""
    d = attach_binary_payload(t(spark, sf_dir, "documents"))
    frames = sample_frames(d, every_n_bytes=64)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame_bytes")).alias("total_bytes"),
    )
