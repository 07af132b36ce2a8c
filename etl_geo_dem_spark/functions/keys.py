"""Key codec expressions — the conv_id analog of the reference's geocellid.

The reference's key is structured and invertible: parsed from filenames by
regex (`scripts/settings.py:80-81`, `tile_utils.py:82-107`) and reconstructed
from parts (`create_file_name_from_geocellid`,
`pipeline_transform_sea_level.py:1661-1697`). The engine keeps the same
property for conv_id: ``conv_%06d`` format, parse/format/bucket/salt as pure
column expressions (registered as SQL functions for serving — P5 analog of the
reference's stored procedures, `model_data.py:216-333`).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

CONV_ID_REGEX = r"^conv_(\d{6})$"


def format_conv_id(num: Column | int) -> Column:
    """numeric id → canonical key string (X3 zero-pad analog)."""
    return F.format_string("conv_%06d", num if isinstance(num, Column) else F.lit(num))


def parse_conv_num(conv_id: Column | str) -> Column:
    """canonical key string → numeric id; null if malformed (X1/X5 analog)."""
    c = conv_id if isinstance(conv_id, Column) else F.col(conv_id)
    return F.nullif(F.regexp_extract(c, CONV_ID_REGEX, 1), F.lit("")).cast("long")


def is_valid_conv_id(conv_id: Column | str) -> Column:
    c = conv_id if isinstance(conv_id, Column) else F.col(conv_id)
    return c.rlike(CONV_ID_REGEX)


def bucket_of(conv_id: Column | str, n_buckets: int) -> Column:
    """Storage bucket (matches plans.lake_table.bucket_expr)."""
    c = conv_id if isinstance(conv_id, Column) else F.col(conv_id)
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def register_sql_views(spark: SparkSession, table_path: str) -> None:
    """Serving path (P5 analog of the reference's stored procedures,
    `model_data.py:216-333`): register the live transcript state as a SQL view
    so point lookups are plain `spark.sql("SELECT ... WHERE conv_id = ?")`."""
    from etl_geo_dem_spark.plans.lake_table import LakeTable

    LakeTable.load(spark, table_path).read_public().createOrReplaceTempView("transcripts")


# Pure-SQL equivalents of the codec (no Python UDFs) for use inside spark.sql.
SQL_SNIPPETS = {
    "format_conv_id": "format_string('conv_%06d', {num})",
    "parse_conv_num": "CAST(nullif(regexp_extract({conv_id}, '^conv_(\\\\d{{6}})$', 1), '') AS BIGINT)",
    "bucket_of": "CAST(pmod(xxhash64({conv_id}), {n}) AS INT)",
}
