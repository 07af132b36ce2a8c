"""Driver-facing query registry.

Every operator family from SURVEY.md §2 gets a named query implemented twice:
once in idiomatic PySpark (DataFrame API) and once as ANSI SQL for the DuckDB
oracle — the engine's dual-oracle correctness strategy (SURVEY.md §5, mirroring
the reference's db==tif−1 pattern, /root/reference/tests/test_module.py:98-141).

Importing this package populates :data:`REGISTRY` from all query modules.
"""

from etl_geo_dem_spark.queries.registry import REGISTRY, Q, register, t  # noqa: F401

# populate the registry
from etl_geo_dem_spark.queries import cdc  # noqa: F401,E402
from etl_geo_dem_spark.queries import relational  # noqa: F401,E402
from etl_geo_dem_spark.queries import textops  # noqa: F401,E402
from etl_geo_dem_spark.queries import vector  # noqa: F401,E402
from etl_geo_dem_spark.queries import multimodal  # noqa: F401,E402
from etl_geo_dem_spark.queries import advanced  # noqa: F401,E402
from etl_geo_dem_spark.queries import pipeline  # noqa: F401,E402
from etl_geo_dem_spark.queries import streaming_q  # noqa: F401,E402
