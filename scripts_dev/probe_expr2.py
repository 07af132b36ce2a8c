import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_geo_dem_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(master="local[2]", app_name="probe2")
c = (F.col("conv_id") == "x") & (F.col("ts") < F.lit(5))
jc = c._jc
for cand in ("node", "expr_", "toExpr"):
    try:
        r = getattr(jc, cand)()
        print(cand, "->", r.getClass().getName(), r.toString())
    except Exception as ex:
        print(cand, "failed:", str(ex)[:120])
try:
    eu = spark._jvm.org.apache.spark.sql.classic.ExpressionUtils
    e = eu.expression(jc)
    print("ExpressionUtils:", e.getClass().getSimpleName(), e.toString())
    ch = e.children()
    left = ch.apply(0)
    print("left:", left.getClass().getSimpleName())
    l2, r2 = left.children().apply(0), left.children().apply(1)
    print("l2:", l2.getClass().getSimpleName(), "| name:", l2.name() if "Attribute" in l2.getClass().getSimpleName() else "-")
    print("r2:", r2.getClass().getSimpleName(), "| value:", r2.value(), type(r2.value()).__name__)
except Exception as ex:
    print("EU failed:", str(ex)[:300])

c2 = F.col("conv_id").isin("a", "b")
try:
    eu = spark._jvm.org.apache.spark.sql.classic.ExpressionUtils
    e2 = eu.expression(c2._jc)
    print("isin:", e2.getClass().getSimpleName(), e2.toString())
    ch = e2.children()
    for i in range(ch.size()):
        n = ch.apply(i)
        print("  ", n.getClass().getSimpleName(), n.toString())
    # In has .value() and .list()
    try:
        print("  In.value:", e2.value().getClass().getSimpleName())
        lst = e2.list()
        print("  In.list size:", lst.size(), lst.apply(0).value())
    except Exception as ex:
        print("  In access failed:", str(ex)[:120])
except Exception as ex:
    print("isin EU failed:", str(ex)[:200])

# literal value types: string literal value() class?
try:
    eu = spark._jvm.org.apache.spark.sql.classic.ExpressionUtils
    e3 = eu.expression((F.col("k") == "strval")._jc)
    lit = e3.children().apply(1)
    v = lit.value()
    print("str literal:", type(v).__name__, repr(v))
    dt = lit.dataType()
    print("lit dataType:", dt.toString())
except Exception as ex:
    print("lit probe failed:", str(ex)[:200])
spark.stop()
