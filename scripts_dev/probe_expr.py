"""Dev probe: how to walk a Column's expression tree in pyspark 4 classic mode."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_geo_dem_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(master="local[2]", app_name="probe")
c = (F.col("conv_id") == "x") & (F.col("ts") < F.lit(5))
print("type:", type(c))
print("has _jc:", hasattr(c, "_jc"))
try:
    jc = c._jc
    print("jc:", jc)
    e = jc.expr()
    print("expr class:", e.getClass().getName())
    print("expr str:", e.toString())
    # walk
    print("children:", e.children())
    left = e.children().apply(0)
    print("left:", left.getClass().getSimpleName(), left.toString())
    l2 = left.children().apply(0)
    r2 = left.children().apply(1)
    print("  l2:", l2.getClass().getSimpleName(), l2.toString())
    print("  r2:", r2.getClass().getSimpleName(), r2.toString())
    if l2.getClass().getSimpleName() == "UnresolvedAttribute":
        print("  attr name:", l2.name())
    if r2.getClass().getSimpleName() == "Literal":
        print("  lit value:", r2.value(), type(r2.value()))
except Exception as ex:
    print("jc path failed:", repr(ex))
    # try python-side node
    for attr in ("_expr", "_node", "op"):
        if hasattr(c, attr):
            print(attr, "->", getattr(c, attr))

# isin
c2 = F.col("conv_id").isin("a", "b", "c")
try:
    e2 = c2._jc.expr()
    print("isin class:", e2.getClass().getSimpleName(), e2.toString())
    ch = e2.children()
    print("isin children n:", ch.size())
    for i in range(ch.size()):
        n = ch.apply(i)
        print("  ", n.getClass().getSimpleName(), n.toString())
except Exception as ex:
    print("isin failed:", repr(ex))

# sql string parse
try:
    p = spark._jsparkSession.sessionState().sqlParser()
    e3 = p.parseExpression("conv_id = 'x' OR conv_id = 'y'")
    print("parsed:", e3.getClass().getSimpleName(), e3.toString())
except Exception as ex:
    print("parse failed:", repr(ex))
spark.stop()
