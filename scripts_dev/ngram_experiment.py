"""Round-6 scratch harness for the ngram-Jaccard plan (not part of the query
path): measures candidate-generation variants stage by stage at sf1.0 and
asserts each variant's final rows equal the shipped query's output."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_geo_dem_spark.session import get_spark

spark = get_spark(master="local[32]", shuffle_partitions=32, driver_memory="64g")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
tau = 0.8

from etl_geo_dem_spark.queries.textops import _shingle_docs, _tokens  # noqa: E402

d = spark.read.parquet(f"{sf}/documents.parquet")


def timed(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"T {label}: {time.time()-t0:.2f}s", flush=True)


# --- stage A: tokenize cost without checkpoint -------------------------------
dd = d.repartition(32)
dd = dd.withColumn("_toks", _tokens())
toks = F.col("_toks")
n = F.size(toks)
idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0)))
shx = F.when(n >= 2, F.transform(
    idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))
)).otherwise(F.array().cast("array<string>"))
plain = dd.select("doc_id", F.array_distinct(shx).alias("arr"))
timed("tokenize+shingle noop (no ckpt)", plain)

t0 = time.time()
docs = _shingle_docs(d)
print(f"T checkpoint: {time.time()-t0:.2f}s", flush=True)

# --- stage B: dense ids ------------------------------------------------------
t0 = time.time()
sh = docs.select("doc_id", F.explode("arr").alias("s"))
df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
print("vocab size:", df_counts.count(), f"{time.time()-t0:.2f}s", flush=True)

t0 = time.time()
dict_df = df_counts.select(
    "s", F.row_number().over(Window.orderBy("df", "s")).alias("id")
)
post = sh.join(F.broadcast(dict_df), "s").select("doc_id", "id")
docs_ids = (
    post.groupBy("doc_id")
    .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    .withColumn("sz", F.size("ids"))
    .localCheckpoint()
)
print(f"T ids checkpoint: {time.time()-t0:.2f}s", flush=True)

par = spark.sparkContext.defaultParallelism
lp = F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1          # probe prefix (old formula)
li = F.col("sz") - F.floor(F.lit(8) * F.col("sz") / 9) + 1        # index prefix (conservative)

probe = docs_ids.select(
    "doc_id", "sz", F.posexplode(F.slice("ids", F.lit(1), lp.cast("int")))
).select(
    F.col("doc_id").alias("doc_x"), F.col("sz").alias("sz_x"),
    (F.col("pos") + 1).alias("rk_x"), F.col("col").alias("id"),
)
index = docs_ids.select(
    "doc_id", "sz", F.posexplode(F.slice("ids", F.lit(1), li.cast("int")))
).select(
    F.col("doc_id").alias("doc_y"), F.col("sz").alias("sz_y"),
    (F.col("pos") + 1).alias("rk_y"), F.col("col").alias("id"),
)
# role order: y strictly "smaller" than x under (sz, doc_id) lexicographic
order_ok = (F.col("sz_y") < F.col("sz_x")) | (
    (F.col("sz_y") == F.col("sz_x")) & (F.col("doc_y") < F.col("doc_x"))
)
len_ok = (F.col("sz_x") >= F.ceil(F.lit(tau) * F.col("sz_y"))) & (
    F.col("sz_y") >= F.ceil(F.lit(tau) * F.col("sz_x"))
)
joined = (
    probe.repartition(par, "doc_x")
    .join(index, "id")
    .filter(order_ok & len_ok)
)
grouped = joined.groupBy("doc_x", "doc_y").agg(
    F.count(F.lit(1)).alias("c"),
    F.max("rk_x").alias("mrx"), F.max("rk_y").alias("mry"),
    F.max("sz_x").alias("sz_x"), F.max("sz_y").alias("sz_y"),
)
need = F.ceil(F.lit(tau) / (1 + tau) * (F.col("sz_x") + F.col("sz_y")))
ub = F.col("c") + F.least(F.col("sz_x") - F.col("mrx"), F.col("sz_y") - F.col("mry"))
cand = grouped.filter(ub >= need).select(
    F.least("doc_x", "doc_y").alias("doc_a"), F.greatest("doc_x", "doc_y").alias("doc_b")
)
t0 = time.time()
n_j = joined.count()
print("joined rows:", n_j, f"{time.time()-t0:.2f}s", flush=True)
t0 = time.time()
n_c = cand.count()
print("cand rows:", n_c, f"{time.time()-t0:.2f}s", flush=True)

# --- verify on int arrays ----------------------------------------------------
arr_a = F.broadcast(docs_ids.select(F.col("doc_id").alias("doc_a"), F.col("ids").alias("arr_a")))
arr_b = F.broadcast(docs_ids.select(F.col("doc_id").alias("doc_b"), F.col("ids").alias("arr_b")))
sa = F.broadcast(docs_ids.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")))
sb = F.broadcast(docs_ids.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")))
jac = F.col("common") * 1.0 / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
out = (
    cand.join(arr_a, "doc_a").join(arr_b, "doc_b")
    .withColumn("common", F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b"))))
    .drop("arr_a", "arr_b")
    .join(sa, "doc_a").join(sb, "doc_b")
    .filter(jac >= tau)
    .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
)
timed("full pipeline with int verify", out)

# --- equality with the shipped query ----------------------------------------
from etl_geo_dem_spark.queries import REGISTRY  # noqa: E402

ship = REGISTRY["dedup_ngram_jaccard_pairs"].fn(spark, sf)
a = {tuple(r) for r in out.collect()}
b = {tuple(r) for r in ship.collect()}
print("rows experiment:", len(a), "shipped:", len(b), "EQUAL:", a == b, flush=True)


# --- v2: no-groupBy plan — first-common-prefix-token dedup + direct verify ---
print("=== v2 ===", flush=True)
t0 = time.time()
bundle = docs_ids.select(
    "doc_id", "sz",
    F.slice("ids", F.lit(1), lp.cast("int")).alias("pref"),
    "ids",
)
probe2 = bundle.select(
    F.col("doc_id").alias("doc_x"), F.col("sz").alias("sz_x"),
    F.col("pref").alias("px"), F.col("ids").alias("fx"),
    F.explode("pref").alias("id"),
)
index2 = docs_ids.select(
    F.col("doc_id").alias("doc_y"), F.col("sz").alias("sz_y"),
    F.explode(F.slice("ids", F.lit(1), li.cast("int"))).alias("id"),
)
ybundle = F.broadcast(bundle.select(
    F.col("doc_id").alias("doc_y"),
    F.col("pref").alias("py"), F.col("ids").alias("fy"),
))
j2 = (
    probe2.repartition(par, "doc_x")
    .join(F.broadcast(index2), "id")
    .filter(order_ok & len_ok)
    .join(ybundle, "doc_y")
    .filter(F.col("id") == F.array_min(F.array_intersect("px", "py")))
)
common = F.size(F.array_intersect("fx", "fy"))
jac2 = F.col("common") * 1.0 / (F.col("sz_x") + F.col("sz_y") - F.col("common"))
out2 = (
    j2.withColumn("common", common)
    .filter(jac2 >= tau)
    .select(
        F.least("doc_x", "doc_y").alias("doc_a"),
        F.greatest("doc_x", "doc_y").alias("doc_b"),
        F.round(jac2, 6).alias("jaccard"),
    )
)
timed("v2 full (no-groupBy)", out2)
a2 = {tuple(r) for r in out2.collect()}
print("v2 rows:", len(a2), "EQUAL:", a2 == b, flush=True)
