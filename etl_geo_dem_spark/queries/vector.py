"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Brute-force cosine top-k as the verifiable baseline, hyperplane-LSH bucketing as
the scale path, centroid (IVF-coarse) statistics. All dots/norms are computed
with Spark higher-order functions (JVM-side, no Python), and every arithmetic
step is forced to double with sequential summation so the DuckDB oracle is
bit-comparable before rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_geo_dem_spark.queries.registry import register, t

DIM = 64

# ---- shared expressions ------------------------------------------------------


def _vec(col="embedding"):
    return F.col(col).cast("array<double>")


from etl_geo_dem_spark.functions.vectors import dot_expr as _dot
from etl_geo_dem_spark.functions.vectors import norm_expr as _norm


_DOT_SQL = (
    "list_sum(list_transform(range(1, {dim} + 1), i -> ({a}[i]::DOUBLE) * ({b}[i]::DOUBLE)))"
)
_NORM_SQL = "sqrt(" + _DOT_SQL + ")"


@register(
    "embedding_norm_stats",
    oracle=f"""
SELECT label, count(*) AS n,
       round(avg({_NORM_SQL.format(dim=DIM, a='embedding', b='embedding')}), 6) AS avg_norm
FROM embeddings GROUP BY label
""",
    tags=("vector", "norm"),
)
def embedding_norm_stats(spark, sf_dir):
    """Per-label count and mean L2 norm — the sanity aggregation every
    embedding pipeline runs first."""
    e = t(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(_norm(_vec())), 6).alias("avg_norm"),
    )


@register(
    "similarity_bruteforce_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round({_DOT_SQL.format(dim=DIM, a='e.embedding', b='q.qe')}
               / ({_NORM_SQL.format(dim=DIM, a='e.embedding', b='e.embedding')}
                  * {_NORM_SQL.format(dim=DIM, a='q.qe', b='q.qe')}), 6) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
)
SELECT vec_id, cosine
FROM scored
QUALIFY row_number() OVER (ORDER BY cosine DESC, vec_id ASC) <= 10
""",
    tags=("vector", "ann", "topk"),
)
def similarity_bruteforce_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs a fixed query vector — the exact ANN
    baseline. The query side is a 1-row broadcast; ranking is on the ROUNDED
    score (+ vec_id tiebreak) so the top-k set is engine-deterministic.
    At scale this plan is scan + broadcast + TakeOrdered — no shuffle of the
    embedding table."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(_vec("embedding"), _vec("qe"))
                / (_norm(_vec("embedding")) * _norm(_vec("qe"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(10)


def _lsh_bucket(v, n_planes: int = 4):
    """Hyperplane-LSH bucket id (deterministic pseudo-random planes
    h_p[j] = sin(97p + j), identically computable in DuckDB SQL)."""
    bucket = None
    for p in range(n_planes):
        plane = F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), lambda j: F.sin(p * 97 + j))
        bit = F.when(_dot(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


_LSH_BUCKET_SQL = (
    "("
    + " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {DIM} + 1), "
        f"i -> ({{e}}[i]::DOUBLE) * sin({p} * 97 + i - 1))) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(4)
    )
    + ")::BIGINT"
)


@register(
    "zz_similarity_lsh_hyperplane_buckets",
    oracle=f"""
SELECT ({' + '.join(
    f"(CASE WHEN list_sum(list_transform(range(1, {DIM} + 1), "
    f"i -> (embedding[i]::DOUBLE) * sin({p} * 97 + i - 1))) >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(4)
)})::BIGINT AS bucket,
       count(*) AS n
FROM embeddings GROUP BY 1
""",
    tags=("vector", "ann", "lsh"),
)
def similarity_lsh_hyperplane_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucketing (4 planes → 16 buckets). Hyperplanes are
    the deterministic pseudo-random family h_p[j] = sin(97p + j), identically
    computable in any engine — the scale path for ANN: candidate search joins
    within a bucket instead of all-pairs."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(_lsh_bucket(_vec()).alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "zz_similarity_ivf_centroid_norms",
    oracle="""
SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm
FROM (
  SELECT label, pos, avg(x) AS m
  FROM (
    SELECT label, i AS pos, embedding[i]::DOUBLE AS x
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
  ) GROUP BY label, pos
) GROUP BY label
""",
    tags=("vector", "ann", "ivf"),
)
def similarity_ivf_centroid_norms(spark, sf_dir):
    """IVF coarse-quantizer statistics: per-label centroid (mean per dimension)
    and its norm. posexplode → two-level aggregation; at scale the first agg is
    map-side-combining on (label, pos)."""
    e = t(spark, sf_dir, "embeddings")
    exploded = e.select("label", F.posexplode(_vec()).alias("pos0", "x")).select(
        "label", (F.col("pos0") + 1).alias("pos"), "x"
    )
    per_dim = exploded.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return per_dim.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm")
    )


@register(
    "similarity_ann_ivf_probe",
    oracle=f"""
WITH q AS (SELECT embedding AS qe, label AS qlabel FROM embeddings WHERE vec_id = 7)
SELECT e.vec_id,
       round({_DOT_SQL.format(dim=DIM, a='e.embedding', b='q.qe')}
             / ({_NORM_SQL.format(dim=DIM, a='e.embedding', b='e.embedding')}
                * {_NORM_SQL.format(dim=DIM, a='q.qe', b='q.qe')}), 6) AS cosine
FROM embeddings e CROSS JOIN q
WHERE e.label = q.qlabel AND e.vec_id <> 7
QUALIFY row_number() OVER (ORDER BY cosine DESC, vec_id ASC) <= 5
""",
    tags=("vector", "ann", "ivf"),
)
def similarity_ann_ivf_probe(spark, sf_dir):
    """IVF-style probed ANN: restrict the candidate set to the query's coarse
    cell (label) before exact scoring — the pruned counterpart of
    similarity_bruteforce_topk (scan shrinks by the number of cells)."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 7).select(
        F.col("embedding").alias("qe"), F.col("label").alias("qlabel")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter((F.col("label") == F.col("qlabel")) & (F.col("vec_id") != 7))
        .select(
            "vec_id",
            F.round(
                _dot(_vec("embedding"), _vec("qe"))
                / (_norm(_vec("embedding")) * _norm(_vec("qe"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(5)


@register(
    "zz_similarity_ivf_kmeans_probe",
    oracle=None,  # iterative (2 Lloyd rounds) — not SQL-expressible; the exact
    # dual-implementation oracle is the NumPy replay in tests/test_ivf.py,
    # the same strategy as the CDC replayer oracle (documented rows-only row)
    tags=("vector", "ann", "ivf", "kmeans", "iterative"),
)
def similarity_ivf_kmeans_probe(spark, sf_dir):
    """True IVF ANN: deterministic k-means(8, 2 Lloyd iterations) coarse
    quantizer over the embeddings, then a 2-probe exact-cosine top-5 for query
    vec_id=7 — the trained-quantizer upgrade of `similarity_ann_ivf_probe`
    (which reuses labels as cells). Per iteration: broadcast k·dim doubles,
    one map-side argmin pass, one (cluster,dim) map-side-combining mean — the
    corpus itself never shuffles. Driver check is rows-only; the exact oracle
    is an independent NumPy implementation asserted equal in pytest."""
    from etl_geo_dem_spark.operators.ivf import ivf_topk, kmeans_fit

    e = t(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e, k=8, iters=2)
    return ivf_topk(e, centroids, query_id=7, topk=5, nprobe=2)


@register(
    "similarity_near_dup_pairs",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_DOT_SQL.format(dim=DIM, a='a.embedding', b='b.embedding')}
             / ({_NORM_SQL.format(dim=DIM, a='a.embedding', b='a.embedding')}
                * {_NORM_SQL.format(dim=DIM, a='b.embedding', b='b.embedding')}), 6) AS cosine
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_DOT_SQL.format(dim=DIM, a='a.embedding', b='b.embedding')}
      / ({_NORM_SQL.format(dim=DIM, a='a.embedding', b='a.embedding')}
         * {_NORM_SQL.format(dim=DIM, a='b.embedding', b='b.embedding')}) >= 0.2999995
""",
    tags=("vector", "dedup", "cosine"),
)
def similarity_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cosine above threshold) within coarse cells —
    the blocked all-pairs used for dedup: the label equi-join bounds the
    quadratic term to one cell, never the full corpus."""
    e = t(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "label")
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "label")
    pairs = a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(
        _dot(_vec("ea"), _vec("eb")) / (_norm(_vec("ea")) * _norm(_vec("eb"))), 6
    )
    return pairs.select("vec_a", "vec_b", cos.alias("cosine")).filter(
        F.col("cosine") >= 0.3
    )


@register(
    "zz_similarity_lsh_blocked_near_dup",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding, {_LSH_BUCKET_SQL.format(e='embedding')} AS bucket
  FROM embeddings
)
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round({_DOT_SQL.format(dim=DIM, a='x.embedding', b='y.embedding')}
             / ({_NORM_SQL.format(dim=DIM, a='x.embedding', b='x.embedding')}
                * {_NORM_SQL.format(dim=DIM, a='y.embedding', b='y.embedding')}), 6) AS cosine
FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE {_DOT_SQL.format(dim=DIM, a='x.embedding', b='y.embedding')}
      / ({_NORM_SQL.format(dim=DIM, a='x.embedding', b='x.embedding')}
         * {_NORM_SQL.format(dim=DIM, a='y.embedding', b='y.embedding')}) >= 0.2999995
""",
    tags=("vector", "dedup", "lsh", "cosine"),
)
def similarity_lsh_blocked_near_dup(spark, sf_dir):
    """LSH-blocked near-duplicate pairs: block by the 4-plane hyperplane-LSH
    bucket FIRST, then exact cosine ≥ 0.3 within each bucket — the composition
    of `zz_similarity_lsh_hyperplane_buckets` and `similarity_near_dup_pairs`
    that replaces data-dependent label blocking with hash blocking whose cell
    sizes the pipeline controls (more planes → smaller cells).

    Recall contract (exactly as in production embedding dedup): LSH blocking
    is a CANDIDATE filter — a true near-dup pair hashed into different buckets
    is missed, so recall < 1 vs the label-blocked truth; every returned pair
    is exactly verified (precision 1 within the blocking). The DuckDB oracle
    computes the identical deterministic buckets, proving the Spark blocking +
    verify end-to-end. At 100 TB this is the plan: the quadratic term is
    bounded per bucket, the join is a plain equi-join on the bucket key, and
    skewed buckets split by adding planes (or salting the bucket id)."""
    e = t(spark, sf_dir, "embeddings")
    withb = e.select("vec_id", "embedding", _lsh_bucket(_vec()).alias("bucket"))
    x = withb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    y = withb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket"
    )
    pairs = x.join(y, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(
        _dot(_vec("ea"), _vec("eb")) / (_norm(_vec("ea")) * _norm(_vec("eb"))), 6
    )
    return pairs.select("vec_a", "vec_b", cos.alias("cosine")).filter(
        F.col("cosine") >= 0.3
    )
