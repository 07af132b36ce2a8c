"""IVF (inverted-file) ANN index: deterministic k-means coarse quantizer +
cluster-probed exact search — all pyspark.sql DataFrame ops, no Python in the
hot path.

This is the scale path for similarity search over the ``embeddings`` table
(SURVEY task addendum): brute-force cosine scans the full corpus per query;
IVF scans only the ``nprobe`` nearest clusters — at 100 TB the assignment
table is bucketed by ``cluster_id`` so a probe reads O(corpus/k · nprobe)
rows via partition pruning, exactly like the engine's bucket-pruned MERGE.

Everything is deterministic (fixed seed vectors, fixed iteration count,
ties broken by lowest id), so results are reproducible across runs and
engines — the property every query in this repo's dual-oracle suite relies
on. The pytest oracle is an independent NumPy re-implementation
(`tests/test_ivf.py`), the same dual-implementation strategy as the CDC
replayer oracle (reference analog: representation-consistency tests,
`/root/reference/tests/test_module.py:299-343`).

Reference analog: the coarse-grid-then-refine access pattern of the tiled
raster pipeline — coarse cell lookup prunes the candidate set before the
exact per-pixel work (`tile_utils.py:82-107`; SURVEY §2.3 J14 point lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from etl_geo_dem_spark.functions.vectors import dot_expr as _dot
from etl_geo_dem_spark.functions.vectors import norm_expr as _norm
from etl_geo_dem_spark.functions.vectors import sqdist_expr as _sqdist


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means with deterministic seeding: centroids start as the
    embeddings of the ``k`` smallest ids; each iteration assigns every vector
    to its nearest centroid (squared L2, lowest cluster id wins ties) and
    recomputes per-dimension means. A fixed small ``iters`` keeps the coarse
    quantizer deterministic — IVF needs a stable partition of space, not a
    converged one (FAISS trains its quantizer the same bounded way).

    Returns a DataFrame (cluster_id int, centroid array<double>).

    Scale shape per iteration: one broadcast of k·dim doubles (bytes, not
    data), one map-side argmin over the corpus, one (cluster, dim)-keyed
    map-side-combining aggregation of k·dim rows. No corpus shuffle."""
    v = F.col(vec_col).cast("array<double>")
    centroids = (
        emb.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("rn"),
            v.alias("centroid"),
        )
        .select((F.col("rn") - 1).alias("cluster_id"), "centroid")
    )
    for _ in range(iters):
        assigned = assign_clusters(emb, centroids, id_col=id_col, vec_col=vec_col)
        # new centroid = per-dimension mean of members; a cluster that lost all
        # members keeps its previous centroid (standard empty-cluster rule)
        dims = (
            assigned.join(emb.select(id_col, vec_col), id_col)
            .select("cluster_id", F.posexplode(v).alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("x").alias("m"))
        )
        new_c = (
            dims.groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster_id", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
        centroids = (
            centroids.select("cluster_id", F.col("centroid").alias("old"))
            .join(new_c, "cluster_id", "left")
            .select("cluster_id", F.coalesce("centroid", "old").alias("centroid"))
        )
        # k·dim doubles: materialize each round so the lineage stays flat
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, argmin over
    squared L2 with lowest cluster id on ties. Returns (id_col, cluster_id,
    dist2). One map-side pass over the corpus — the k-way comparison happens
    inside a single task, no shuffle of the embedding table."""
    v = F.col(vec_col).cast("array<double>")
    scored = emb.select(id_col, v.alias("_v")).crossJoin(F.broadcast(centroids))
    scored = scored.select(
        id_col, "cluster_id", _sqdist(F.col("_v"), F.col("centroid")).alias("dist2")
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct("dist2", "cluster_id")).alias("b")
    )
    return best.select(id_col, F.col("b.cluster_id").alias("cluster_id"), F.col("b.dist2").alias("dist2"))


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    query_id: int,
    topk: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Probed ANN: route the query to its ``nprobe`` nearest centroids, scan
    ONLY vectors assigned to those clusters, return exact cosine top-k
    (rounded to 6 dp, id tiebreak — engine-deterministic ranking).

    ``assigned`` is the (id, cluster_id) index table. Pass a MATERIALIZED one
    (``assign_clusters(...)`` written to parquet / cached) when serving many
    queries: recomputing it is an O(corpus × k) pass, which is fine for one
    ad-hoc lookup but defeats the probe pruning at serving rates — the index
    is built once, queries only pay the probed-cluster scan.

    Recall contract: like every IVF index, candidates outside the probed
    clusters are missed (recall < 1 vs brute force); every returned score is
    exact. nprobe trades scan cost for recall, k trades index selectivity for
    per-cluster balance."""
    v = F.col(vec_col).cast("array<double>")
    q = emb.filter(F.col(id_col) == query_id).select(v.alias("qe"))
    probe = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .select("cluster_id", _sqdist(F.col("qe"), F.col("centroid")).alias("d2"))
        .orderBy("d2", "cluster_id")
        .limit(nprobe)
        .select("cluster_id")
    )
    if assigned is None:
        assigned = assign_clusters(emb, centroids, id_col=id_col, vec_col=vec_col)
    cand_ids = assigned.join(F.broadcast(probe), "cluster_id").select(id_col)
    cand = emb.join(cand_ids, id_col).filter(F.col(id_col) != query_id)
    scored = cand.crossJoin(F.broadcast(q)).select(
        id_col,
        F.round(
            _dot(v, F.col("qe").cast("array<double>"))
            / (_norm(v) * _norm(F.col("qe").cast("array<double>"))),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(topk)
