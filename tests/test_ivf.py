"""Dual-implementation oracle for the IVF k-means ANN operator: the Spark
DataFrame implementation (operators/ivf.py) must agree EXACTLY with an
independent NumPy implementation of the same deterministic algorithm —
seeding, Lloyd updates, tie-breaks, probe routing and top-k ranking."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_geo_dem_spark.operators.ivf import assign_clusters, ivf_topk, kmeans_fit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


def _np_kmeans(ids, X, k=8, iters=2):
    order = np.argsort(ids)
    C = X[order[:k]].copy()  # seeds: k smallest ids
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the LOWEST index on ties
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def _np_assign(X, C):
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1), d2.min(axis=1)


def _np_topk(ids, X, C, query_id, topk=5, nprobe=2):
    q = X[ids == query_id][0]
    dq = ((C - q) ** 2).sum(axis=1)
    probed = np.lexsort((np.arange(len(C)), dq))[:nprobe]
    assign, _ = _np_assign(X, C)
    mask = np.isin(assign, probed) & (ids != query_id)
    cand_ids, cand = ids[mask], X[mask]
    cos = np.round(
        cand @ q / (np.linalg.norm(cand, axis=1) * np.linalg.norm(q)), 6
    )
    order = np.lexsort((cand_ids, -cos))[:topk]
    return list(zip(cand_ids[order].tolist(), cos[order].tolist()))


def test_kmeans_centroids_match_numpy(spark, emb, emb_np):
    ids, X = emb_np
    C_np = _np_kmeans(ids, X)
    C_sp = kmeans_fit(emb, k=8, iters=2)
    got = {r["cluster_id"]: np.array(r["centroid"]) for r in C_sp.collect()}
    assert set(got) == set(range(8))
    for c in range(8):
        np.testing.assert_allclose(got[c], C_np[c], rtol=0, atol=1e-9)


def test_assignment_matches_numpy(spark, emb, emb_np):
    ids, X = emb_np
    C = _np_kmeans(ids, X)
    centroids = kmeans_fit(emb, k=8, iters=2)
    assign_np, _ = _np_assign(X, C)
    got = {
        r["vec_id"]: r["cluster_id"] for r in assign_clusters(emb, centroids).collect()
    }
    exp = dict(zip(ids.tolist(), assign_np.tolist()))
    assert got == exp


def test_ivf_topk_matches_numpy_and_bruteforce_recall(spark, emb, emb_np):
    ids, X = emb_np
    C = _np_kmeans(ids, X)
    centroids = kmeans_fit(emb, k=8, iters=2)
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(emb, centroids, query_id=7, topk=5, nprobe=2).collect()
    ]
    exp = _np_topk(ids, X, C, query_id=7)
    assert got == exp
    # recall vs exact brute force within the probed clusters is 1 by
    # construction; sanity: every returned cosine is a real pairwise score
    assert len(got) == 5 and all(-1.0 <= c <= 1.0 for _, c in got)


def test_ivf_registry_query_runs(spark):
    from etl_geo_dem_spark.queries.registry import REGISTRY

    df = REGISTRY["zz_similarity_ivf_kmeans_probe"].fn(spark, SF)
    rows = df.collect()
    assert len(rows) == 5
    assert df.columns == ["vec_id", "cosine"]
