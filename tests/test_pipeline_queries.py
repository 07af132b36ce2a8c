"""Round-5 training-pipeline assembly operators (queries/pipeline.py):
semantic invariants plus the physical-plan properties that make each viable
at 100 TB. Value-level correctness vs DuckDB is graded by the driver's
dual-oracle harness; these tests pin what the oracle can't — plan shape and
engine-independent invariants."""

from pyspark.sql import functions as F

from etl_geo_dem_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _df(spark, name):
    return REGISTRY[name].fn(spark, SF)


def _plan(spark, name):
    return _df(spark, name)._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------- packing

def test_pack_concat_chunk_conserves_tokens_and_is_single_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != "")))
    ).first()[0]
    packs = _df(spark, "zz_pipeline_pack_concat_chunk")
    rows = packs.collect()
    assert sum(r["pack_tokens"] for r in rows) == total  # no token lost/duped
    # packs are contiguous 0..max per shard (concat-chunk leaves no holes)
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r["lang"], r["source"]), []).append(r["pack_id"])
    for ids in by_shard.values():
        assert sorted(ids) == list(range(len(ids)))
    # window by (lang, source) and groupBy (lang, source, pack_id) share one
    # shuffle: the group keys extend the window partitioning, so Catalyst
    # reuses the exchange — the property that keeps packing one-pass at scale
    plan = _plan(spark, "zz_pipeline_pack_concat_chunk")
    assert plan.count("Exchange") == 1, plan


# ------------------------------------------------------------------ sampling

def test_stratified_sample_is_deterministic_and_shuffle_free(spark):
    a = sorted(r["doc_id"] for r in _df(spark, "zz_pipeline_stratified_sample").collect())
    b = sorted(r["doc_id"] for r in _df(spark, "zz_pipeline_stratified_sample").collect())
    assert a == b and len(a) > 0  # same rows every run — reproducible recipe
    # rate 1.0 stratum is kept whole
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_zh = docs.filter(F.col("lang") == "zh").count()
    kept_zh = (
        _df(spark, "zz_pipeline_stratified_sample").filter(F.col("lang") == "zh").count()
    )
    assert kept_zh == n_zh
    plan = _plan(spark, "zz_pipeline_stratified_sample")
    assert "Exchange" not in plan  # stateless map-side filter


# ----------------------------------------------------------------- redaction

def test_pii_redact_leaves_no_matches(spark):
    out = _df(spark, "zz_pipeline_pii_redact")
    n = out.count()
    leaked = out.filter(
        F.col("redacted").rlike("[a-z0-9]+@[a-z]+\\.[a-z]+")
        | F.col("redacted").rlike("555-[0-9]{4}")
    ).count()
    assert n > 0 and leaked == 0
    assert out.filter((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count() == 0
    plan = _plan(spark, "zz_pipeline_pii_redact")
    assert "BatchEvalPython" not in plan  # regex stays JVM-side


# ------------------------------------------------------------- contamination

def test_contamination_broadcasts_the_benchmark_side(spark):
    out = _df(spark, "zz_pipeline_benchmark_contamination").collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench_ids = {r["doc_id"] for r in docs.filter(F.col("source") == "src0").collect()}
    for r in out:
        assert r["doc_id"] not in bench_ids  # benchmark never flags itself
        assert r["n_shared_shingles"] >= 1
    plan = _plan(spark, "zz_pipeline_benchmark_contamination")
    # fixed-size benchmark side broadcast: the training corpus never shuffles
    # for the join itself (the groupBy after it is the only corpus exchange)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------------- mixture

def test_mixture_weights_hit_the_target(spark):
    rows = {r["lang"]: r for r in _df(spark, "zz_pipeline_domain_mixture_weights").collect()}
    assert abs(sum(r["actual_share"] for r in rows.values()) - 1.0) < 1e-4
    for r in rows.values():
        # weight × actual share = target share (the defining property)
        assert abs(r["weight"] * r["actual_share"] - 0.2) < 1e-4


# ---------------------------------------------------- dedup cluster canonical

def test_cluster_canonical_is_a_valid_assignment(spark):
    rows = _df(spark, "zz_dedup_minhash_cluster_canonical").collect()
    assert len(rows) > 0
    label = {r["doc_id"]: r["canonical"] for r in rows}
    for doc, canon in label.items():
        assert canon <= doc  # canonical is the component min
        assert label[canon] == canon  # canonicals are their own canonical
