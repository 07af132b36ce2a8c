"""Training-pipeline assembly operators over ``documents`` — round 5.

The stages BETWEEN cleaning/dedup (textops.py) and the training job: sequence
packing, stratified sampling, PII redaction, benchmark-contamination
screening, and domain-mixture reweighting. All pure pyspark.sql expressions
with DuckDB oracles; no Python in any hot path.

Reference analog: the reference assembles its model inputs with the same
shape of steps — deterministic tiling/partitioning of inputs
(`pipeline_transform_vrt_gdal.py:41-62` split_list), per-domain source
weighting and merge order (`scripts/pipelines/model_data.py:68-121`), and
regex-driven field scrubbing in its loaders (`pipeline_load_localPG.py`).

Cross-engine notes: every hash is md5-hex (identical both engines);
deterministic sampling uses the first 6 md5 hex digits as an integer —
Spark `conv(substring(md5(k),1,6),16,10)`, DuckDB `('0x'||substr(md5(k),1,6))::BIGINT`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_geo_dem_spark.queries.registry import register, t

_TOKENIZE_SQL = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"


def _tokens(col="text"):
    return F.filter(F.split(F.lower(F.col(col)), "[^a-z]+"), lambda x: x != "")


PACK_BUDGET = 256  # tokens per training sequence


@register(
    "zz_pipeline_pack_concat_chunk",
    oracle=f"""
WITH sized AS (
  SELECT lang, source, doc_id, len({_TOKENIZE_SQL})::BIGINT AS ntok
  FROM documents),
placed AS (
  SELECT lang, source, doc_id, ntok,
         coalesce(sum(ntok) OVER (PARTITION BY lang, source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM sized)
SELECT lang, source, (start_tok // {PACK_BUDGET})::BIGINT AS pack_id,
       count(*)::BIGINT AS n_docs, sum(ntok)::BIGINT AS pack_tokens
FROM placed GROUP BY lang, source, pack_id
""",
    tags=("pipeline", "packing"),
)
def pipeline_pack_concat_chunk(spark, sf_dir):
    """Concat-and-chunk sequence packing: within each (lang, source) shard,
    documents are concatenated in doc_id order and split into fixed
    token-budget packs — a document's pack is where its FIRST token lands
    (the packing strategy LLM pretraining loaders actually use). Output is
    the per-pack manifest (doc count, token count).

    Scale shape: the only state is a running token cumsum windowed PER
    (lang, source) SHARD — bounded partitions, so this is a partition-local
    sort, never a global one; at 100 TB the shard key is whatever the layout
    already buckets by and packing stays embarrassingly parallel across
    shards."""
    d = t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = d.select(
        "lang", "source", "doc_id", F.size(_tokens()).cast("long").alias("ntok")
    )
    placed = sized.withColumn(
        "start_tok", F.coalesce(F.sum("ntok").over(w), F.lit(0))
    )
    return placed.groupBy(
        "lang",
        "source",
        F.floor(F.col("start_tok") / PACK_BUDGET).cast("long").alias("pack_id"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("pack_tokens"),
    )


# per-language keep rates for the deterministic stratified sample
_RATES = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 0.75, "zh": 1.0}
_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {int(v * 10000)}" for k, v in _RATES.items()
) + " ELSE 0 END"


@register(
    "zz_pipeline_stratified_sample",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 10000 < {_RATE_SQL}
""",
    tags=("pipeline", "sampling"),
)
def pipeline_stratified_sample(spark, sf_dir):
    """Deterministic hash-Bernoulli stratified sampling: per-language keep
    rates applied via md5(doc_id) — the same row set on every engine, every
    run, at every parallelism (reproducible data recipes need exactly this,
    not rand()). Stateless map-side filter: no shuffle, fully pushes into
    the scan's row pipeline at any scale."""
    d = t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
        "long"
    )
    rate = F.lit(0)
    for k, v in _RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(int(v * 10000))).otherwise(rate)
    return d.filter((h % 10000) < rate).select("doc_id", "lang")


# PII patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB): no
# backrefs, no lookaround
_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "zz_pipeline_pii_redact",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@example.com or call 555-0'
              || lpad((doc_id % 1000)::VARCHAR, 3, '0') AS raw
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(raw, '{_EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(raw, '{_PHONE_RE}'))::BIGINT AS n_phones,
       regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM aug
""",
    tags=("pipeline", "pii"),
)
def pipeline_pii_redact(spark, sf_dir):
    """Regex PII detection + redaction. The synthetic corpus contains no PII,
    so the query PLANTS a deterministic email + fictional 555 phone number
    per document, then detects and redacts them — both engines compute the
    identical planted text, counts, and redacted bytes, which is exactly the
    machinery (count → replace → emit clean text) a real scrub runs.
    Stateless map-side; regexp stays inside whole-stage codegen."""
    d = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-0"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
    )
    aug = d.select("doc_id", raw.alias("raw"))
    return aug.select(
        "doc_id",
        F.regexp_count("raw", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("raw", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


_SHINGLE_N = 4  # word 4-grams: long enough to mean copying, short enough to hit


@register(
    "zz_pipeline_benchmark_contamination",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKENIZE_SQL} AS tk FROM documents),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, greatest(len(tk) - {_SHINGLE_N - 2}, 1)),
                       i -> array_to_string(tk[i:i+{_SHINGLE_N - 1}], ' '))) AS shs
  FROM toks),
p AS (SELECT doc_id, source, unnest(shs) AS s FROM sh)
SELECT a.doc_id, count(DISTINCT a.s)::BIGINT AS n_shared_shingles
FROM p a JOIN (SELECT DISTINCT s FROM p WHERE source = 'src0') b ON a.s = b.s
WHERE a.source <> 'src0'
GROUP BY a.doc_id
""",
    tags=("pipeline", "contamination"),
)
def pipeline_benchmark_contamination(spark, sf_dir):
    """Benchmark-contamination screening: flag training documents sharing any
    word 4-gram with the held-out benchmark set (source = 'src0' stands in),
    with the shared-shingle count as evidence strength. The join is on the
    shingle string: hash-partitioned, and the benchmark side is the SMALL
    side — at 100 TB of training data vs a fixed benchmark suite this is a
    broadcast semi/inner join, so the training corpus never shuffles."""
    d = t(spark, sf_dir, "documents").withColumn("_toks", _tokens())
    toks = F.col("_toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (_SHINGLE_N - 1))
    shingles = F.when(
        n >= _SHINGLE_N,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(_SHINGLE_N)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    p = d.select(
        "doc_id", "source", F.explode(F.array_distinct(shingles)).alias("s")
    )
    bench = (
        p.filter(F.col("source") == "src0").select("s").distinct()
    )
    return (
        p.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").cast("long").alias("n_shared_shingles"))
    )


# uniform target mixture over the five languages
_TARGET_SHARE = 0.2


@register(
    "zz_pipeline_domain_mixture_weights",
    oracle=f"""
WITH tok AS (
  SELECT lang, sum(len({_TOKENIZE_SQL}))::BIGINT AS total_tokens FROM documents GROUP BY lang),
tot AS (SELECT sum(total_tokens) AS grand FROM tok)
SELECT lang, total_tokens,
       round(total_tokens * 1.0 / grand, 6) AS actual_share,
       round({_TARGET_SHARE} * grand / total_tokens, 6) AS weight
FROM tok, tot
""",
    tags=("pipeline", "mixture"),
)
def pipeline_domain_mixture_weights(spark, sf_dir):
    """Domain-mixture reweighting: per-language token totals → actual share →
    the sampling weight that moves the mixture to a uniform target (the
    knob pretraining recipes tune). One tiny agg + a 1-row broadcast of the
    grand total; O(domains) output regardless of corpus size."""
    d = t(spark, sf_dir, "documents")
    tok = d.groupBy("lang").agg(
        F.sum(F.size(_tokens())).cast("long").alias("total_tokens")
    )
    grand = tok.agg(F.sum("total_tokens").alias("grand"))
    return tok.crossJoin(F.broadcast(grand)).select(
        "lang",
        "total_tokens",
        F.round(F.col("total_tokens") * 1.0 / F.col("grand"), 6).alias("actual_share"),
        F.round(F.lit(_TARGET_SHARE) * F.col("grand") / F.col("total_tokens"), 6).alias(
            "weight"
        ),
    )


def _cluster_oracle() -> str:
    """Recursive-CTE oracle for the canonical-assignment composition: the
    MinHash-LSH candidate-pair SQL (reused verbatim from the graded
    `dedup_minhash_lsh_candidates` oracle, as a subquery) feeds a min-label
    fixpoint walk — the same dual-oracle pattern as
    `graph_connected_components`."""
    from etl_geo_dem_spark.queries.registry import REGISTRY

    pair_sql = REGISTRY["dedup_minhash_lsh_candidates"].oracle
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({pair_sql})),
sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT u AS node FROM sym),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.v, w.label FROM walk w JOIN sym s ON s.u = w.node
)
SELECT node AS doc_id, min(label)::BIGINT AS canonical
FROM walk GROUP BY node
"""


@register(
    "zz_dedup_minhash_cluster_canonical",
    oracle=_cluster_oracle(),
    tags=("dedup", "clustering", "composition"),
)
def dedup_minhash_cluster_canonical(spark, sf_dir):
    """The dedup ASSIGNMENT step a pipeline actually applies: connected
    components over the MinHash-LSH candidate-pair graph, each near-dup doc
    mapped to its cluster's canonical (min doc_id) — keep canonical, drop or
    down-weight the rest. Composition of two graded operators
    (`dedup_minhash_lsh_candidates` × the CC min-label loop), sharing their
    scale shapes: banded bucket join (never all-pairs) + O(diameter)
    label-propagation rounds over ONLY the near-dup subgraph, which is tiny
    relative to the corpus (dup clusters, not all docs). At 10^10 docs the
    pair graph still fits the same loop; for pathological mega-clusters
    switch to the two-phase large/small-star variant (`zz_graph_cc_two_phase`)."""
    from etl_geo_dem_spark.queries.textops import dedup_minhash_lsh_candidates

    pairs = dedup_minhash_lsh_candidates(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # edges reused every iteration
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(20):  # near-dup cluster diameter bound; converges earlier
        nbr = (
            sym.join(labels, sym.u == labels.node)
            .groupBy(F.col("v").alias("node2"))
            .agg(F.min("label").alias("nbr"))
        )
        new = (
            labels.join(nbr, labels.node == nbr.node2, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").cast("long").alias("canonical")
    )
