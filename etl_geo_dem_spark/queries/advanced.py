"""Advanced operators: iterative fixpoint (recursive-CTE analog) and the
sanctioned vectorized-Python path.

- SURVEY §2.3 J6: the reference's `WITH RECURSIVE connected_features`
  transitive-closure join (`pipeline_transform_sea_level.py:410-530`). Spark
  has no recursive CTE; the engine expresses it as an iterative DataFrame loop
  to a fixpoint — checked against DuckDB's real recursive CTE.
- SURVEY §2.10 P1/P2: per-row Python is banned; the sanctioned slow path is an
  Arrow-batched pandas UDF — proven equal to native expressions by the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_geo_dem_spark.queries.registry import register, t


def _cooccurrence_edges(ev):
    """Undirected edges between users with events within 5 s of each other.

    Blocked range join: a bare (ua < ub AND |ta−tb| ≤ 5s) predicate has no
    equi key, so Spark plans a nested-loop/cartesian join — O(n²) comparisons
    (hung >9 min at sf0.1's 100k events). Two timestamps within 5 s must fall
    in the same or adjacent floor(t/5s) buckets, so the a-side explodes into
    its bucket ±1 and the join becomes equi-on-bucket with the exact range as
    a residual — identical output (final .distinct() absorbs multi-bucket
    matches), shuffle driven by the bucket key. Same plan shape as
    join_neighbourhood_window (J9) and the standard interval-join blocking."""
    # ts is TIMESTAMP_NTZ in the driver parquet; route through TIMESTAMP (UTC
    # session) to get fractional epoch seconds
    sec = F.col("ts").cast("timestamp").cast("double")
    e = ev.select("user_id", "ts", F.floor(sec / 5).cast("long").alias("bk"))
    a = e.select(
        F.col("user_id").alias("ua"),
        F.col("ts").alias("ta"),
        F.explode(
            F.array(F.col("bk") - 1, F.col("bk"), F.col("bk") + 1)
        ).alias("bk"),
    )
    b = e.select(F.col("user_id").alias("ub"), F.col("ts").alias("tb"), "bk")
    pairs = a.join(b, "bk").filter(
        (F.col("ua") < F.col("ub"))
        & (F.col("tb") >= F.col("ta") - F.expr("INTERVAL 5 SECONDS"))
        & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 5 SECONDS"))
    )
    return pairs.select("ua", "ub").distinct()


@register(
    "graph_connected_components",
    oracle="""
WITH RECURSIVE
edges AS (
  SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
  FROM events a JOIN events b
    ON a.user_id < b.user_id
   AND b.ts BETWEEN a.ts - INTERVAL 5 SECOND AND a.ts + INTERVAL 5 SECOND
),
sym AS (
  SELECT ua, ub FROM edges UNION SELECT ub, ua FROM edges
),
walk(node, label) AS (
  SELECT DISTINCT user_id, user_id FROM events
  UNION
  SELECT s.ub, w.label FROM walk w JOIN sym s ON s.ua = w.node
)
SELECT component, count(*) AS n_members
FROM (SELECT node, min(label) AS component FROM walk GROUP BY node)
GROUP BY component
""",
    tags=("graph", "J6", "iterative"),
)
def graph_connected_components(spark, sf_dir):
    """Connected components by iterative min-label propagation to a fixpoint —
    the engine's expression of the reference's recursive CTE (J6) and of
    `measure.label` region grouping (A5, `pixel_conectedness.py:47-138`).

    The loop is driver-controlled but every iteration is a distributed join;
    iteration count is O(graph diameter). At 100 TB you'd switch to the
    large-star/small-star algorithm (same loop shape, O(log²) rounds) —
    implemented as `zz_graph_cc_two_phase` and oracle-proven identical."""
    ev = t(spark, sf_dir, "events")
    edges = _cooccurrence_edges(ev)
    sym = edges.unionByName(
        edges.select(F.col("ub").alias("ua"), F.col("ua").alias("ub"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)  # edges reused every iteration
    labels = (
        ev.select(F.col("user_id").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(30):  # diameter bound; converges long before
        nbr_min = (
            sym.join(labels, sym.ua == labels.node)
            .groupBy(F.col("ub").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.node2, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            # truncate lineage each round: without this, iteration k replays
            # the full history of joins (plan depth grows linearly, work
            # quadratically — measured: times out where checkpointed converges
            # in seconds)
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


def _star_round(sym, large: bool):
    """One star operation over a SYMMETRIC edge list (u, v).

    m(u) = min(u ∪ N(u)). large-star hangs every strictly-larger neighbor
    under m(u); small-star hangs every ≤-neighbor and u itself under m(u).
    Both preserve connectivity and strictly reduce tree height (Kiveris et
    al., "Connected Components in MapReduce and Beyond" — public algorithm)."""
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
    )
    joined = sym.join(m, "u")
    if large:
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
    else:
        out = (
            joined.filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
    return out.filter(F.col("a") != F.col("b")).distinct()


@register(
    "zz_graph_cc_two_phase",
    oracle="""
WITH RECURSIVE
edges AS (
  SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
  FROM events a JOIN events b
    ON a.user_id < b.user_id
   AND b.ts BETWEEN a.ts - INTERVAL 5 SECOND AND a.ts + INTERVAL 5 SECOND
),
sym AS (
  SELECT ua, ub FROM edges UNION SELECT ub, ua FROM edges
),
walk(node, label) AS (
  SELECT DISTINCT user_id, user_id FROM events
  UNION
  SELECT s.ub, w.label FROM walk w JOIN sym s ON s.ua = w.node
)
SELECT component, count(*) AS n_members
FROM (SELECT node, min(label) AS component FROM walk GROUP BY node)
GROUP BY component
""",
    tags=("graph", "J6", "iterative", "twophase"),
)
def graph_cc_two_phase(spark, sf_dir):
    """Connected components by alternating LARGE-STAR / SMALL-STAR rounds —
    the 100 TB upgrade of `graph_connected_components`: convergence in
    O(log² n) rounds independent of graph DIAMETER (min-label propagation
    needs O(diameter) rounds — a 10^6-hop chain means 10^6 shuffles; this
    needs ~40), every round two map-side-combining groupBys + an equi join.
    The DuckDB recursive-CTE oracle proves both variants produce identical
    component minima and sizes.

    Convergence detection is O(1) metadata per round: (edge count, sum of
    per-edge hashes) — an unchanged star forest is the fixpoint, at which
    every non-root points DIRECTLY at its component's minimum node."""
    ev = t(spark, sf_dir, "events")
    edges = _cooccurrence_edges(ev)
    cur = edges.select(F.col("ua").alias("a"), F.col("ub").alias("b")).localCheckpoint(
        eager=True
    )
    sig_prev = None
    converged = False
    MAX_ROUNDS = 40  # O(log² n) bound; small graphs converge in ~3
    for _ in range(MAX_ROUNDS):
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct().select(F.col("a").alias("u"), F.col("b").alias("v"))
        after_large = _star_round(sym, large=True)
        sym2 = after_large.unionByName(
            after_large.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct().select(F.col("a").alias("u"), F.col("b").alias("v"))
        cur = _star_round(sym2, large=False).localCheckpoint(eager=True)
        sig = cur.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows under
            # ANSI arithmetic; decimal(38,0) holds ~1e19 hashes loss-free
            F.sum(F.xxhash64(F.col("a"), F.col("b")).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == sig_prev:
            converged = True
            break
        sig_prev = sig
    if not converged:
        # labeling a NON-star forest as if converged would silently fragment
        # components — fail loudly instead (the O(log² n) theory bound makes
        # this unreachable below astronomically large graphs; hitting it means
        # a bug, not a big input)
        raise RuntimeError(
            f"two-phase connected components did not reach a fixpoint in "
            f"{MAX_ROUNDS} rounds"
        )
    # at the fixpoint cur is a star forest: (node → component min). Roots and
    # isolated nodes never appear on the a-side — they label themselves.
    nodes = ev.select(F.col("user_id").alias("node")).distinct()
    labels = nodes.join(
        cur.select(F.col("a").alias("node"), F.col("b").alias("label")), "node", "left"
    ).select("node", F.coalesce("label", "node").alias("label"))
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@register(
    "udf_vectorized_normalize",
    oracle="""
SELECT doc_id,
       length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS norm_len,
       substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), 1, 30) AS norm_head
FROM documents
""",
    tags=("udf", "P1", "P2", "pandas_udf"),
)
def udf_vectorized_normalize(spark, sf_dir):
    """Text normalization through an Arrow-batched pandas UDF — the engine's
    replacement for the reference's per-row `df[col].apply(...)`
    (`pipeline_transform_sea_level.py:1781-1783`, P1; BASELINE forbids per-row
    Python). The DuckDB oracle computes the same result with native SQL,
    proving the vectorized kernel's semantics."""

    @F.pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)

    d = t(spark, sf_dir, "documents")
    norm = d.select("doc_id", normalize("text").alias("nt"))
    return norm.select(
        "doc_id",
        F.length("nt").cast("long").alias("norm_len"),
        F.substring("nt", 1, 30).alias("norm_head"),
    )
