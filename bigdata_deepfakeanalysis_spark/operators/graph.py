"""Iterative graph analytics: fixed-point PageRank (M11d extension).

Web-corpus pipelines rank crawl hosts by link centrality as a quality
prior (the CCNet/Common-Crawl filtering family); the engine's graph
here is the customer↔supplier co-purchase bipartite graph derived from
``lineitem ⋈ orders`` — same algorithm, engine-checkable fixture.

Cross-engine exactness: float PageRank never hash-matches across
engines (summation order), so ranks are FIXED-POINT BIGINT —
``r0 = 2^20``; each round is ``r' = (15·2^20) DIV 100 + (85·Σ
(r_j DIV outdeg_j)) DIV 100`` with truncating integer division
(Spark ``DIV`` ≡ DuckDB ``//`` on positives) and a FIXED iteration
count, so every intermediate is an exact integer in both engines.
Bound: Σ contribs ≤ N·2^20 ≈ 2^31, ×85 ≈ 2^38 — no int64 overflow.

Scale design (the Pregel shape on DataFrames): edges are built once
and ``localCheckpoint``-ed; every superstep is contribs = edges ⋈
ranks (shuffle on dst) → hash-agg → rank update, i.e. one narrow
shuffle per iteration with partial aggregation map-side — identical to
GraphX's Pregel but without leaving the DataFrame planner. Lineage is
checkpoint-truncated per round (same rationale as
``dedup.connected_components``: cached plans re-analyze compounding
lineage). At 100 TB, pre-partition edges and ranks on the node key so
the per-round join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_SCALE = 1 << 20
_BASE = (15 * _SCALE) // 100  # (1-d) mass per node, d = 0.85
_ITERS = 3


def pagerank_fixed(edges: DataFrame, iters: int = _ITERS) -> DataFrame:
    """Fixed-point PageRank over directed (src, dst) BIGINT edges.
    Returns (id, rank) with rank an exact fixed-point BIGINT.

    Checkpoints are LAZY (eager=False): they still truncate the
    logical plan per superstep (the Catalyst re-analysis cost that
    motivates checkpointing — see ``dedup.connected_components``), but
    materialization defers to the single final action instead of one
    job per round. Unlike components, PageRank has NO per-round driver
    decision (fixed iteration count), so nothing needs the intermediate
    results early — measured 2-3× end-to-end vs eager."""
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).localCheckpoint(eager=False)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        edges.select("src")
        .unionByName(edges.select(F.col("dst").alias("src")))
        .distinct()
        .withColumnRenamed("src", "id")
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(_SCALE).cast("long"))
    for _ in range(iters):
        contribs = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("rank DIV outdeg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(_BASE)
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def _oracle_iter(prev: str, out: str) -> str:
    return f"""
    {out} AS (
        SELECT n.id,
               CAST({_BASE} + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)
                   AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS id, SUM(r.rank // d.outdeg) AS s
            FROM edges e
            JOIN outdeg d ON e.src = d.src
            JOIN {prev} r ON e.src = r.id
            GROUP BY e.dst) s ON n.id = s.id)"""


@query(
    "q_pagerank_copurchase",
    f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    r0 AS (SELECT id, CAST({_SCALE} AS BIGINT) AS rank FROM nodes),
    {_oracle_iter("r0", "r1")},
    {_oracle_iter("r1", "r2")},
    {_oracle_iter("r2", "r3")}
    SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           CAST(id // 2 AS BIGINT) AS node_key,
           rank AS rank_fp
    FROM r3 ORDER BY rank_fp DESC, node_type, node_key LIMIT 20
    """,
)
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customer/supplier nodes by fixed-point PageRank over the
    undirected co-purchase graph (edge per distinct customer↔supplier
    trading pair). 3 supersteps — enough for rank mass to cross the
    bipartite graph twice; the count is part of the operator contract
    (the oracle unrolls the same 3 rounds)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    pairs = (
        li.select("l_orderkey", "l_suppkey")
        .join(
            o.select("o_orderkey", "o_custkey"),
            li.l_orderkey == o.o_orderkey,
        )
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank_fixed(edges)
    return (
        ranks.select(
            F.when(F.col("id") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("node_type"),
            F.expr("id DIV 2").alias("node_key"),
            F.col("rank").alias("rank_fp"),
        )
        .orderBy(F.desc("rank_fp"), "node_type", "node_key")
        .limit(20)
    )
