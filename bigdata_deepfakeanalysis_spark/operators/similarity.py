"""Similarity search over embedding columns (SURVEY §2.8 M11).

Approximate-nearest-neighbor over ``embeddings.embedding``
(array<float>, 64-dim):

- brute-force cosine top-k (the exactness baseline; oracle-checked via
  decimal-exact dot products)
- LSH-bucketed variant (sign-random-projection buckets; the scale path:
  candidate set per query shrinks from N to N/2^bits)
- fast JVM path: ``zip_with`` dot product inside whole-stage codegen
  (rows-only check: its top-k set must agree with the exact path)

Scale design (100 TB): the query set is small → broadcast it against the
corpus scan (no shuffle on the corpus side); per-query top-k is a window
over the query id, which Spark executes as partial top-k map-side. The
LSH variant adds one narrow projection (bucket id per row, pure
expressions) and prunes the candidate join to matching buckets. At real
scale the bucket column is a partition key so probing is partition
pruning. Hyperplanes are md5-derived (deterministic, engine-agnostic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query

_DIM = 64
_N_PLANES = 4  # 16 buckets

# ---------------------------------------------------------------------------
# Engine ops
# ---------------------------------------------------------------------------

def dot_fast(a: Column, b: Column) -> Column:
    """JVM-side dot product: zip_with + aggregate, sequential fold —
    deterministic within Spark, no Python."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk_fast(
    corpus: DataFrame, queries_df: DataFrame, k: int
) -> DataFrame:
    """Broadcast the (small) query set against the corpus; exact cosine
    via zip_with; per-query top-k window."""
    q = queries_df.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c = corpus.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            (
                dot_fast(F.col("qvec"), F.col("cvec"))
                / (
                    F.sqrt(dot_fast(F.col("qvec"), F.col("qvec")))
                    * F.sqrt(dot_fast(F.col("cvec"), F.col("cvec")))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def hyperplane_sign(vec_sql: str, plane: int) -> Column:
    """Sign bit of dot(vec, r_plane) where r_plane[pos] = digit(md5) - 7.5
    — a deterministic pseudo-random hyperplane shared with the oracle.
    (SQL-lambda form: the index variable is only visible inside SQL.)"""
    return F.expr(
        f"CAST(aggregate(transform({vec_sql}, (x, i) -> CAST(x AS DOUBLE) *"
        f" (CAST(instr('0123456789abcdef', substr(md5(concat('{plane}', '|',"
        f" CAST(i AS STRING))), 1, 1)) AS DOUBLE) - 8.5)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0 AS INT)"
    )  # instr is 1-based: digit+1 - 8.5 == digit - 7.5


def lsh_bucket(vec_sql: str, n_planes: int = _N_PLANES) -> Column:
    """Pack sign bits of n_planes random projections into a bucket id."""
    b = F.lit(0)
    for p in range(n_planes):
        b = b + F.shiftleft(hyperplane_sign(vec_sql, p), p)
    return b


# ---------------------------------------------------------------------------
# Oracle-checked queries (decimal-exact formulation)
# ---------------------------------------------------------------------------

_CELLS_CTE = f"""
cells AS (
    SELECT vec_id, pos, CAST(embedding[pos + 1] AS DOUBLE) AS val
    FROM embeddings, (SELECT UNNEST(range(0, {_DIM})) AS pos)),
norms AS (
    SELECT vec_id,
           CAST(SUM(CAST(val AS DECIMAL(12,9)) * CAST(val AS DECIMAL(12,9)))
                AS DOUBLE) AS n2
    FROM cells GROUP BY vec_id)
"""


def dot_decimal(a: str, b: str) -> Column:
    """Decimal-exact dot product as a per-row higher-order fold —
    shuffle-free, bit-identical to the oracle's SUM over exploded
    decimal products (exact arithmetic is order-independent)."""
    return F.expr(
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) ->"
        f" CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(12,9))"
        f" * CAST(CAST(y AS DOUBLE) AS DECIMAL(12,9)) AS DECIMAL(38,18))),"
        f" CAST(0 AS DECIMAL(38,18)),"
        f" (acc, v) -> CAST(acc + v AS DECIMAL(38,18))) AS DOUBLE)"
    )


@query(
    "q_ann_cosine_topk",
    f"""
    WITH {_CELLS_CTE.strip()},
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               CAST(SUM(CAST(q.val AS DECIMAL(12,9))
                        * CAST(c.val AS DECIMAL(12,9))) AS DOUBLE) AS dot
        FROM cells q JOIN cells c
          ON q.pos = c.pos AND q.vec_id < 10 AND c.vec_id != q.vec_id
        GROUP BY q.vec_id, c.vec_id),
    scored AS (
        SELECT query_id, cand_id,
               ROUND(dot / (SQRT(nq.n2) * SQRT(nc.n2)), 9) AS cosine
        FROM dots
        JOIN norms nq ON query_id = nq.vec_id
        JOIN norms nc ON cand_id = nc.vec_id),
    ranked AS (
        SELECT query_id, cand_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, cand_id) AS rk
        FROM scored)
    SELECT query_id, cand_id, cosine, rk FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as queries —
    the ANN exactness baseline. Plan: one corpus scan, broadcast query
    set, per-row decimal HOF dot — no shuffle until the tiny top-k."""
    emb = table(spark, sf_dir, "embeddings")
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cvec"),
        dot_decimal("embedding", "embedding").alias("nc"),
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        dot_decimal("embedding", "embedding").alias("nq"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot_decimal("qvec", "cvec") / (F.sqrt("nq") * F.sqrt("nc")), 9
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .orderBy("query_id", "rk")
    )


_BUCKET_SQL = f"""
buckets AS (
    SELECT vec_id,
           CAST({" + ".join(
               f"(CASE WHEN (SELECT SUM(CAST(embedding[pos + 1] AS DOUBLE) * "
               f"(instr('0123456789abcdef', substr(md5('{p}' || '|' ||"
               f" CAST(pos AS VARCHAR)), 1, 1)) - 8.5)) "
               f"FROM (SELECT UNNEST(range(0, {_DIM})) AS pos)) > 0 "
               f"THEN {1 << p} ELSE 0 END)"
               for p in range(_N_PLANES)
           )} AS INTEGER) AS bucket
    FROM embeddings)
"""


@query(
    "q_ann_lsh_bucketed",
    f"""
    WITH {_CELLS_CTE.strip()},
    {_BUCKET_SQL.strip()},
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               CAST(SUM(CAST(qc.val AS DECIMAL(12,9))
                        * CAST(cc.val AS DECIMAL(12,9))) AS DOUBLE) AS dot
        FROM buckets q
        JOIN buckets c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
        JOIN cells qc ON qc.vec_id = q.vec_id
        JOIN cells cc ON cc.vec_id = c.vec_id AND cc.pos = qc.pos
        WHERE q.vec_id < 10
        GROUP BY q.vec_id, c.vec_id),
    scored AS (
        SELECT query_id, cand_id,
               ROUND(dot / (SQRT(nq.n2) * SQRT(nc.n2)), 9) AS cosine
        FROM dots
        JOIN norms nq ON query_id = nq.vec_id
        JOIN norms nc ON cand_id = nc.vec_id),
    ranked AS (
        SELECT query_id, cand_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, cand_id) AS rk
        FROM scored)
    SELECT query_id, cand_id, cosine, rk FROM ranked WHERE rk <= 3
    ORDER BY query_id, rk
    """,
)
def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: sign-random-projection buckets (4 planes → 16
    buckets) prune candidates to the query's own bucket; cosine top-3
    within bucket. The scale path for ANN at 100 TB — bucket id becomes
    a partition key and probing is partition pruning."""
    emb = table(spark, sf_dir, "embeddings")
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        lsh_bucket("embedding").alias("bucket"),
        F.col("embedding").alias("cvec"),
        dot_decimal("embedding", "embedding").alias("nc"),
    )
    q = (
        emb.where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            lsh_bucket("embedding").alias("bucket"),
            F.col("embedding").alias("qvec"),
            dot_decimal("embedding", "embedding").alias("nq"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot_decimal("qvec", "cvec") / (F.sqrt("nq") * F.sqrt("nc")), 9
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .orderBy("query_id", "rk")
    )


@query("q_ann_fast_consistency")  # rows-only: double-fold order is engine-local
def q_ann_fast_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast zip_with path vs decimal-exact path: per-query overlap of the
    two top-5 sets (must be 5 for every query — asserted in tests)."""
    emb = table(spark, sf_dir, "embeddings")
    fast = cosine_topk_fast(emb, emb.where(F.col("vec_id") < 10), 5).select(
        "query_id", "cand_id"
    )
    exact = q_ann_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    return (
        fast.join(exact, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .orderBy("query_id")
    )
