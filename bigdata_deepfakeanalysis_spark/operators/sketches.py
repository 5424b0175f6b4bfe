"""Mergeable-sketch operators — count-min-sketch heavy hitters and
HyperLogLog cardinality.

The 100 TB story: a CMS is a tiny (d×w) grid of counters that
partial-aggregates map-side and merges associatively, so frequency
estimation over an arbitrarily large token stream costs ONE narrow
shuffle of d·w rows — the raw stream never moves. Estimates
overcount (never undercount): est(t) = min over d rows of the
counter each seeded hash lands t in.

Engine-exactness: the hash is md5-prefix → int (identical in Spark
via ``conv(substr(md5(..),1,8),16,10)`` and DuckDB via
``('0x' || substr(md5(..),1,8))::BIGINT``), so both engines build
bit-identical sketches — the oracle replays the exact construction.

No reference counterpart (the reference is image-only); CMS follows
Cormode & Muthukrishnan (2005).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .text import _TOKS, _TOKS_SQL

_D = 4      # hash rows
_W = 256    # buckets per row


def _bucket(term_expr: str, r: int) -> str:
    """Spark SQL: seeded CMS bucket of a term."""
    return (
        f"CAST(conv(substr(md5(concat('{r}', '|', {term_expr})), 1, 8),"
        f" 16, 10) AS BIGINT) % {_W}"
    )


def _bucket_sql(term_expr: str, r: int) -> str:
    """DuckDB: the identical bucket derivation."""
    return (
        f"(('0x' || substr(md5('{r}' || '|' || {term_expr}), 1, 8))::BIGINT)"
        f" % {_W}"
    )


@query(
    "q_cms_heavy_hitters",
    f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    terms AS (SELECT UNNEST(toks) AS term FROM toks),
    hashed AS (
        SELECT term,
               {", ".join(f"{_bucket_sql('term', r)} AS b{r}" for r in range(1, _D + 1))}
        FROM terms),
    sketch AS (
        {" UNION ALL ".join(
            f"SELECT {r} AS r, b{r} AS bucket, COUNT(*) AS cnt"
            f" FROM hashed GROUP BY b{r}" for r in range(1, _D + 1))}),
    truth AS (SELECT term, COUNT(*) AS true_cnt FROM terms GROUP BY term),
    cand AS (
        SELECT DISTINCT term,
               {", ".join(f"{_bucket_sql('term', r)} AS b{r}" for r in range(1, _D + 1))}
        FROM terms),
    probes AS (
        {" UNION ALL ".join(
            f"SELECT term, {r} AS r, b{r} AS bucket FROM cand"
            for r in range(1, _D + 1))}),
    est AS (
        SELECT p.term, MIN(s.cnt) AS cms_est
        FROM probes p JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
        GROUP BY p.term)
    SELECT e.term, t.true_cnt, CAST(e.cms_est AS BIGINT) AS cms_est
    FROM est e JOIN truth t ON e.term = t.term
    ORDER BY cms_est DESC, e.term
    LIMIT 10
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the document token stream:
    build a {_D}×{_W} CMS, probe every candidate term, report the
    top-10 by estimate next to the exact count (est ≥ truth always —
    tested). The exact-count branch exists only for the diagnostic
    comparison; the production path is sketch build + probe.

    100 TB design: the sketch build is ONE pass — the d bucket ids are
    row-local md5 expressions, the posexplode is a flatMap, and the
    groupBy partial-aggregates each partition down to ≤ d·w rows
    before the only (tiny) shuffle. Probing joins candidates against
    the broadcast 1024-row sketch."""
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(F.expr(_TOKS)).alias("term"))
    buckets = F.array(
        *[F.expr(_bucket("term", r)) for r in range(1, _D + 1)]
    )
    sketch = (
        terms.select(F.posexplode(buckets).alias("pos", "bucket"))
        .select((F.col("pos") + 1).alias("r"), "bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    truth = terms.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = (
        terms.distinct()
        .select("term", F.posexplode(buckets).alias("pos", "bucket"))
        .select("term", (F.col("pos") + 1).alias("r"), "bucket")
    )
    est = (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("term")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
    )
    return (
        est.join(truth, "term")
        .select("term", "true_cnt", "cms_est")
        .orderBy(F.desc("cms_est"), "term")
        .limit(10)
    )


@query("q_hll_distinct_merge")  # rows-only: sketch registers are engine-local
def q_hll_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog cardinality (Apache DataSketches HLL via
    Spark 3.5+'s ``hll_sketch_agg`` / ``hll_union_agg``): per-shard
    sketches of the ordering-customer stream union into the global
    estimate without re-touching a single row — THE 100 TB
    distinct-count idiom (count-distinct per day/shard once, merge
    registers forever after; a re-aggregation is a register-wise MAX of
    KB-sized states, not a second corpus pass).

    Output: one row per ``o_orderpriority`` shard plus ``global_direct``
    (one sketch over the whole stream) and ``global_union`` (union of
    the shard sketches). In dense HLL mode merge is lossless
    (register-wise max commutes with stream concatenation); below the
    sparse→dense threshold the union gadget promotes to dense HLL_8,
    so the two global estimates may differ by a fraction of the
    configured error (measured 1492 vs 1488 on 1500 true uniques at
    lgConfigK=12) — tests assert both within rel_err ≤ 5% and within
    1% of each other.

    Rows-only by design: DuckDB's approx_count_distinct is a different
    HLL implementation, so estimates aren't cross-engine comparable —
    the ``exact`` column and the pytest invariants carry the check.
    No reference counterpart (the reference is image-only); sketch
    semantics follow Flajolet et al. (2007) / Apache DataSketches.
    """
    orders = table(spark, sf_dir, "orders")
    lg_k = 12
    per = orders.groupBy(F.col("o_orderpriority").alias("shard")).agg(
        F.hll_sketch_agg("o_custkey", lg_k).alias("sk"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    shard_rows = per.select(
        F.concat(F.lit("shard:"), "shard").alias("scope"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("hll_est"),
        "exact",
    )
    # global exact: NOT the sum of shard exacts — a customer orders
    # under several priorities, which is exactly why the merge story
    # needs HLL (register max) and not a counter sum
    g_exact = orders.agg(F.countDistinct("o_custkey").alias("exact"))
    g_direct = (
        orders.agg(F.hll_sketch_agg("o_custkey", lg_k).alias("sk"))
        .select(
            F.lit("global_direct").alias("scope"),
            F.hll_sketch_estimate("sk").cast("bigint").alias("hll_est"),
        )
        .crossJoin(g_exact)
    )
    g_union = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("global_union").alias("scope"),
            F.hll_sketch_estimate("sk").cast("bigint").alias("hll_est"),
        )
        .crossJoin(g_exact)
    )
    return (
        shard_rows.unionByName(g_direct)
        .unionByName(g_union)
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("hll_est") - F.col("exact")) / F.col("exact"), 6
            ),
        )
        .orderBy("scope")
    )


@query("q_approx_quantile_profile")  # rows-only: GK sketch is engine-local
def q_approx_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles (``percentile_approx``,
    Greenwald-Khanna sketch, accuracy=1000): per-returnflag p50/p95/p99
    tail-latency-style profile next to the exact interpolated values.

    The 100 TB story (same as CMS/HLL): the GK summary partial-
    aggregates map-side and merges associatively, so a quantile profile
    over an arbitrarily large column is ONE narrow shuffle of KB-sized
    summaries — where the exact ``percentile`` must materialize and
    sort every group's values. Guarantee: rank error ≤ n/accuracy
    (asserted per group and per p in tests).

    Rows-only by design: the sketch's retained-sample choice is
    engine-local (DuckDB's approx_quantile is T-Digest — different
    summary, different tie-breaks); the exact columns and the pytest
    rank-error bound carry the check."""
    li = table(spark, sf_dir, "lineitem")
    ps = "array(0.50D, 0.95D, 0.99D)"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                f"percentile_approx(l_extendedprice, {ps}, 1000)"
            ).alias("qa"),
            F.expr(f"percentile(l_extendedprice, {ps})").alias("qe"),
        )
        .select(
            "l_returnflag",
            "n",
            F.element_at("qa", 1).alias("p50_approx"),
            F.element_at("qa", 2).alias("p95_approx"),
            F.element_at("qa", 3).alias("p99_approx"),
            F.round(F.element_at("qe", 1), 9).alias("p50_exact"),
            F.round(F.element_at("qe", 2), 9).alias("p95_exact"),
            F.round(F.element_at("qe", 3), 9).alias("p99_exact"),
        )
        .orderBy("l_returnflag")
    )
