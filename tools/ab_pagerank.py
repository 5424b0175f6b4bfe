# exec(open('tools/ab_pagerank.py').read()) in the profile REPL.
# A/B: per-superstep lazy localCheckpoint (status quo) vs checkpoint-free
# unrolled iteration (single deep plan, one execution) for pagerank.
from pyspark.sql import functions as F

from bigdata_deepfakeanalysis_spark.operators.graph import (
    _BASE,
    _SCALE,
    pagerank_fixed,
)
from bigdata_deepfakeanalysis_spark.catalog import table


def _edges(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    pairs = (
        li.select("l_orderkey", "l_suppkey")
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select((F.col("o_custkey") * 2).alias("c"),
                (F.col("l_suppkey") * 2 + 1).alias("s"))
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def pagerank_nockpt(edges, iters=3):
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).localCheckpoint(eager=False)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_w = edges.join(outdeg, "src").localCheckpoint(eager=False)
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
            edges_w.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"),
                    F.expr("rank DIV outdeg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (F.lit(_BASE)
             + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100"))
            .cast("long")
            .alias("rank"),
        )
    return ranks


def run_ab(spark, sf_dir, tfn):
    ra = sorted(pagerank_fixed(_edges(spark, sf_dir)).collect())
    rb = sorted(pagerank_nockpt(_edges(spark, sf_dir)).collect())
    print("RESULT_EQ", ra == rb, len(ra), len(rb))
    for _ in range(3):
        tfn(lambda: pagerank_fixed(_edges(spark, sf_dir)), runs=1,
            label="A ckpt   ")
        tfn(lambda: pagerank_nockpt(_edges(spark, sf_dir)), runs=1,
            label="B nockpt ")
    print("AB_DONE")
