# exec(open('tools/ab_basket_pairs.py').read()) in the profile REPL.
# A/B: basket pair generation — b1-join-b2 on orderkey (status quo in
# q_frequent_pairs/q_itemitem_cf/q_frequent_triples/q_association_rules)
# vs one groupBy-to-array + row-local HOF pair explode (no self-join;
# one fewer exchange, no join build).
from pyspark.sql import functions as F

from bigdata_deepfakeanalysis_spark.catalog import table


def co_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    b = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    b1 = b.select("o", F.col("p").alias("pa"))
    b2 = b.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    return (
        b1.join(b2, (F.col("o") == F.col("o2")) & (F.col("pa") < F.col("pb")))
        .groupBy(F.col("pa").alias("p1"), F.col("pb").alias("p2"))
        .agg(F.count(F.lit(1)).alias("cij"))
    )


def co_basket(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("items"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) ->"
                " transform(slice(items, i + 2, size(items)),"
                " y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("pr")
    ).select("pr.p1", "pr.p2")
    return pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("cij"))


def run_ab(spark, sf_dir, tfn):
    a = {(r.p1, r.p2): r.cij for r in co_join(spark, sf_dir).collect()}
    b = {(r.p1, r.p2): r.cij for r in co_basket(spark, sf_dir).collect()}
    print("RESULT_EQ", a == b, len(a), len(b))
    for _ in range(3):
        tfn(lambda: co_join(spark, sf_dir), runs=1, label="A join   ")
        tfn(lambda: co_basket(spark, sf_dir), runs=1, label="B basket ")
    print("AB_DONE")
