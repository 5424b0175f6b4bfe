# exec(open('tools/ab_q2_window.py').read()) — A/B: q2's decorrelated
# floor (groupBy-min + self-join back, bridge agg computed twice) vs a
# single window MIN over the same partitioning. Row identity first.
import time as _time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_deepfakeanalysis_spark.catalog import table as _table


def q2_window(spark, sf_dir):
    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part").where(
        (F.col("p_size") == 9) & (F.col("p_type") == "STANDARD")
    )
    supp = _table(spark, sf_dir, "supplier")
    nation = _table(spark, sf_dir, "nation")
    region = _table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    euro_cost = (
        cost.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        euro_cost.withColumn("min_cost", F.min("supply_cost").over(w))
        .where(F.col("supply_cost") == F.col("min_cost"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "s_suppkey",
            "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(100)
    )


def run_ab_q2(spark, sf_dir, qs):
    a = [tuple(r) for r in qs["q2_min_cost_supplier"](spark, sf_dir).collect()]
    b = [tuple(r) for r in q2_window(spark, sf_dir).collect()]
    print("rows", len(a), len(b), "IDENTICAL" if a == b else "MISMATCH")
    for label, thunk in [
        ("old", lambda: qs["q2_min_cost_supplier"](spark, sf_dir)),
        ("new", lambda: q2_window(spark, sf_dir)),
    ] * 3:
        t0 = _time.time()
        thunk().write.format("noop").mode("overwrite").save()
        print(label, round(_time.time() - t0, 2))
    print("AB_Q2_DONE")
