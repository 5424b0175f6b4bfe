# python tools/ab_topk_preagg.py [--rounds 3]
#
# r13 task 6 (VERDICT r12): q_topk_grouping_sets pushes 3x the joined
# fact rows through Expand -> partial agg -> one wide Exchange. The
# base join is already all-broadcast (lineitem never shuffles), so the
# remaining lever is the Expand itself: pre-aggregate the joined fact
# to the FINEST grain (yr, nk, pk) once, then derive the (pk) grain by
# re-aggregating the finest cells — exact, because the qty partials
# ride as DECIMAL(18,2) sums (re-SUM is exact integer arithmetic) and
# n re-aggregates as SUM of counts. The gid=1 (yr, pk) grain is NOT
# built: the declared filter discards it, and it ranks in its own
# window partitions, so omitting it is row-identical (r12 proved the
# 352-row equality; this harness re-asserts it).
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def topk_expand(spark, sf_dir):
    """The pre-r13 registered form: 3-grain GROUPING SETS Expand
    (inlined verbatim here after the registry switched to preagg)."""
    from pyspark.sql.window import Window
    from bigdata_deepfakeanalysis_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = (
        li.select("l_orderkey", "l_partkey", "l_quantity")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            c.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.expr("CAST(date_format(o_orderdate, 'yyyy') AS INT)").alias(
                "yr"
            ),
            F.col("c_nationkey").alias("nk"),
            F.col("l_partkey").alias("pk"),
            F.col("l_quantity").alias("qty"),
        )
    )
    cells = base.groupingSets(
        [["yr", "nk", "pk"], ["yr", "pk"], ["pk"]], "yr", "nk", "pk"
    ).agg(
        F.expr("GROUPING(yr) * 2 + GROUPING(nk)").alias("gid"),
        F.expr(
            "CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("qty_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("gid", "yr", "nk").orderBy(
        F.desc("qty_sum"), "pk"
    )
    return (
        cells.withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") <= 2) & (F.col("gid") != 1))
        .select(
            F.col("gid").cast("int"),
            F.coalesce("yr", F.lit(-1)).cast("int").alias("yr"),
            F.coalesce("nk", F.lit(-1)).cast("int").alias("nationkey"),
            F.col("pk").cast("bigint").alias("partkey"),
            "qty_sum",
            F.col("n").cast("bigint").alias("n_lines"),
            F.col("rk").cast("int"),
        )
        .orderBy("gid", "yr", "nationkey", "rk")
    )


def topk_preagg(spark, sf_dir):
    from pyspark.sql.window import Window
    from bigdata_deepfakeanalysis_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = (
        li.select("l_orderkey", "l_partkey", "l_quantity")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            c.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.expr("CAST(date_format(o_orderdate, 'yyyy') AS INT)").alias(
                "yr"
            ),
            F.col("c_nationkey").alias("nk"),
            F.col("l_partkey").alias("pk"),
            F.col("l_quantity").alias("qty"),
        )
    )
    fine = base.groupBy("yr", "nk", "pk").agg(
        F.expr("SUM(CAST(qty AS DECIMAL(18,2)))").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    g0 = fine.select(
        F.lit(0).alias("gid"), "yr", "nk", "pk", "s", "n"
    )
    g3 = (
        fine.groupBy("pk")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .select(
            F.lit(3).alias("gid"),
            F.lit(None).cast("int").alias("yr"),
            F.lit(None).cast("int").alias("nk"),
            "pk",
            "s",
            "n",
        )
    )
    cells = g0.unionByName(g3).select(
        "gid", "yr", "nk", "pk",
        F.expr("CAST(s AS DOUBLE)").alias("qty_sum"),
        "n",
    )
    w = Window.partitionBy("gid", "yr", "nk").orderBy(
        F.desc("qty_sum"), "pk"
    )
    return (
        cells.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select(
            F.col("gid").cast("int"),
            F.coalesce("yr", F.lit(-1)).cast("int").alias("yr"),
            F.coalesce("nk", F.lit(-1)).cast("int").alias("nationkey"),
            F.col("pk").cast("bigint").alias("partkey"),
            "qty_sum",
            F.col("n").cast("bigint").alias("n_lines"),
            F.col("rk").cast("int"),
        )
        .orderBy("gid", "yr", "nationkey", "rk")
    )


def main() -> int:
    rounds = 3
    sf_dir = "/root/testdata/sf0.1"
    argv = iter(sys.argv[1:])
    for a in argv:
        if a == "--rounds":
            rounds = int(next(argv))
        elif a == "--sf1":
            from tools.stage_sf1 import sf1_dir

            p = sf1_dir()
            assert (p / ".complete").exists(), "stage sf1 first"
            sf_dir = str(p)

    from bigdata_deepfakeanalysis_spark.session import tune
    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune(spark)
    for t in ("lineitem", "orders", "customer"):
        table(spark, sf_dir, t).cache().count()
    qs = all_queries()

    a_rows = [tuple(r) for r in topk_expand(spark, sf_dir).collect()]
    b_rows = [tuple(r) for r in topk_preagg(spark, sf_dir).collect()]
    print("rows equal:", a_rows == b_rows, len(a_rows), len(b_rows))
    assert a_rows == b_rows

    ta, tb = [], []
    for i in range(rounds):
        t0 = time.time()
        topk_expand(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ta.append(round(time.time() - t0, 3))
        t0 = time.time()
        topk_preagg(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        tb.append(round(time.time() - t0, 3))
        print(f"round {i}: expand {ta[-1]}  preagg {tb[-1]}", flush=True)
    print(
        f"RESULT expand(min={min(ta)}, all={ta})"
        f" preagg(min={min(tb)}, all={tb})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
