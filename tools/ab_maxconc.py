# exec(open('tools/ab_maxconc.py').read()) — A/B old join-back argmax vs
# new same-partition window-max for q_max_concurrency. Requires the REPL
# to still hold the PRE-edit module (old form) in qs['q_max_concurrency'].
import time as _time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_deepfakeanalysis_spark.catalog import table


def maxconc_new(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    iv = orders.select(
        F.col("o_orderpriority").alias("lane"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.expr(
            "date_add(CAST(o_orderdate AS DATE),"
            " CAST((o_orderkey % 30) + 1 AS INT))"
        ).alias("e"),
    )
    ev = iv.select("lane", F.col("s").alias("t"), F.lit(1).alias("delta")) \
        .unionAll(
            iv.select("lane", F.col("e").alias("t"), F.lit(-1).alias("delta"))
        )
    swept = ev.select(
        "lane",
        "t",
        F.expr(
            "SUM(delta) OVER (PARTITION BY lane ORDER BY t, delta"
            " ROWS UNBOUNDED PRECEDING)"
        ).alias("open_now"),
    ).withColumn(
        "max_open", F.max("open_now").over(Window.partitionBy("lane"))
    )
    return (
        swept.where(F.col("open_now") == F.col("max_open"))
        .groupBy("lane", "max_open")
        .agg(F.date_format(F.min("t"), "yyyy-MM-dd").alias("first_peak_date"))
        .select(
            "lane",
            F.col("max_open").cast("bigint").alias("max_open"),
            "first_peak_date",
        )
        .orderBy("lane")
    )


def run_maxconc_ab(spark, sf_dir, qs):
    old = qs["q_max_concurrency"]
    a = [tuple(r) for r in old(spark, sf_dir).collect()]
    b = [tuple(r) for r in maxconc_new(spark, sf_dir).collect()]
    print("RESULT_EQ", a == b, a[:2])
    for _ in range(3):
        for label, fn in (("A joinback", old),
                          ("B winmax  ", lambda s, d: maxconc_new(s, d))):
            t0 = _time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(label, round(_time.time() - t0, 3))
    print("MAXCONC_DONE")
