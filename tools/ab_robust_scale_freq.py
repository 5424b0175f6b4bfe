# python tools/ab_robust_scale_freq.py [--sf1] [--rounds 3]
#
# r13 task 4 (grouped percentile family): q_robust_scale's SECOND pass
# (clamp + checksum aggregate) still scans RAW lineitem joined to the
# broadcast stats, while its r6 siblings (winsorized, mad) run every
# pass off the distinct (flag, price, freq) table. Freq-form pass 2:
#   n          = SUM(freq)
#   n_beyond   = SUM(freq) FILTER |z| > 0.8
#   z_checksum = CAST(SUM(CAST(z AS DECIMAL(18,9)) * freq) AS DOUBLE)
# Exact: equal prices give identical z, and DECIMAL(18,9) * BIGINT is
# exact integer arithmetic, so d*freq == d+d+...+d bit-for-bit. The
# pc subtree then appears in BOTH passes and ReusedExchange shares it.
# At sf0.1 prices are ~unique (583k distinct / 600k rows) so the row
# reduction is nil — the sf1 arm (6M rows -> 583k distinct) is where
# the freq form pays, same as the r6 evidence for its siblings.
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def robust_scale_freq(spark, sf_dir):
    from bigdata_deepfakeanalysis_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    price_counts = li.groupBy(
        F.col("l_returnflag").alias("flag"), "l_extendedprice"
    ).agg(F.count(F.lit(1)).alias("freq"))
    stats = (
        price_counts.groupBy("flag")
        .agg(
            F.expr(
                "percentile(l_extendedprice,"
                " array(0.25D, 0.5D, 0.75D), freq)"
            ).alias("qs")
        )
        .select(
            "flag",
            F.round(F.element_at("qs", 2), 9).alias("med"),
            (
                F.round(F.element_at("qs", 3), 9)
                - F.round(F.element_at("qs", 1), 9)
            ).alias("iqr"),
        )
    )
    scaled = price_counts.withColumnRenamed("flag", "l_returnflag").join(
        F.broadcast(stats), F.col("l_returnflag") == F.col("flag")
    ).withColumn(
        "z", (F.col("l_extendedprice") - F.col("med")) / F.col("iqr")
    )
    return (
        scaled.groupBy("l_returnflag", "med", "iqr")
        .agg(
            F.sum("freq").cast("bigint").alias("n"),
            F.sum(F.when(F.abs(F.col("z")) > 0.8, F.col("freq")))
            .cast("bigint")
            .alias("n_beyond_08"),
            # freq is cast to DECIMAL(12,0), NOT left as BIGINT: a
            # DECIMAL(18,9) x DECIMAL(20,0) product needs precision 39,
            # and Spark resolves the overflow by CLIPPING THE SCALE
            # (drifts at ~1e-7); (18,9) x (12,0) -> (31,9) stays exact.
            F.expr(
                "CAST(SUM(CAST(z AS DECIMAL(18,9))"
                " * CAST(freq AS DECIMAL(12,0))) AS DOUBLE)"
            ).alias("z_checksum"),
        )
        .select(
            "l_returnflag", "med", "iqr", "n", "n_beyond_08", "z_checksum"
        )
        .orderBy("l_returnflag")
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
    table(spark, sf_dir, "lineitem").count()
    qs = all_queries()

    a_df = qs["q_robust_scale"](spark, sf_dir)
    b_df = robust_scale_freq(spark, sf_dir)
    a_rows = [tuple(r) for r in a_df.collect()]
    b_rows = [tuple(r) for r in b_df.collect()]
    print("rows equal:", a_rows == b_rows)
    assert a_rows == b_rows, (a_rows, b_rows)

    ta, tb = [], []
    for i in range(rounds):
        t0 = time.time()
        qs["q_robust_scale"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ta.append(round(time.time() - t0, 3))
        t0 = time.time()
        robust_scale_freq(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        tb.append(round(time.time() - t0, 3))
        print(f"round {i}: raw {ta[-1]}  freq {tb[-1]}", flush=True)
    print(
        f"RESULT sf_dir={sf_dir} raw(min={min(ta)}, all={ta})"
        f" freq(min={min(tb)}, all={tb})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
