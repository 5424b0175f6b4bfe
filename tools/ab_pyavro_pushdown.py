#!/usr/bin/env python
"""Interleaved A/B: pyavro filter pushdown ON vs OFF.

Quantifies the r9 claim that pushed filters drop rows during block
decode, BEFORE the worker->JVM Arrow transfer. Stages a ~600k-row
avro dataset from sf0.1 lineitem (4 scalar columns), then times the
same selective aggregate with option pushdown=true / false,
interleaved within one session so co-tenant host drift cancels
(the phantom-host lesson: cross-run comparisons on this machine are
noise; same-session interleaved ratios are signal).

Usage: python tools/ab_pyavro_pushdown.py [rounds]
Prints one JSON line with min-of-N per arm and the ratio.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    from pyspark.sql import SparkSession, functions as F

    from bigdata_deepfakeanalysis_spark import session
    from bigdata_deepfakeanalysis_spark.operators.avro_lite import (
        make_pyavro_datasource,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session.tune(
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ab-pyavro-pushdown")
        .getOrCreate()
    )
    spark.dataSource.register(make_pyavro_datasource(spark))

    stage = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"ab_pyavro_{os.getpid()}"
    )
    (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            F.col("l_returnflag"),
        )
        .write.format("pyavro")
        .mode("overwrite")
        .save(stage)
    )

    # ~2% selectivity: pushdown ON transfers ~2% of rows to the JVM,
    # OFF transfers all of them and filters post-scan.
    def run(pushdown: str) -> float:
        t0 = time.monotonic()
        (
            spark.read.format("pyavro")
            .option("pushdown", pushdown)
            .load(stage)
            .where("l_quantity > 49.0 AND l_returnflag = 'R'")
            .agg(
                F.count("l_orderkey").alias("n"),
                F.sum("l_extendedprice").alias("s"),
            )
            .collect()
        )
        return time.monotonic() - t0

    run("true")  # warm-up: JVM + codegen + page cache
    on, off = [], []
    for _ in range(ROUNDS):  # interleaved arms
        on.append(run("true"))
        off.append(run("false"))
    best_on, best_off = min(on), min(off)
    print(
        json.dumps(
            {
                "metric": "pyavro_pushdown_ab",
                "sf_dir": SF_DIR,
                "rounds": ROUNDS,
                "pushdown_on_sec": round(best_on, 3),
                "pushdown_off_sec": round(best_off, 3),
                "speedup": round(best_off / best_on, 3),
                "on_all": [round(t, 3) for t in on],
                "off_all": [round(t, 3) for t in off],
            }
        )
    )
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
