#!/usr/bin/env python
"""Interleaved A/B: kNN scoring — r9 codegen tile join (per-pair
zip_with/aggregate folds) vs the r11 Arrow cogroup BLAS kernel with
the margin-safe per-cell top-5 pre-cut.

Rebuilds BOTH forms from the same inputs in one tuned session and
times the full classifier chain to a noop sink, interleaved, so host
drift cancels. The old form is reconstructed inline (it no longer
exists in the package); both produce identical results (asserted on
the first run).

Usage: python tools/ab_knn_kernel.py [rounds] [--sf1 | --sf-dir DIR]
"""
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
args = iter(sys.argv[1:])
for a in args:
    if a == "--sf1":
        from tools.stage_sf1 import sf1_dir

        SF_DIR = str(sf1_dir())
    elif a == "--sf-dir":
        SF_DIR = next(args)
    else:
        ROUNDS = int(a)


def main():
    from pyspark.sql import SparkSession, Window, functions as F

    from bigdata_deepfakeanalysis_spark import session
    from bigdata_deepfakeanalysis_spark.catalog import table
    from bigdata_deepfakeanalysis_spark.operators.similarity import (
        _knn_tile_kernel,
        cosine_fixed,
        dot_fixed,
        quantize,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session.tune(
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ab-knn-kernel")
        .getOrCreate()
    )

    emb = table(spark, SF_DIR, "embeddings")
    emb.count()  # warm page cache
    parts = max(16, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    g = max(4, math.isqrt(parts))
    c = (
        emb.where(F.col("vec_id") % 10 != 0)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            quantize("embedding").alias("cq"),
        )
        .withColumn("nc", dot_fixed("cq", "cq"))
        .withColumn("tc", F.pmod(F.xxhash64("cand_id"), F.lit(g)).cast("int"))
        .withColumn("tq", F.explode(F.expr(f"sequence(0, {g - 1})")))
    )
    q = (
        emb.where(F.col("vec_id") % 10 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
            quantize("embedding").alias("qq"),
        )
        .withColumn("nq", dot_fixed("qq", "qq"))
        .withColumn("tq", F.pmod(F.xxhash64("query_id"), F.lit(g)).cast("int"))
        .withColumn("tc", F.explode(F.expr(f"sequence(0, {g - 1})")))
    )

    def finish(scored):
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), "cand_id"
        )
        nb = scored.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= 5
        )
        votes = nb.groupBy("query_id", "true_label", "cand_label").agg(
            F.count(F.lit(1)).alias("c")
        )
        wv = Window.partitionBy("query_id").orderBy(
            F.desc("c"), F.col("cand_label")
        )
        pred = (
            votes.withColumn("vr", F.row_number().over(wv))
            .where(F.col("vr") == 1)
            .select("query_id", "true_label", F.col("cand_label").alias("p"))
        )
        return (
            pred.withColumn(
                "hit", F.when(F.col("p") == F.col("true_label"), 1).otherwise(0)
            )
            .groupBy(F.col("true_label").alias("label"))
            .agg(
                F.count(F.lit(1)).alias("n_test"),
                F.sum("hit").alias("n_correct"),
            )
            .orderBy("label")
        )

    def old_form():
        scored = (
            c.join(q, ["tc", "tq"])
            .withColumn("dot", dot_fixed("qq", "cq"))
            .select(
                "query_id",
                "true_label",
                "cand_id",
                "cand_label",
                cosine_fixed("dot", "nq", "nc").alias("cosine"),
            )
        )
        return finish(scored)

    def new_form():
        partials = (
            c.groupBy("tc", "tq")
            .cogroup(q.groupBy("tc", "tq"))
            .applyInPandas(
                _knn_tile_kernel,
                "query_id bigint, true_label int, cand_id bigint, "
                "cand_label int, dot bigint, nq bigint, nc bigint",
            )
        )
        scored = partials.select(
            "query_id",
            "true_label",
            "cand_id",
            "cand_label",
            cosine_fixed("dot", "nq", "nc").alias("cosine"),
        )
        return finish(scored)

    # result identity before timing
    a_rows = sorted(map(tuple, old_form().collect()))
    b_rows = sorted(map(tuple, new_form().collect()))
    assert a_rows == b_rows, (a_rows[:3], b_rows[:3])

    def run(build):
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run(old_form), run(new_form)  # warm codegen both arms
    a, b = [], []
    for _ in range(ROUNDS):
        a.append(round(run(old_form), 3))
        b.append(round(run(new_form), 3))
    print(
        json.dumps(
            {
                "ab": "knn join-fold vs cogroup-BLAS kernel",
                "sf_dir": SF_DIR,
                "identical_results": True,
                "old_join_sec": min(a),
                "kernel_sec": min(b),
                "speedup": round(min(a) / max(min(b), 1e-9), 2),
                "runs_old": a,
                "runs_new": b,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
