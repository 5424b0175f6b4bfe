#!/usr/bin/env python
"""Interleaved A/B for the r7 q_semantic_dedup_lsh sf1 move
(1.79 s r6 -> 2.42 s r7 with no code-path change — VERDICT r7 task 5).

Hypotheses: (a) co-tenant noise (the r6 verdict caught four such
phantoms), (b) the r7 session default
spark.sql.bucketing.coalesceBucketsInJoin.enabled=true perturbing the
IVF join plan. Design: ONE tuned session, warm page cache, then
alternate conf=true / conf=false runs (3 each), report per-run times
and mins. Only interleaved numbers count (BENCH absolute values swing
2-5x with host load).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession


def main() -> None:
    from bigdata_deepfakeanalysis_spark.session import tune
    from bigdata_deepfakeanalysis_spark.registry import all_queries
    from bigdata_deepfakeanalysis_spark.catalog import table
    from tools.stage_sf1 import sf1_dir

    sf1 = sf1_dir()
    assert (sf1 / ".complete").exists(), "stage sf1 first"

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune(spark)
    q = all_queries()["q_semantic_dedup_lsh"]

    for t in ("documents", "embeddings"):
        table(spark, str(sf1), t).count()

    def run() -> float:
        t0 = time.time()
        q(spark, str(sf1)).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run()  # discard: JIT + shuffle-dir warm
    times: dict[str, list[float]] = {"true": [], "false": []}
    for i in range(6):
        conf = "true" if i % 2 == 0 else "false"
        spark.conf.set(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", conf
        )
        dt = run()
        times[conf].append(round(dt, 3))
        print(f"run {i}: coalesceBucketsInJoin={conf}  {dt:.3f}s")
    print(
        f"min true={min(times['true'])} false={min(times['false'])}"
        f"  all={times}"
    )


if __name__ == "__main__":
    main()
