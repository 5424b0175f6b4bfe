#!/usr/bin/env python
"""Interleaved A/B: single-file pyavro read, whole-file partition vs
ranged split_bytes partitions.

Quantifies the split-read design (VERDICT r10 task 5): one large Avro
container (single upstream writer's layout) is a ONE-task read by
default, but the sync-marker block index lets split_bytes chunk it
into ranged partitions that decode in parallel. Stages ~600k rows of
sf0.1 lineitem into ONE .avro file, then times the same aggregate
with split_bytes=0 (A: 1 partition) vs split_bytes sized for ~32
partitions (B), interleaved within one session so co-tenant host
drift cancels (same-session interleaved ratios are the only signal
on this machine).

Usage: python tools/ab_pyavro_split.py [rounds]
Prints one JSON line with min-of-N per arm and the speedup.
"""
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    from pyspark.sql import SparkSession, functions as F

    from bigdata_deepfakeanalysis_spark import session
    from bigdata_deepfakeanalysis_spark.operators import avro_lite as al

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session.tune(
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ab-pyavro-split")
        .getOrCreate()
    )
    spark.dataSource.register(al.make_pyavro_datasource(spark))

    stage = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"ab_pyavro_split_{os.getpid()}"
    )
    # ONE file: coalesce(1) emits a single part — the layout that
    # needs within-file splits
    (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            F.col("l_returnflag"),
        )
        .coalesce(1)
        .write.format("pyavro")
        .mode("overwrite")
        .save(stage)
    )
    files = glob.glob(os.path.join(stage, "*.avro"))
    assert len(files) == 1, files
    _, blocks = al.block_index(files[0])
    total = sum(sz for _, _, sz in blocks)
    split = max(1, total // 32)

    def run(split_bytes: int) -> float:
        rd = spark.read.format("pyavro")
        if split_bytes:
            rd = rd.option("split_bytes", split_bytes)
        t0 = time.monotonic()
        (
            rd.load(stage)
            .agg(
                F.sum("l_extendedprice").alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        return time.monotonic() - t0

    # correctness guard: both arms agree before timing
    whole = spark.read.format("pyavro").load(stage)
    ranged = (
        spark.read.format("pyavro").option("split_bytes", split).load(stage)
    )
    a_cnt = whole.count()
    b_cnt = ranged.count()
    assert a_cnt == b_cnt, (a_cnt, b_cnt)

    run(0), run(split)  # warmup both arms
    a, b = [], []
    for _ in range(ROUNDS):
        a.append(round(run(0), 3))
        b.append(round(run(split), 3))
    print(
        json.dumps(
            {
                "ab": "pyavro single-file whole vs split_bytes",
                "rows": a_cnt,
                "blocks": len(blocks),
                "split_bytes": split,
                "whole_file_sec": min(a),
                "split_sec": min(b),
                "speedup": round(min(a) / max(min(b), 1e-9), 2),
                "runs_whole": a,
                "runs_split": b,
            }
        )
    )
    shutil.rmtree(stage, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
