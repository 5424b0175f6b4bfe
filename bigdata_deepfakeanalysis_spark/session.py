"""SparkSession factory tuned for the engine.

Designed for a multi-executor cluster (partition sizing, AQE, broadcast
thresholds); tested on local[N]. The driver may hand us an existing
session — ``tune()`` applies only runtime-settable confs in that case.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs: safe to apply to an externally-owned session.
_RUNTIME_CONF = {
    # AQE: runtime re-plan (partition coalescing, skew-join splitting,
    # empty-relation propagation). Essential at 100 TB where static
    # estimates are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE rewrite a planned sort-merge join to shuffled-hash at
    # runtime when EVERY post-shuffle partition's build side fits 64 MB
    # (guide §3.1): skips both sort passes with a per-partition size
    # gate, so it cannot OOM at corpus scale the way a blind static
    # preferSortMergeJoin=false could (that static flip was A/B'd too:
    # same net win locally, but it trusts planner size estimates —
    # rejected). Interleaved min-of-3 over a 10-query join-heavy
    # subset at sf0.1: net 0.97x, biggest movers q_topk_grouping_sets
    # 3.81->3.04 s, q5 0.95->0.83 s, no structural regression.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(
        64 * 1024 * 1024
    ),
    # Arrow for every pandas UDF / toPandas boundary (SURVEY §2.9).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast small dimension tables (region/nation/customer/supplier
    # all qualify at any sane scale; lineitem never does).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Columnar outputs.
    "spark.sql.parquet.compression.codec": "zstd",
    # Join differently-generation bucketed tables (8 vs 4 buckets)
    # without re-shuffling either side — q_bucket_coalesced_join's
    # layout-evolution guarantee, a no-op for matching layouts.
    "spark.sql.bucketing.coalesceBucketsInJoin.enabled": "true",
    # Wide-aggregate codegen: the SimHash vote (64 SUM columns) and
    # MinHash (12 MIN columns) aggregates exceed the default
    # maxFields=100 and silently fall back to interpreted evaluation —
    # measured 2.2× on the SimHash fingerprint stage at sf0.1.
    "spark.sql.codegen.maxFields": "1000",
    # Let Python DataSources receive pushed filters (the pyavro
    # reader pre-filters rows before the worker->JVM transfer).
    # Runtime-settable; avro_lite additionally builds a reader
    # WITHOUT pushFilters when this is off, because Spark fails any
    # read whose reader implements the method under a disabled conf.
    "spark.sql.python.filterPushdown.enabled": "true",
}

_STARTUP_CONF = {
    # Sized for the test harness; a real cluster overrides via spark-submit.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # local-mode driver == the whole "cluster": size the heap so cached
    # tables + checkpoint blocks + broadcast vars don't GC-thrash a
    # long bench session (the container has 128 GiB; 8g showed 5-8×
    # slowdowns on late-bench queries purely from collector pressure)
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.ui.enabled": "false",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf locked down — keep going, defaults are fine
            pass
    return spark


def get_spark(app_name: str = "bigdata-deepfakeanalysis-spark") -> SparkSession:
    """Get or create a tuned SparkSession (local[N] for tests)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return tune(active)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in {**_STARTUP_CONF, **_RUNTIME_CONF}.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
