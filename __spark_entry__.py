"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdata_deepfakeanalysis_spark`` — this file
is a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q5-shaped: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    date + region filters, per-nation revenue rollup (SURVEY.md §7.1).
    """
    from bigdata_deepfakeanalysis_spark.operators.relational import (
        q5_regional_revenue,
    )
    from bigdata_deepfakeanalysis_spark.session import tune

    tune(spark)
    return q5_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    from bigdata_deepfakeanalysis_spark.registry import all_oracles

    return all_oracles()
