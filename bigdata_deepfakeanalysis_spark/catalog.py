"""Loaders for the driver's parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table per scale-factor dir.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region
# is 5 rows, nation 25 at every SF; customer/supplier/part scale but stay
# orders of magnitude under the fact tables).
ALWAYS_BROADCAST = ("region", "nation")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown reach the
    parquet reader because we return the raw declarative scan.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark cannot read
    natively (µs max) — we read nanos as int64 and expose BOTH the exact
    ``ts_ns`` (bigint, for oracle-exact arithmetic) and a µs-truncated
    ``ts`` timestamp (for window/streaming APIs). Oracle SQL mirrors the
    truncation with ``make_timestamp(epoch_ns(ts)//1000)``.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.select(
            "event_id",
            F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
            F.col("ts").alias("ts_ns"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Interpolate into oracle SQL to see the same µs-truncated events table
# that Spark sees (keep trailing-column order irrelevant — oracles select
# explicit columns).
EVENTS_US_CTE = (
    "events_us AS (SELECT event_id,"
    " make_timestamp(epoch_ns(ts)//1000) AS ts,"
    " epoch_ns(ts) AS ts_ns,"
    " user_id, event_type, value, props FROM events)"
)


def staging_dir(name: str) -> Path:
    """Fixture-staging directory for queries that must materialize local
    files (image tree, JSON/CSV round-trips, file-stream source).

    Root is ``$SPARK_GRAFT_STAGING_DIR`` (default: the system temp dir)
    so a sandboxed driver can point staging somewhere writable; the
    queries that stage fixtures register LAST so an unwritable sandbox
    costs only those entries, never the pure-compute coverage."""
    root = Path(
        os.environ.get("SPARK_GRAFT_STAGING_DIR", tempfile.gettempdir())
    )
    d = root / "bigdata_dfa_staging" / name
    d.mkdir(parents=True, exist_ok=True)
    return d


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
