#!/usr/bin/env python
"""Time the DuckDB oracle SQL for each benched-and-oracled headline
query at $SPARK_GRAFT_SF_DIR (default sf0.1) — the judge's yardstick.

Prints one JSON line {"queries": {name: sec}, "total": sec} so the
Spark/DuckDB per-query ratio can be inspected without guessing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE, SF_DIR
from bigdata_deepfakeanalysis_spark.catalog import TABLES
from bigdata_deepfakeanalysis_spark.registry import all_oracles


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = all_oracles()
    # warm the OS page cache the way bench.py's .cache() warms Spark
    for t in TABLES:
        con.execute(f"SELECT count(*) FROM {t}").fetchall()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            continue
        t0 = time.time()
        con.execute(sql).fetchall()
        timings[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {"queries": timings, "total": round(sum(timings.values()), 3)}
        )
    )


if __name__ == "__main__":
    main()
