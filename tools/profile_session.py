#!/usr/bin/env python
"""Interactive profiling helpers — import into a REPL:

    from tools.profile_session import *
    spark = boot()          # tuned local[32] session, tables cached (bench-like)
    t("q_ks_drift")         # min-of-3 noop-sink timing of a registry query
    tdf(some_df)            # time an ad-hoc DataFrame the same way

Mirrors bench.py methodology: warm cache, noop sink, min-of-N, plan
build inside the timed region.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_spark = None


def boot(sf_dir: str = SF_DIR):
    global _spark
    from bigdata_deepfakeanalysis_spark.session import get_spark
    from bigdata_deepfakeanalysis_spark.catalog import TABLES, table

    _spark = get_spark("profile")
    for tname in TABLES:
        try:
            table(_spark, sf_dir, tname).cache().count()
        except Exception:
            pass
    try:
        from bigdata_deepfakeanalysis_spark.operators.bucketing import (
            stage_bucketed,
        )

        stage_bucketed(_spark, sf_dir)
    except Exception:
        pass
    return _spark


def t(name: str, runs: int = 3, sf_dir: str = SF_DIR) -> float:
    """Time a registry query end-to-end (plan build + noop), min-of-N."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    qs = all_queries()
    best = None
    for _ in range(runs):
        t0 = time.time()
        df = qs[name](_spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {name}: {dt:.3f}s")
    print(f"{name}: min {best:.3f}s")
    return best


def tdf(df, runs: int = 3, label: str = "df") -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {label}: {dt:.3f}s")
    print(f"{label}: min {best:.3f}s")
    return best


def tfn(fn, runs: int = 3, label: str = "fn") -> float:
    """Time plan-build + noop of a thunk returning a DataFrame."""
    best = None
    for _ in range(runs):
        t0 = time.time()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {label}: {dt:.3f}s")
    print(f"{label}: min {best:.3f}s")
    return best
