"""Bit-identity of the two-pass histogram percentile
(operators/quantiles.exact_percentiles_histo) vs Catalyst's Percentile
aggregate — the contract that lets registered queries swap the
single-task map merge for the bounded form without touching results.
"""

import random
import struct

import pytest
from pyspark.sql import functions as F

from bigdata_deepfakeanalysis_spark.operators.quantiles import (
    exact_percentiles_histo,
)


def _bits(x):
    return struct.pack("<d", x).hex() if x is not None else None


def _agg_ps(ps):
    return "array(" + ",".join(f"CAST({p!r} AS DOUBLE)" for p in ps) + ")"


CASES = [
    # (values-generator, ps, weights?)
    ("uniform", [0.1, 0.25, 0.5, 0.75, 0.9], False),
    ("uniform", [0.0, 0.5, 1.0], False),          # endpoint positions
    ("duplicates", [0.1, 0.3, 0.5, 0.7, 0.9], False),
    ("duplicates", [0.25, 0.5], True),             # weighted
    ("two_values", [0.0, 0.37, 0.5, 1.0], False),  # minimal domain
    ("one_value", [0.0, 0.5, 1.0], False),         # mx == mn bin guard
    ("integer_positions", [0.25, 0.5, 0.75], False),  # pos hits integers
    ("skewed", [0.01, 0.5, 0.99], True),
]


def _gen(kind, rng, n=4000):
    if kind == "uniform":
        return [rng.uniform(-1e6, 1e6) for _ in range(n)]
    if kind == "duplicates":
        pool = [round(rng.uniform(0, 1000), 2) for _ in range(50)]
        return [rng.choice(pool) for _ in range(n)]
    if kind == "two_values":
        return [rng.choice([3.5, 9.25]) for _ in range(n)]
    if kind == "one_value":
        return [42.125] * n
    if kind == "integer_positions":
        # n = 4001 -> p*(n-1) integral for quartiles
        return [float(i % 97) for i in range(4001)]
    if kind == "skewed":
        return [rng.expovariate(1e-3) for _ in range(n)]
    raise AssertionError(kind)


@pytest.mark.parametrize("kind,ps,weighted", CASES)
def test_histo_matches_percentile_ungrouped(spark, kind, ps, weighted):
    rng = random.Random(hash((kind, len(ps), weighted)) & 0xFFFF)
    vals = _gen(kind, rng)
    rows = [
        (v, rng.randint(1, 5) if weighted else 1) for v in vals
    ]
    df = spark.createDataFrame(rows, "v double, w long")
    wexpr = ", w" if weighted else ""
    a = df.agg(
        F.expr(f"percentile(v, {_agg_ps(ps)}{wexpr})").alias("qs")
    ).collect()[0]["qs"]
    b = exact_percentiles_histo(
        df, [], "v", ps, weight="w" if weighted else None, n_bins=64
    ).collect()[0]["qs"]
    assert [_bits(x) for x in a] == [_bits(x) for x in b], (kind, ps)


def test_histo_matches_percentile_grouped(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice(["a", "b", "c"]), rng.uniform(0, 1e4), rng.randint(1, 3))
        for _ in range(6000)
    ]
    df = spark.createDataFrame(rows, "grp string, v double, w long")
    ps = [0.05, 0.5, 0.95]
    a = {
        r["grp"]: [_bits(x) for x in r["qs"]]
        for r in df.groupBy("grp")
        .agg(F.expr(f"percentile(v, {_agg_ps(ps)}, w)").alias("qs"))
        .collect()
    }
    b = {
        r["grp"]: [_bits(x) for x in r["qs"]]
        for r in exact_percentiles_histo(
            df, ["grp"], "v", ps, weight="w", n_bins=64
        ).collect()
    }
    assert a == b


def test_histo_ignores_nulls_like_percentile(spark):
    rows = [(float(i),) for i in range(100)] + [(None,)] * 17
    df = spark.createDataFrame(rows, "v double")
    a = df.agg(F.expr("percentile(v, array(0.5D, 0.9D))").alias("qs"))
    b = exact_percentiles_histo(df, [], "v", [0.5, 0.9], n_bins=16)
    assert [_bits(x) for x in a.collect()[0]["qs"]] == [
        _bits(x) for x in b.collect()[0]["qs"]
    ]
