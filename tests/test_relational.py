"""Phase-1 relational core: every registered query with an oracle is
hash-compared against DuckDB at sf0.01 — the same check the driver runs."""

from __future__ import annotations

import pytest

from bigdata_deepfakeanalysis_spark.registry import all_oracles, all_queries

from .conftest import SF_DIR


def _oracle_cases():
    qs, os_ = all_queries(), all_oracles()
    return sorted(os_.keys() & qs.keys())


def _rows_only_cases():
    qs, os_ = all_queries(), all_oracles()
    return sorted(set(qs) - set(os_))


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_parity(name, spark, oracle_check):
    fn = all_queries()[name]
    oracle_check(fn(spark, SF_DIR), all_oracles()[name])


@pytest.mark.parametrize("name", _rows_only_cases())
def test_rows_only(name, spark):
    fn = all_queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}
