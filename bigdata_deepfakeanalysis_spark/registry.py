"""Query registry — the driver contract (``__spark_entry__.py``).

Every implemented operator from SURVEY.md §2 registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible,
the equivalent DuckDB oracle SQL. The driver hash-compares the two at
sf0.01 (row count + schema + order-insensitive value hash).

Parity rules (see FIXTURES.md "Oracle notes"):

- Alias every computed column identically on both sides.
- Aggregate doubles through DECIMAL so the result is bit-identical
  regardless of partial-aggregation order, then cast back to DOUBLE
  (helpers in ``operators.parity``).
- Seeded sampling uses rank-over-md5, never engine-native rand().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as oracle_sql()[name].

    ``oracle=None`` marks a non-SQL-expressible op (driver records the
    weaker rows-only check — SURVEY §5.2)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS for driver coverage: the driver executes queries in
    registration order under a wall-clock budget, so cheap pure-compute
    modules register first and the module that stages on-disk fixture
    trees (sources) registers LAST — a truncated or staging-restricted
    run loses the least (round-1 lesson: the run stopped after 50/77
    queries, exactly at the disk-staging modules). Staging paths are
    env-configurable via $SPARK_GRAFT_STAGING_DIR (catalog.staging_dir)."""
    # pure-compute over the parquet tables — cheapest first
    from .operators import (  # noqa: F401
        relational,
        grouping,
        sampling,
        joins,
        arrays,
        text,
        skew,
        similarity,
        dedup,
        advanced,
    )
    from .streaming import batch_equiv  # noqa: F401
    from . import ml  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import explainability  # noqa: F401
    # disk-staging fixtures last
    from .operators import sources  # noqa: F401
    from .operators import bucketing  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
