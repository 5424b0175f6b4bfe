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

    Import order no longer determines driver order — ``_WINDOW`` below
    does. Modules just need to be loaded."""
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
    from .operators import sources  # noqa: F401
    from .operators import bucketing  # noqa: F401
    from .operators import sketches  # noqa: F401
    from .operators import layout  # noqa: F401
    from .operators import graph  # noqa: F401


# ---------------------------------------------------------------------------
# Driver coverage window.
#
# The driver hash-checks exactly the FIRST 50 queries in ``queries()``
# iteration order (rounds 1-3 CORRECTNESS files prove the hard 50-entry
# budget). ``_WINDOW`` is therefore the contract surface: exactly 50
# names, and every operator module must be driver-verified — either a
# query of its sits in the window, or (r9 amendment) EVERY query it
# registers already carries a hash-green row in a committed
# CORRECTNESS artifact (tests/test_registry.py reads the artifacts).
# Disk-staging names, when present, go late so a staging-restricted
# run still verifies the pure-compute surface. Queries not listed ride
# after slot 50 (pytest runs the same oracle compare on all of them —
# see tests/conftest.py).
# ---------------------------------------------------------------------------

_WINDOW: list[str] = [
    # ------------------------------------------------------------------
    # Round-10 rotation (COVERAGE.md §window-plan + VERDICT r9 task 1):
    # the FULL remaining never-driver-graded residue (31 names =
    # 12 advanced + 19 relational, artifact-derived via
    # tools/recount_union.py) plus 19 re-grade fillers chosen for
    # evidence value — every filler is a query whose code changed in
    # round 9 AFTER its last driver-green row: the two tile-grid
    # re-expressions (q_mutual_nn_alignment, q_knn_classifier), all
    # 12 hint-swept TPC-H shapes (q8/q9 first — deepest join trees),
    # the PageRank invariant-join hoist, the three dedup-QA names that
    # certify the shared lsh_pairs_cached candidate set, and the
    # pyavro-staged roundtrip (now exercising Arrow read/write +
    # pushdown). A 50/50 round closes the registry: union 384 → 415,
    # residue 0. Deviation from the COVERAGE r10 sketch, documented
    # there: VERDICT r9 task 1's 12 TPC-H shapes outrank the
    # module-rotation reps; q_ngram_jaccard / q_dedup_components(_star)
    # ride on the cache certification (the only r9 change to them is
    # the lsh_pairs_cached source the three graded QA names consume).
    # ------------------------------------------------------------------
    # advanced residue (12)
    "q_burstiness",
    "q_forecast_backtest_mape",
    "q_frequent_triples",
    "q_granger_lag1",
    "q_late_arriving_dim",
    "q_markov_entropy_rate",
    "q_observe_metrics",
    "q_runs_test",
    "q_session_timeout_sweep",
    "q_table_checksum",
    "q_ts_feature_matrix",
    "q_ts_pattern_match",
    # relational residue (19)
    "q_age_period_cohort",
    "q_cem_att",
    "q_chisq_residuals",
    "q_conformal_interval",
    "q_direct_standardization",
    "q_eb_shrinkage",
    "q_fk_fanout_profile",
    "q_hill_tail_index",
    "q_icc_customers",
    "q_knee_detection",
    "q_order_to_ship_latency",
    "q_overdispersion",
    "q_price_index",
    "q_price_volume_mix",
    "q_rank_biased_overlap",
    "q_rare_category_collapse",
    "q_rate_mix_decomposition",
    "q_seasonality_strength",
    "q_simpson_reversal",
    # re-grade fillers: r9 tile-grid re-expressions (similarity)
    "q_mutual_nn_alignment",
    "q_knn_classifier",
    # re-grade fillers: the 12 hint-swept TPC-H shapes (relational)
    "q8_market_share",
    "q9_product_profit",
    "q2_min_cost_supplier",
    "q7_trade_flows",
    "q11_important_parts",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_join",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q_dq_constraints",
    # re-grade fillers: PageRank hoist + shared-LSH-cache certifiers
    "q_pagerank_copurchase",
    "q_dup_cluster_sizes",
    "q_dup_flow_matrix",
    "q_lsh_dedup_eval",
    # re-grade filler, disk-staging (goes last by convention)
    "q_csv_json_roundtrip",
]


def _windowed(d: dict) -> dict:
    """Reorder ``d`` so _WINDOW names come first (in window order)."""
    out = {name: d[name] for name in _WINDOW if name in d}
    out.update((name, v) for name, v in d.items() if name not in out)
    return out


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _windowed(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _windowed(_ORACLES)


def window() -> list[str]:
    """The 50-slot driver-verified contract surface (tested)."""
    return list(_WINDOW)
