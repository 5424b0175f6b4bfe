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
    # Round-11 rotation (VERDICT r10 task 2). The registry is closed
    # (415/415 union-green, residue 0), so the window's standing
    # purpose is now explicit: EVERY query whose code changed since
    # its last driver row gets re-graded next round. Slots:
    #   (a) the six queries de-hinted late in r10 OUTSIDE that
    #       round's window — their driver greens predate the hint
    #       removal (VERDICT r10 "What's missing" #1);
    #   (b) queries whose code changes in r11 (pyavro Arrow-path
    #       empty-block fix + split reads -> the staged roundtrip);
    #   (c) fillers by evidence value: the r10 re-expressions graded
    #       a SECOND time on an unchanged tree (stability evidence),
    #       the deepest TPC-H join trees, the most expensive plan
    #       rows the r10 verdict audited (semantic dedup, BRP-LSH,
    #       BPE, edit-distance join), and the forced-broadcast
    #       allowlist heavies whose hint budgets the r11 audit now
    #       pins exactly (q_frequent_triples, the ANN recall ladder,
    #       the graph degree-join pair).
    # ------------------------------------------------------------------
    # (a) the six stale-green de-hinted queries
    "q18_large_volume_orders",
    "q_skyline_pareto",
    "q_gini_concentration",
    "q_topk_grouping_sets",
    "q_rake_keywords",
    "q_training_pipeline",
    # (c) r10 re-expressions, second grading on the unchanged tree
    "q_mutual_nn_alignment",
    "q_knn_classifier",
    "q_pagerank_copurchase",
    "q_lpa_communities",
    "q_ngram_jaccard",
    "q_dup_cluster_sizes",
    "q_dup_flow_matrix",
    "q_lsh_dedup_eval",
    # (c) deepest TPC-H join trees + hint-swept shapes, second pass
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
    "q5_regional_revenue",
    "q1_pricing_summary",
    "q3_top_orders",
    # (c) the most expensive plan rows of the r10 verdict audit
    "q_semantic_dedup",
    "q_semantic_dedup_lsh",
    "q_mllib_brp_lsh_join",
    "q_bpe_merges",
    "q_edit_distance_join",
    "q_minhash_near_dup",
    "q_exact_dedup",
    "q_cosine_near_dup",
    "q_dedup_components",
    "q_dedup_components_star",
    "q_substring_span_dedup",
    "q_snm_dedup",
    # (c) forced-broadcast allowlist heavies (budgets pinned r11)
    "q_frequent_triples",
    "q_ann_ivf_recall",
    "q_ann_lsh_recall",
    "q_ann_sq8_rescore",
    "q_ann_cosine_topk",
    "q_link_prediction",
    "q_degree_assortativity",
    "q_kmeans_clusters",
    "q_mutual_information",
    # (b) r11 pyavro changes ride the staged roundtrip
    #     (disk-staging goes last by convention)
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
