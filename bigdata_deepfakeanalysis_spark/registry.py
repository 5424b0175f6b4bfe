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
# names, at least one from EVERY operator module, with disk-staging
# modules (sources/bucketing/streaming-sink) late so a
# staging-restricted run still verifies the pure-compute surface.
# Queries not listed ride after slot 50 (pytest runs the same oracle
# compare on all of them — see tests/conftest.py).
# ---------------------------------------------------------------------------

_WINDOW: list[str] = [
    # ------------------------------------------------------------------
    # Round-4 rotation: EVERY slot is a never-driver-verified query
    # (rounds 1-3 banked 99 distinct green rows; this window lifts the
    # union to 149). All 19 operator modules keep >= 1 slot — six of
    # them via the round-4 operators written for exactly that purpose
    # (triangle count, Z-order pruning, bucketed agg, row-local top-k,
    # path rollup, null-aware anti join). Riding after slot 50 (all
    # pytest-oracled every run): banked r1-r3 families plus the
    # lower-priority never-verified names (q_ts_correlation_search,
    # q_ts_pattern_match, q_lm_quality_score, q_orc_roundtrip,
    # q_arrow_quantize, q_histogram_profile, q_approx_distinct,
    # q_unpivot_metrics, q_resize_stub, sketch diagnostics).
    # ------------------------------------------------------------------
    # TPC-H breadth suite (the whole remaining set, per r3 VERDICT)
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_lines",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    # relational extensions (round-3 additions, never driver-checked)
    "q_variant_events",
    "q_dq_constraints",
    "q_window_range_frame",
    "q_null_safe_join",
    # dedup: the O(log n) components algorithm (promoted per VERDICT
    # item 3), survivorship, incremental, and the round-4 fully-oracled
    # SemDeDup composition
    "q_dedup_components_star",
    "q_quality_dedup",
    "q_incremental_dedup",
    "q_semantic_dedup_lsh",
    # similarity: the recall ladder, hash-oracled as of round 4
    "q_ann_lsh_recall",
    # text / LLM-pipeline
    "q_tfidf_topterms",
    "q_bm25_topdocs",
    "q_bpe_merges",
    "q_pmi_cooccurrence",
    "q_url_canonicalize",
    # advanced analytics
    "q_cdc_upsert",
    "q_cohort_retention",
    "q_event_funnel",
    "q_sessionize_events",
    # skew / sampling
    "q_salted_join",
    "q_stratified_split",
    # round-4 module-coverage operators (one per previously-banked-only
    # module: graph, layout, bucketing, arrays, grouping, joins)
    "q_triangle_count",
    "q_zorder_pruning",
    "q_bucketed_agg",
    "q_channel_topk_rowlocal",
    "q_path_rollup",
    "q_not_in_anti_join",
    # ml / multimodal / explainability
    "q_ml_pipeline",
    "q_phash_near_dup",
    "q_attention_rollout_surrogate",
    # sketches
    "q_hll_distinct_merge",
    # streaming + disk-staging sources — late in the window by design
    "q_stream_sliding_window",
    "q_stream_stream_join",
    "q_stream_exactly_once",
    "q_python_datasource",
    "q_corrupt_json_permissive",
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
