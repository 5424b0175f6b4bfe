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
    # Round-9 rotation (COVERAGE.md §window-plan + VERDICT r8 task 1):
    # all 50 slots go to never-driver-graded residue. After r8 the
    # 81-name residue lives ENTIRELY in text (28) / advanced (28) /
    # relational (25) — every other module is 100% hash-green across
    # CORRECTNESS_r01–r08, so the every-module rule now recognizes
    # artifact-proven fully-green modules as covered
    # (tests/test_registry.py::test_window_covers_every_query_module
    # reads the committed CORRECTNESS_r*.json files) instead of
    # burning 16 filler slots re-grading queries with driver rows.
    # That honors the rule's intent — no module ever escapes driver
    # grading — while letting a 50/50 round lift the union
    # 334 → 384/415 (VERDICT r8 target ≥379) and leave a 31-name
    # residue that round 10 closes (31 fresh + 19 fillers).
    # ------------------------------------------------------------------
    # the two r8 BI deferrals (relational)
    "q_moment_merge",
    "q_analyze_stats",
    # text residue (all 28; q_feature_hashing leads — its complex-cell
    # fix landed in r8 and is hygiene-locked)
    "q_feature_hashing",
    "q_lm_quality_score",
    "q_mixture_resample",
    "q_temperature_mixture",
    "q_negative_sampling",
    "q_dataset_card",
    "q_lang_confusion",
    "q_kwic_concordance",
    "q_trending_terms",
    "q_phrase_search",
    "q_boilerplate_suppress",
    "q_js_divergence_sources",
    "q_batch_retrieval",
    "q_burrows_delta",
    "q_curriculum_plan",
    "q_dsir_resample",
    "q_emd_lengths",
    "q_head_coverage",
    "q_mcnemar_filters",
    "q_mixture_epoch_budget",
    "q_rake_keywords",
    "q_simpson_diversity",
    "q_source_vocab_jaccard",
    "q_span_corruption_plan",
    "q_split_half_reliability",
    "q_tokenizer_fertility",
    "q_unigram_perplexity",
    "q_vocab_coverage_curve",
    # advanced residue (event/funnel/cohort batch — 16 of 28)
    "q_ohlc_candles",
    "q_bounce_rate",
    "q_retention_audit",
    "q_new_vs_returning",
    "q_acf_daily_revenue",
    "q_seasonal_anomaly",
    "q_cohens_kappa",
    "q_markov_transitions",
    "q_k_anonymity",
    "q_l_diversity",
    "q_association_rules",
    "q_itemitem_cf",
    "q_mutual_information",
    "q_cumulative_distinct_users",
    "q_trailing_distinct_users",
    "q_dow_hour_heatmap",
    # relational residue (4 slots freed by the module-rule amendment)
    "q_robust_scale",
    "q_winsorized_mean",
    "q_cohens_d",
    "q_ab_srm",
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
