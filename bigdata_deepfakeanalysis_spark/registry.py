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
    # Round-6 rotation (COVERAGE.md §window-plan, executed as planned):
    # 48 slots are never-driver-verified ORACLED names — the heavy
    # unverified dedup/graph/ANN/lakehouse machinery, the stats/eval
    # family, the sampling allocators, and >=1 slot per module — and
    # 2 slots are the formerly-`no_oracle` upgrades whose oracles
    # landed in r4/r5 (q_hll_distinct_merge, q_ml_pipeline), deliberately
    # re-windowed so their historic rows-only driver rows finally turn
    # hash-green (VERDICT r5 finding 2). Three names are new round-6
    # operators (chained windows, bucketed semi join, extension audit)
    # written ONLY because their modules (batch_equiv, bucketing,
    # grouping) had no never-verified oracled name left. Disk-staging
    # queries ride last so a staging-restricted run still verifies the
    # pure-compute surface. Residue is planned in COVERAGE.md.
    # ------------------------------------------------------------------
    # graph + dedup heavy machinery
    "q_kcore",
    "q_link_prediction",
    "q_blocking_quality",
    "q_containment_dedup",
    "q_normalized_exact_dedup",
    "q_bloom_prefilter_dedup",
    # text-curation machinery
    "q_sparse_cosine_pairs",
    "q_winnowing_fingerprints",
    "q_ngram_novelty",
    # MLlib LSH joins + skew/interval joins
    "q_mllib_minhash_join",
    "q_mllib_brp_lsh_join",
    "q_hotkey_split_join",
    "q_interval_overlap_join",
    # lakehouse / time series (advanced)
    "q_merge_into_emulation",
    "q_cusum_changepoint",
    "q_linear_interpolation",
    "q_rolling_zscore",
    # arrays + similarity
    "q_array_smooth",
    "q_arrow_quantize",
    # stats / eval family
    "q_skyline_pareto",
    "q_ols_elasticity",
    "q_chi2_independence",
    "q_gini_concentration",
    "q_ks_drift",
    "q_pr_curve_ap",
    "q_decile_lift",
    "q_weighted_median",
    "q_centroid_classifier",
    "q_mllib_summarizer",
    "q_brier_profile",
    "q_spearman_corr",
    # sampling / mixture allocators
    "q_bootstrap_ci",
    "q_weighted_sample",
    "q_sample_bias_audit",
    "q_largest_remainder",
    "q_stratified_kfold",
    "q_dp_count_release",
    # sketches (incl. the q_hll_distinct_merge no_oracle upgrade)
    "q_hll_distinct_merge",
    "q_approx_quantile_profile",
    "q_bitmap_exact_distinct",
    "q_approx_topk_terms",
    # multimodal + explainability
    "q_image_tiling",
    "q_audio_vad_segments",
    "q_fisher_scores",
    # new round-6 operators (module-coverage slots)
    "q_extension_audit",
    "q_stream_chained_windows",
    # formerly-no_oracle upgrade
    "q_ml_pipeline",
    # disk-staging tail
    "q_bucketed_semi_join",
    "q_compaction_execute",
    "q_dynamic_partition_overwrite",
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
