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
    # Round-8 rotation (COVERAGE.md §window-plan + VERDICT r7 task 3):
    # leads with the q_inverted_index re-grade (its r7 driver row is
    # the registry's only FAIL — array-column canonicalizer crash, now
    # string-encoded), then the 18-name BI deferral block (minus
    # q_moment_merge / q_analyze_stats, deferred to r9 because the
    # every-module rule costs 4 filler slots and 48 fresh names do not
    # fit in 46), the two r6-upgraded never-graded names, the
    # dedup/similarity/ml/graph tails, one never-graded residue rep per
    # remaining module, 3 text names, the two r7-authored queries, the
    # 4 already-green module fillers (batch_equiv, grouping, joins,
    # skew have zero never-verified residue — the honest cost of the
    # 415 freeze), and the disk-staging sources last so a
    # staging-restricted run still verifies the pure-compute surface.
    # ------------------------------------------------------------------
    # lead: the r7 FAIL, re-graded under the string-encoded postings
    "q_inverted_index",
    # BI deferral block (16 of 18; q_moment_merge + q_analyze_stats → r9)
    "q_unpivot_metrics",
    "q_date_spine",
    "q_string_agg_report",
    "q_seasonal_index",
    "q_sequence_gaps",
    "q_dictionary_encode",
    "q_fk_integrity_audit",
    "q_group_mode",
    "q_topk_grouping_sets",
    "q_forward_fill",
    "q_hhi_concentration",
    "q_cohort_ltv",
    "q_kaplan_meier",
    "q_conversion_latency",
    "q_dau_mau_stickiness",
    "q_histogram2d",
    # r6-upgraded, never driver-graded
    "q_semantic_dedup",
    "q_tsne2d",
    # dedup tail
    "q_dup_cluster_sizes",
    "q_dup_flow_matrix",
    "q_lsh_dedup_eval",
    # similarity tail
    "q_dead_dimension_audit",
    "q_embedding_norm_audit",
    "q_mutual_nn_alignment",
    "q_quantization_error",
    # ml tail
    "q_centroid_silhouette",
    "q_embedding_drift",
    "q_quantile_normalize",
    # graph tail
    "q_degree_assortativity",
    "q_two_hop_reach",
    # one never-graded residue rep per remaining module
    "q_intradoc_redundancy",      # arrays
    "q_encoding_profile",         # layout
    "q_resize_stub",              # multimodal
    "q_neyman_allocation",        # sampling
    "q_sample_estimate",          # sampling
    "q_datasketches_native",      # sketches
    # text names
    "q_repetition_filter",
    "q_pii_redaction",
    "q_domain_rollup",
    # r7-authored (bucketing / explainability), never driver-graded
    "q_bucket_coalesced_join",
    "q_permutation_importance",
    # already-green module fillers (every-module rule)
    "q_key_depth_audit",          # grouping (green r7)
    "q_null_skew_shunt_join",     # joins (green r7)
    "q_join_size_estimate",       # skew (green r7)
    "q_stream_static_anti_join",  # batch_equiv (green r7)
    # disk-staging tail (sources last)
    "q_catalog_census",
    "q_csv_json_roundtrip",
    "q_orc_roundtrip",
    "q_incremental_file_pickup",
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
