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
    # Round-12 rotation (VERDICT r11 task 2; COVERAGE r12 sketch).
    # The registry is closed and the union is 415/415 green, so the
    # window's standing rule is: any r12-CHANGED queries first, then
    # the LEAST-RECENTLY-GRADED names (rank derived from the
    # CORRECTNESS_r* artifacts, last-round-wins). Slots:
    #   (a) r12 code changes: the adaptive-quantizer pair whose
    #       plane-count expression moved to try_element_at (ADVICE
    #       r11 ANSI fix), and the exactly-once pair whose sink /
    #       pylog data plane changes this round (VERDICT tasks 5-6);
    #   (b) fillers strictly by last-graded round: both r1 names,
    #       all 39 r2 names, and the alphabetically-first r3 names
    #       that fit the remaining slots (disk-staging
    #       q_binaryfile_ingest goes last by the standing
    #       staging-late convention).
    # ------------------------------------------------------------------
    # (a) r12-changed
    "q_cosine_near_dup",
    "q_semantic_dedup_lsh",
    # sf25-probe fixes (strip-chunked cosine_pairs kernel; adaptive
    # audit sample + adaptive IVF cells in q_cosine_near_dup_ivf;
    # q_semantic_dedup shares the strip-chunked kernel)
    "q_cosine_near_dup_ivf",
    "q_semantic_dedup",
    "q_stream_jdbc_exactly_once",
    "q_stream_exactly_once",
    # (a, continued) r12 OPTIMIZATION-round changes: histogram rank
    # selection + unrolled band sums (quantile_band_join, decile_lift;
    # quantile_normalize had the helper wired then bench-reverted —
    # re-graded anyway), the q2 window-floor rewrite, the adaptive
    # pointer-halving connected-components consumers, the halved IVF
    # Lloyd budget (q_ann_ivf_recall; the other two consumers are
    # already above), and the shared Ed-Join prefix index
    "q_quantile_band_join",
    "q_decile_lift",
    "q_quantile_normalize",
    "q2_min_cost_supplier",
    "q_dedup_components",
    "q_grid_dbscan",
    "q_record_linkage",
    "q_dup_cluster_sizes",
    "q_ann_ivf_recall",
    "q_edit_distance_join",
    "q_blocking_quality",
    # (b) least-recently-graded: r1
    "q_salted_distinct",
    "q_validity_filter",
    # (b) least-recently-graded: r2 (complete)
    "q_above_avg_suppliers",
    "q_anti_join",
    "q_channel_variance_topk",
    "q_corpus_curation",
    "q_cube",
    "q_date_funcs",
    "q_distinct_count",
    "q_doc_fingerprint",
    "q_exists_returned",
    "q_filter_project",
    "q_first_n_per_group",
    "q_gap_hof_consistency",
    "q_group_align_join",
    "q_group_counts_guard",
    "q_group_parse_paths",
    "q_grouping_sets",
    "q_intersect_stems",
    "q_json_extract",
    "q_lang_id",
    "q_minmax_normalize",
    "q_outer_join_counts",
    "q_pairwise_groups",
    "q_percentiles",
    "q_pivot",
    "q_quality_score",
    "q_rollup",
    "q_safe_title",
    "q_seeded_sample_deterministic",
    "q_semi_join",
    "q_set_ops",
    "q_stats_agg",
    # (b) fillers rotated OUT for the 11 optimization-round changed
    # slots (changed-first beats least-recently-graded by the standing
    # rule): q_string_funcs, q_token_stats, q_udtf_bigrams,
    # q_union_provenance, q_window_distribution, q_window_lag,
    # q_window_running_sum, q_window_topk_per_group (alphabetical r2
    # tail), q_asof_join, q_audio_chunk_rms (r3), q_binaryfile_ingest
    # (staging) — with q_bucketed_join / q_cka_pairs they lead the r13
    # filler rank.
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
