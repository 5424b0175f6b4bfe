"""Repo-wide physical-plan hygiene: no registered query may plan a
CartesianProduct or a row-at-a-time Python UDF (BatchEvalPython) —
the two plan shapes that silently stop scaling. Complements the
per-query plan tests in test_plans.py with a blanket invariant over
the WHOLE registry, so a future operator can't regress the rule
unnoticed."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR

# Queries whose DataFrame BUILD step executes Spark jobs (iterative
# label propagation, eager checkpoints, MLlib fits, driver-side
# solver loops) — building all of them here would re-run half the
# suite. Their plan shapes are covered by their own tests; the blanket
# scan covers every lazily-built query.
EAGER_BUILD = {
    "q_logreg_cv_separability",
    "q_tree_cv_separability",
    "q_tsne2d",
    "q_pca_explained_variance",
    "q_kmeans_clusters",
    "q_cka_pairs",
    "q_dedup_components",
    "q_dedup_components_star",
    "q_semantic_dedup",
    "q_ngram_jaccard",
    "q_ann_lsh_recall",
    "q_ann_ivf_recall",
    "q_ann_sq8_rescore",
    "q_cosine_near_dup_ivf",
    "q_semantic_dedup_lsh",
    "q_triangle_count",
    "q_lpa_communities",
    "q_kcore",
    "q_link_prediction",
    "q_degree_assortativity",
    "q_two_hop_reach",
    "q_record_linkage",
    "q_grid_dbscan",
    "q_dup_cluster_sizes",
    "q_mmr_rerank",
    "q_blocking_quality",
    "q_sparse_cosine_pairs",
    "q_containment_dedup",
    "q_mllib_minhash_join",
    "q_mllib_brp_lsh_join",
    "q_bpe_merges",
    # staged-write builds (write during DataFrame construction)
    "q_schema_evolution_scan",
    "q_incremental_file_pickup",
    "q_dynamic_partition_overwrite",
    "q_compaction_execute",
    "q_jdbc_roundtrip",
    "q_stream_jdbc_exactly_once",
}

# The one sanctioned BatchEvalPython: the @udtf + LATERAL demo is
# documented as the UDF-surface showcase, not the scale path (the
# codegen `shingles` expression is).
PYTHON_EVAL_OK = {"q_udtf_bigrams"}


def test_no_cartesian_or_row_python_in_any_plan(spark):
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    offenders: dict[str, list[str]] = {}
    for name, fn in all_queries().items():
        if name in EAGER_BUILD:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [m for m in ("CartesianProduct",) if m in plan]
        if "BatchEvalPython" in plan and name not in PYTHON_EVAL_OK:
            hits.append("BatchEvalPython")
        if hits:
            offenders[name] = hits
    assert not offenders, offenders


def test_no_complex_output_columns_in_any_query(spark):
    """Hard driver-contract rule (VERDICT r7 finding 1): the real
    driver canonicalizes results with pandas ``sort_values`` over the
    result cells, which raises ``TypeError: unhashable type: 'list'``
    on any array/map/struct cell — q_inverted_index failed r7 exactly
    this way while the vendored mimic (which string-joined lists)
    green-lit it. No registered query may return a top-level complex
    column; string-encode (concat_ws) instead. Eager-build queries are
    covered by the same assertion inside
    conftest.assert_matches_oracle, which every oracle-parity test
    runs."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    offenders: dict[str, list[str]] = {}
    for name, fn in all_queries().items():
        if name in EAGER_BUILD:
            continue
        df = fn(spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.typeName()}"
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_eager_list_matches_registry():
    """Every EAGER_BUILD / PYTHON_EVAL_OK name must still exist — a
    renamed query would silently drop out of the blanket scan."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    names = set(all_queries())
    missing = (EAGER_BUILD | PYTHON_EVAL_OK) - names
    assert not missing, missing


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
