# exec(open('tools/ab_buildsplit.py').read()) — plan-build vs execution
# split for the bench's slowest queries (run 2: rerun total, warm).
import time as _time

from bigdata_deepfakeanalysis_spark.registry import all_queries as _aq

_top = [
    "q_stream_jdbc_exactly_once", "q_ann_lsh_recall", "q_mllib_brp_lsh_join",
    "q_grid_dbscan", "q_quantile_band_join", "q_semantic_dedup",
    "q_dup_cluster_sizes", "q_robust_scale", "q_blocking_quality",
    "q_winsorized_mean", "q_record_linkage", "q_itemitem_cf",
    "q_mad_outliers", "q_association_rules", "q_training_pipeline",
    "q_bpe_merges", "q_weighted_median", "q_approx_quantile_profile",
    "q_abc_analysis", "q_cms_heavy_hitters", "q_fk_integrity_audit",
    "q_simhash_hamming", "q_chi2_independence", "q_bootstrap_ci",
    "q_boilerplate_suppress", "q_edit_distance_join", "q_compaction_execute",
    "q_semantic_dedup_lsh", "q_ann_sq8_rescore", "q_equidepth_histogram",
]


def run_split(spark, sf_dir):
    qs = _aq()
    for nm in _top:
        if nm not in qs:
            continue
        try:
            t0 = _time.time()
            df = qs[nm](spark, sf_dir)
            b = _time.time() - t0
            t0 = _time.time()
            df.write.format("noop").mode("overwrite").save()
            e = _time.time() - t0
            t0 = _time.time()
            df2 = qs[nm](spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            r = _time.time() - t0
            print(f"{nm:30s} build {b:6.2f} exec {e:6.2f} rerun {r:6.2f}")
        except Exception as ex:  # noqa: BLE001
            print(f"{nm:30s} ERROR {type(ex).__name__}: {ex}")
    print("SPLIT_DONE")
