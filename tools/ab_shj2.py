# exec(open('tools/ab_shj2.py').read()) — variant C: AQE-threshold-only
# (preferSortMergeJoin stays true; runtime SMJ->SHJ conversion when all
# post-shuffle partitions fit 64m), vs A (pure default SMJ).
import time as _time

from bigdata_deepfakeanalysis_spark.registry import all_queries as _aq

_names = [
    "q5_regional_revenue", "q3_top_orders", "q9_product_profit",
    "q_topk_grouping_sets", "q_fk_integrity_audit", "q_record_linkage",
    "q_frequent_triples", "q_itemitem_cf", "q2_min_cost_supplier",
    "q_ks_drift",
]
_qs = _aq()


def _timed(spark, sf_dir, nm):
    t0 = _time.time()
    df = _qs[nm](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return _time.time() - t0


def run_shj_c(spark, sf_dir, rounds=3):
    res = {"A": [], "C": []}
    for r in range(rounds):
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0"
        )
        res["A"].append({nm: _timed(spark, sf_dir, nm) for nm in _names})
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        res["C"].append({nm: _timed(spark, sf_dir, nm) for nm in _names})
        print(f"round {r} done")
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0"
    )
    ta = tc = 0.0
    for nm in _names:
        a = min(x[nm] for x in res["A"])
        c = min(x[nm] for x in res["C"])
        ta += a
        tc += c
        print(f"{nm:26s} SMJ {a:5.2f}  AQE-SHJ {c:5.2f}  ratio {c/a:4.2f}")
    print(f"{'TOTAL':26s} SMJ {ta:5.2f}  AQE-SHJ {tc:5.2f}  ratio {tc/ta:4.2f}")
    print("SHJ_C_DONE")
    return res
