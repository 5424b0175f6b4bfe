# exec(open('tools/ab_shj.py').read()) in the profile REPL.
# A/B: sort-merge default vs shuffled-hash-join-enabled
# (preferSortMergeJoin=false + AQE SHJ threshold 64m), interleaved
# min-of-3 over a join-heavy subset.
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


def _setshj(spark, on):
    spark.conf.set(
        "spark.sql.join.preferSortMergeJoin", "false" if on else "true"
    )
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        str(64 * 1024 * 1024) if on else "0",
    )


def run_shj_ab(spark, sf_dir, rounds=3):
    res = {"A": [], "B": []}
    for r in range(rounds):
        _setshj(spark, False)
        res["A"].append({nm: _timed(spark, sf_dir, nm) for nm in _names})
        _setshj(spark, True)
        res["B"].append({nm: _timed(spark, sf_dir, nm) for nm in _names})
        print(f"round {r} done")
    _setshj(spark, False)
    ta = tb = 0.0
    for nm in _names:
        a = min(x[nm] for x in res["A"])
        b = min(x[nm] for x in res["B"])
        ta += a
        tb += b
        print(f"{nm:26s} SMJ {a:5.2f}  SHJ {b:5.2f}  ratio {b/a:4.2f}")
    print(f"{'TOTAL':26s} SMJ {ta:5.2f}  SHJ {tb:5.2f}  ratio {tb/ta:4.2f}")
    print("SHJ_AB_DONE")
    return res
