#!/usr/bin/env python
"""A/B: exact weighted percentile via ObjectHashAggregate Percentile
(status quo) vs a ranged two-pass cumulative-count rewrite (all
codegen: range repartition + per-partition cumsum + broadcast offsets,
then boundary-row interpolation mirroring Percentile.getPercentile's
FP formula term-for-term).

Checks BIT-IDENTITY of every boundary double first, then times both
forms min-of-3 with the noop sink on a warm session.

Usage: python tools/ab_window_percentile.py [sf_dir]
"""
from __future__ import annotations

import os
import struct
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


def window_percentiles(df, groups, v, freq, ps, n_parts=32, pin=False):
    """Exact weighted percentiles of ``v`` (weights ``freq``) per
    ``groups``, returning one row per group with array column ``qs``
    (same order as ps). Bit-identical to
    ``percentile(v, array(ps), freq)``: implements the same
    position/boundary/interpolation arithmetic as Spark's Percentile,
    without the ObjectHashAggregate single-task map merge."""
    ps_arr = "array(" + ",".join(f"CAST({p!r} AS DOUBLE)" for p in ps) + ")"
    gcols = list(groups)
    ranged = df.repartitionByRange(n_parts, *gcols, v).withColumn(
        "_pid", F.spark_partition_id()
    )
    if pin:
        ranged = ranged.localCheckpoint(eager=True)
    part_sums = ranged.groupBy("_pid", *gcols).agg(
        F.sum(freq).alias("_pn")
    )
    w_off = Window.partitionBy(*gcols).orderBy("_pid") if gcols else Window.orderBy("_pid")
    offsets = part_sums.select(
        "_pid",
        *gcols,
        F.coalesce(
            F.sum("_pn").over(
                w_off.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
        F.sum("_pn").over(
            (Window.partitionBy(*gcols) if gcols else Window.partitionBy())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_n"),
    )
    w_loc = Window.partitionBy("_pid", *gcols).orderBy(v)
    cum = (
        ranged.withColumn("_lcc", F.sum(freq).over(w_loc))
        .join(F.broadcast(offsets), ["_pid"] + gcols)
        .withColumn("_cc", F.col("_lcc") + F.col("_off"))
    )
    # candidate boundary rows: cover floor or ceil of any position
    cover = (
        f"exists({ps_arr}, p -> "
        f" (_cc - {freq} <= CAST(floor(CAST((_n - 1) AS DOUBLE) * p) AS BIGINT)"
        f"  AND CAST(floor(CAST((_n - 1) AS DOUBLE) * p) AS BIGINT) < _cc)"
        f" OR (_cc - {freq} <= CAST(ceil(CAST((_n - 1) AS DOUBLE) * p) AS BIGINT)"
        f"  AND CAST(ceil(CAST((_n - 1) AS DOUBLE) * p) AS BIGINT) < _cc))"
    )
    cand = cum.where(F.expr(cover))
    expl = cand.select(
        *gcols,
        F.col(v).alias("_v"),
        "_cc",
        F.col(freq).alias("_f"),
        "_n",
        F.posexplode(F.expr(ps_arr)).alias("_j", "_p"),
    ).withColumn(
        "_pos", F.expr("CAST((_n - 1) AS DOUBLE) * _p")
    ).withColumn(
        "_lo", F.expr("CAST(floor(_pos) AS BIGINT)")
    ).withColumn(
        "_hi", F.expr("CAST(ceil(_pos) AS BIGINT)")
    )
    per_j = (
        expl.groupBy(*gcols, "_j")
        .agg(
            F.max(
                F.when(
                    (F.col("_cc") - F.col("_f") <= F.col("_lo"))
                    & (F.col("_lo") < F.col("_cc")),
                    F.col("_v"),
                )
            ).alias("_lv"),
            F.max(
                F.when(
                    (F.col("_cc") - F.col("_f") <= F.col("_hi"))
                    & (F.col("_hi") < F.col("_cc")),
                    F.col("_v"),
                )
            ).alias("_hv"),
            F.max("_pos").alias("_pos"),
            F.max("_lo").alias("_lo"),
            F.max("_hi").alias("_hi"),
        )
        .withColumn(
            "_q",
            F.expr(
                "CASE WHEN _hi = _lo THEN _lv"
                " WHEN _hv = _lv THEN _lv"
                " ELSE (CAST(_hi AS DOUBLE) - _pos) * _lv"
                "      + (_pos - CAST(_lo AS DOUBLE)) * _hv END"
            ),
        )
    )
    return per_j.groupBy(*gcols).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(_j, _q))), s -> s._q)"
        ).alias("qs")
    )


def bits(x):
    return struct.pack("<d", x).hex() if x is not None else None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bigdata_deepfakeanalysis_spark.session import get_spark
    from bigdata_deepfakeanalysis_spark.catalog import table

    spark = get_spark("ab-window-percentile")
    li = table(spark, sf_dir, "lineitem").cache()
    li.count()

    deciles = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    qs = "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)"

    # ---- ungrouped (q_quantile_band_join boundary pass) ----
    counts = li.groupBy("l_extendedprice").agg(
        F.count(F.lit(1)).alias("freq")
    )
    a = counts.agg(
        F.expr(f"percentile(l_extendedprice, {qs}, freq)").alias("qs")
    )
    b = window_percentiles(counts, [], "l_extendedprice", "freq", deciles)
    ra = a.collect()[0]["qs"]
    rb = b.collect()[0]["qs"]
    print("ungrouped A:", [bits(x) for x in ra])
    print("ungrouped B:", [bits(x) for x in rb])
    print("BIT-IDENTICAL:", [bits(x) for x in ra] == [bits(x) for x in rb])

    # ---- grouped (q_robust_scale stats pass) ----
    pc = li.groupBy(F.col("l_returnflag").alias("flag"), "l_extendedprice").agg(
        F.count(F.lit(1)).alias("freq")
    )
    ga = pc.groupBy("flag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25D,0.5D,0.75D), freq)"
        ).alias("qs")
    )
    gb = window_percentiles(
        pc, ["flag"], "l_extendedprice", "freq", [0.25, 0.5, 0.75]
    )
    da = {r["flag"]: [bits(x) for x in r["qs"]] for r in ga.collect()}
    db = {r["flag"]: [bits(x) for x in r["qs"]] for r in gb.collect()}
    print("grouped identical:", da == db)
    if da != db:
        for k in da:
            if da[k] != db.get(k):
                print(" mismatch", k, da[k], db.get(k))

    # ---- timing, interleaved min-of-3 ----
    def t(df, label):
        best = None
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: min {best:.3f}s")
        return best

    for _ in range(3):
        t(a, "A ungrouped percentile-agg")
        t(b, "B ungrouped window-form   ")
        t(ga, "A grouped percentile-agg  ")
        t(gb, "B grouped window-form     ")


if __name__ == "__main__":
    main()
