"""A/B: exact weighted percentile via ObjectHashAggregate Percentile
(status quo) vs a two-pass equi-width-HISTOGRAM rank selection:

  pass 1 (codegen hash agg): per-group (min, max, N) + per-(group, bin)
         counts over ~1-4k value bins;
  rank math: position = p * (N - 1), lo/hi integer ranks — computed
         in-plan from the tiny bins table;
  pass 2 (codegen filter + small window): only rows in the <= 2*|ps|
         bins that contain a target rank are re-scanned, sorted
         WITHIN those tiny bins, and the exact rank-th values picked;
  interpolation mirrors Percentile.getPercentile term-for-term
         ((hi-pos)*lv + (pos-lo)*hv with the two short-circuits).

Unlike Percentile, no operator ever holds the full distinct-value set
in one task: the histogram is n_bins rows and the second pass touches
a bounded slice — the shape that survives 100 TB where the single
final-task map merge cannot.

Usage: run inside the profile REPL via exec(), then
    histo_check(spark, SF_DIR)
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_N_BINS = 1024


def exact_percentiles_histo(
    df: DataFrame,
    groups: list,
    v: str,
    ps: list,
    weight: str | None = None,
    n_bins: int = _N_BINS,
) -> DataFrame:
    """Exact percentiles of ``v`` (DOUBLE) per ``groups``, bit-identical
    to ``percentile(v, array(ps)[, weight])``. Returns one row per group
    with columns _j (0..len(ps)-1 exploded) -> wide array ``qs``."""
    gcols = list(groups)
    w = F.col(weight) if weight else F.lit(1).cast("long")
    base = df.select(*gcols, F.col(v).alias("_v"), w.alias("_w"))

    gb = base.groupBy(*gcols) if gcols else base.groupBy()
    stats = gb.agg(
        F.min("_v").alias("_mn"),
        F.max("_v").alias("_mx"),
        F.sum("_w").alias("_n"),
    )
    binned = base.join(F.broadcast(stats), gcols) if gcols else base.join(
        F.broadcast(stats)
    )
    bin_expr = F.when(
        F.col("_mx") > F.col("_mn"),
        F.least(
            F.lit(n_bins - 1),
            F.floor(
                (F.col("_v") - F.col("_mn"))
                / (F.col("_mx") - F.col("_mn"))
                * n_bins
            ),
        ),
    ).otherwise(F.lit(0))
    binned = binned.withColumn("_b", bin_expr.cast("long"))
    bins = binned.groupBy(*gcols, "_b").agg(F.sum("_w").alias("_bn"))
    w_cum = (
        Window.partitionBy(*gcols).orderBy("_b")
        if gcols
        else Window.orderBy("_b")
    )
    bins_cum = bins.select(
        *gcols,
        "_b",
        (F.sum("_bn").over(w_cum) - F.col("_bn")).alias("_cb"),  # before
        F.sum("_bn").over(w_cum).alias("_ce"),  # through this bin
    )

    # target integer ranks: for each p, lo = floor(p*(n-1)), hi = ceil
    ps_arr = "array(" + ",".join(f"CAST({p!r} AS DOUBLE)" for p in ps) + ")"
    ranks = (
        stats.select(
            *gcols,
            "_n",
            F.posexplode(F.expr(ps_arr)).alias("_j", "_p"),
        )
        .withColumn("_pos", F.expr("CAST((_n - 1) AS DOUBLE) * _p"))
        .select(
            *gcols,
            "_j",
            "_pos",
            F.explode(
                F.array(
                    F.expr("CAST(floor(_pos) AS BIGINT)"),
                    F.expr("CAST(ceil(_pos) AS BIGINT)"),
                )
            ).alias("_r"),
        )
    )
    # bin containing rank r: _cb <= r < _ce. ranks may carry duplicate
    # (j, r) rows (floor == ceil); downstream per_j MAXes are idempotent
    # under them, so no dedup exchange is spent here.
    if gcols:
        cond = (F.col("_r") >= F.col("_cb")) & (F.col("_r") < F.col("_ce"))
        need = ranks.alias("rk").join(
            F.broadcast(bins_cum.alias("bc")),
            [F.col(f"rk.{c}") == F.col(f"bc.{c}") for c in gcols],
        ).where(cond).select(
            *[F.col(f"rk.{c}").alias(c) for c in gcols],
            "_j", "_pos", "_r", "_b", "_cb",
        )
    else:
        need = ranks.crossJoin(F.broadcast(bins_cum)).where(
            (F.col("_r") >= F.col("_cb")) & (F.col("_r") < F.col("_ce"))
        ).select("_j", "_pos", "_r", "_b", "_cb")

    need_bins = need.select(*gcols, "_b", "_cb").dropDuplicates(
        gcols + ["_b"]
    )
    # pass 2: rows in needed bins only; exact rank within the bin
    slice_ = binned.join(F.broadcast(need_bins), gcols + ["_b"])
    w_loc = Window.partitionBy(*gcols, "_b").orderBy("_v")
    sliced = slice_.groupBy(*gcols, "_b", "_cb", "_v").agg(
        F.sum("_w").alias("_f")
    ).withColumn("_lc", F.sum("_f").over(w_loc)).withColumn(
        "_cum", F.col("_cb") + F.col("_lc")
    )
    hit = F.broadcast(need).join(sliced, gcols + ["_b"]).where(
        (F.col("_cum") - F.col("_f") <= F.col("_r"))
        & (F.col("_r") < F.col("_cum"))
    ).select(*gcols, "_j", "_pos", "_r", "_v")
    per_j = hit.groupBy(*gcols, "_j", "_pos").agg(
        F.max(
            F.when(F.col("_r") == F.expr("CAST(floor(_pos) AS BIGINT)"), F.col("_v"))
        ).alias("_lv"),
        F.max(
            F.when(F.col("_r") == F.expr("CAST(ceil(_pos) AS BIGINT)"), F.col("_v"))
        ).alias("_hv"),
    ).withColumn(
        "_q",
        F.expr(
            "CASE WHEN ceil(_pos) = floor(_pos) THEN _lv"
            " WHEN _hv = _lv THEN _lv"
            " ELSE (CAST(ceil(_pos) AS DOUBLE) - _pos) * _lv"
            "      + (_pos - CAST(floor(_pos) AS DOUBLE)) * _hv END"
        ),
    )
    gb2 = per_j.groupBy(*gcols) if gcols else per_j.groupBy()
    return gb2.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(_j, _q))), s -> s._q)"
        ).alias("qs")
    )


def histo_check(spark, sf_dir):
    import struct
    import time

    from bigdata_deepfakeanalysis_spark.catalog import table

    def bits(x):
        return struct.pack("<d", x).hex() if x is not None else None

    li = table(spark, sf_dir, "lineitem")
    deciles = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    qs = "array(" + ",".join(f"{p}D" for p in deciles) + ")"

    a = li.agg(F.expr(f"percentile(l_extendedprice, {qs})").alias("qs"))
    b = exact_percentiles_histo(li, [], "l_extendedprice", deciles)
    ra = [bits(x) for x in a.collect()[0]["qs"]]
    rb = [bits(x) for x in b.collect()[0]["qs"]]
    print("ungrouped BIT-IDENTICAL:", ra == rb)
    if ra != rb:
        print(" A:", ra)
        print(" B:", rb)

    ga = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25D,0.5D,0.75D))"
        ).alias("qs")
    )
    gb = exact_percentiles_histo(
        li.select(F.col("l_returnflag").alias("flag"), "l_extendedprice"),
        ["flag"],
        "l_extendedprice",
        [0.25, 0.5, 0.75],
    )
    da = {r["flag"]: [bits(x) for x in r["qs"]] for r in ga.collect()}
    db = {r["flag"]: [bits(x) for x in r["qs"]] for r in gb.collect()}
    print("grouped BIT-IDENTICAL:", da == db)
    if da != db:
        for k in da:
            if da[k] != db.get(k):
                print(" mismatch", k, da[k], db.get(k))

    def t(df, label):
        best = None
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: min {best:.3f}s")

    for _ in range(2):
        t(a, "A ungrouped percentile-agg")
        t(b, "B ungrouped histo-2pass   ")
        t(ga, "A grouped percentile-agg  ")
        t(gb, "B grouped histo-2pass     ")
    print("HISTO_DONE")
