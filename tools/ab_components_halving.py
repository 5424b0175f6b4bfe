# exec(open('tools/ab_components_halving.py').read()) inside
# tools/profile_session.py, or run standalone:
#     python tools/ab_components_halving.py [--rounds 4]
#
# r13 task 1 (VERDICT r12 "What's wrong" #1): the driver bench measured
# q_dup_cluster_sizes 1.62 s (r11) -> 4.02 s (r12) surviving the
# adjudication re-time, and the r12 code DID touch its path (adaptive
# pointer halving in dedup.connected_components, commit 9a3c7e1). The
# builder's claim is that the compress gate NEVER fires on LSH clique
# graphs (converge in <= 3 rounds, gate requires it >= 2 AND
# changed > first_changed/2), so the halving cannot have slowed this
# query — this harness proves or refutes that with an interleaved
# same-session A/B on the exact q_dup_cluster_sizes input:
#   arm A: the pre-9a3c7e1 plain min-label loop (inlined below,
#          verbatim shape: join + groupBy + left-join step per round)
#   arm B: the current dedup.connected_components (adaptive halving)
# plus a per-arm round count and a label-equality assertion.
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def components_plain(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 20,
) -> tuple[DataFrame, int]:
    """The pre-9a3c7e1 loop: identical seed + step, no compress branch.
    Returns (labels, rounds_run)."""
    edges = pairs.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_nm"))
        .select("id", F.least(F.col("id"), F.col("_nm")).alias("label"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    rounds = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce("nbr_min", F.col("label"))
            ).alias("label"),
            (F.coalesce("nbr_min", F.col("label")) < F.col("label")).alias(
                "chg"
            ),
        ).localCheckpoint(eager=True)
        changed = stepped.where(F.col("chg")).count()
        labels = stepped.drop("chg")
        rounds += 1
        if changed == 0:
            break
    assert changed == 0, "plain loop did not converge"
    return labels.select("id", F.col("label").alias("component")), rounds


def main() -> int:
    rounds = 4
    argv = iter(sys.argv[1:])
    for a in argv:
        if a == "--rounds":
            rounds = int(next(argv))
    sf_dir = "/root/testdata/sf0.1"

    from bigdata_deepfakeanalysis_spark.session import tune
    from bigdata_deepfakeanalysis_spark.operators import dedup
    from bigdata_deepfakeanalysis_spark.catalog import table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune(spark)
    for t in ("documents",):
        table(spark, sf_dir, t).count()

    # the exact q_dup_cluster_sizes candidate input (session-cached,
    # so both arms read the same checkpointed pairs — the query's own
    # warm-bench condition)
    pairs = dedup.lsh_pairs_cached(spark, sf_dir)
    n_pairs = pairs.count()
    print(f"pairs: {n_pairs}")

    # one discarded warmup per arm (codegen, broadcast warm)
    components_plain(pairs)[0].write.format("noop").mode("overwrite").save()
    dedup.connected_components(pairs).write.format("noop").mode(
        "overwrite"
    ).save()

    # label equality once (both arms share the min-label fixpoint)
    a_lbl, a_rounds = components_plain(pairs)
    b_lbl = dedup.connected_components(pairs)
    diff = a_lbl.exceptAll(b_lbl).count() + b_lbl.exceptAll(a_lbl).count()
    print(f"label diff rows: {diff} (plain rounds: {a_rounds})")
    assert diff == 0

    ta, tb = [], []
    for i in range(rounds):
        t0 = time.time()
        lbl, _ = components_plain(pairs)
        lbl.write.format("noop").mode("overwrite").save()
        ta.append(round(time.time() - t0, 3))
        t0 = time.time()
        dedup.connected_components(pairs).write.format("noop").mode(
            "overwrite"
        ).save()
        tb.append(round(time.time() - t0, 3))
        print(f"round {i}: plain {ta[-1]}  halving {tb[-1]}", flush=True)
    print(
        f"RESULT plain(min={min(ta)}, all={ta})"
        f" halving(min={min(tb)}, all={tb})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
