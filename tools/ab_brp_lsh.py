# exec(open('tools/ab_brp_lsh.py').read()) — A/B: status-quo
# q_mllib_brp_lsh_join (exact d2 fold inside the approxSimilarityJoin
# candidate condition) vs distinct-ids-first + broadcast re-attach +
# one fold per distinct pair. Checks row identity first, then times.
import time as _time

from pyspark.sql import functions as F

from bigdata_deepfakeanalysis_spark.catalog import table as _table
from bigdata_deepfakeanalysis_spark.ml import _BRP_D2, _BRP_N


def brp_variant(spark, sf_dir):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = (
        _table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _BRP_N)
        .select(
            "vec_id",
            "embedding",
            array_to_vector(
                F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            ).alias("features"),
        )
    )
    emb = emb.localCheckpoint(eager=True)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=10,
        seed=42,
    ).fit(emb)
    import math

    cand_ids = (
        lsh.approxSimilarityJoin(
            emb, emb, math.sqrt(_BRP_D2) + 1e-9, distCol="dist"
        )
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
        )
        .where(F.col("vec_a") < F.col("vec_b"))
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    d2 = (
        "aggregate(zip_with(ea, eb,"
        " (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        cand_ids.join(F.broadcast(ea), "vec_a")
        .join(F.broadcast(eb), "vec_b")
        .select(
            F.col("vec_a").cast("bigint").alias("vec_a"),
            F.col("vec_b").cast("bigint").alias("vec_b"),
            F.expr(d2).alias("d2"),
        )
        .where(F.col("d2") <= _BRP_D2)
        .select("vec_a", "vec_b", F.round("d2", 9).alias("dist2"))
        .orderBy("vec_a", "vec_b")
    )


def run_ab(spark, sf_dir, qs):
    old = qs["q_mllib_brp_lsh_join"](spark, sf_dir)
    new = brp_variant(spark, sf_dir)
    a = [tuple(r) for r in old.collect()]
    b = [tuple(r) for r in new.collect()]
    print("rows", len(a), len(b), "IDENTICAL" if a == b else "MISMATCH")
    for label, thunk in (
        ("old", lambda: qs["q_mllib_brp_lsh_join"](spark, sf_dir)),
        ("new", lambda: brp_variant(spark, sf_dir)),
        ("old", lambda: qs["q_mllib_brp_lsh_join"](spark, sf_dir)),
        ("new", lambda: brp_variant(spark, sf_dir)),
        ("old", lambda: qs["q_mllib_brp_lsh_join"](spark, sf_dir)),
        ("new", lambda: brp_variant(spark, sf_dir)),
    ):
        t0 = _time.time()
        df = thunk()
        df.write.format("noop").mode("overwrite").save()
        print(label, round(_time.time() - t0, 2))
    print("AB_BRP_DONE")
