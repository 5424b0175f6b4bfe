"""Sources/sinks: glob pushdown at listing time and partition pruning
on the partitioned read-back (SURVEY X1/X2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_deepfakeanalysis_spark.operators.fixtures import grouped_embeddings
from bigdata_deepfakeanalysis_spark.operators.sources import (
    scan_images,
    write_image_tree,
)

from .conftest import SF_DIR


def test_glob_filter_prunes_decoys(spark):
    write_image_tree()
    df = scan_images(spark)
    files = [r.filename for r in df.select("filename").collect()]
    assert len(files) == 100
    assert all(f.endswith(".png") for f in files)


def test_partitioned_readback_prunes(spark):
    from bigdata_deepfakeanalysis_spark.catalog import staging_dir

    out = str(staging_dir("roundtrip") / "grouped_embeddings")
    (
        grouped_embeddings(spark, SF_DIR)
        .write.mode("overwrite")
        .partitionBy("group")
        .parquet(out)
    )
    back = spark.read.parquet(out).where(F.col("group") == "gen1")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "gen1" in plan  # the group predicate reached the file index
    # and the pruned scan still returns only that partition's rows
    groups = [r.group for r in back.select("group").distinct().collect()]
    assert groups == ["gen1"]


def test_npz_roundtrip_cell_exact(spark):
    """npz store → binaryFile+mapInPandas decode must reproduce the D4
    fixture cell-for-cell (float32-exact), not just in aggregate."""
    from pyspark.sql import functions as F

    from bigdata_deepfakeanalysis_spark.operators.fixtures import featuremaps
    from bigdata_deepfakeanalysis_spark.operators.sources import (
        read_npz_featuremaps,
        write_npz_store,
    )

    base = write_npz_store(spark, SF_DIR)
    back = read_npz_featuremaps(spark, base)
    src = featuremaps(spark, SF_DIR).where(F.col("vec_id") < 30).select(
        "group", "stem", "stage", "c", "h", "w", "data"
    )
    joined = src.alias("s").join(
        back.alias("b"), ["group", "stem", "stage"], "full_outer"
    )
    n_src, n_back = src.count(), back.count()
    assert n_src == n_back == joined.count() == 90
    bad = joined.where(
        (F.col("s.c") != F.col("b.c"))
        | (F.col("s.h") != F.col("b.h"))
        | (F.col("s.w") != F.col("b.w"))
        | (F.col("s.data") != F.col("b.data"))
    ).count()
    assert bad == 0
