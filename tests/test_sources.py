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
