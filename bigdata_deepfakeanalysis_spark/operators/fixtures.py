"""Reference-shaped fixtures (FIXTURES.md part b), derived in-query from
the driver's ``embeddings`` table so the DuckDB oracle sees identical
inputs. Mirrors the reference's data model (SURVEY.md §1.1):

- ``grouped_embeddings`` — the embedding-JSON table D3
  (``src/extract_embedding.py:134-138``): group / image_key / vector.
- ``featuremaps`` — the npz tensor store D4
  (``src/feature_map_analysis.py:196-205``): per (stem, stage) a dense
  [C,H,W] float tensor, here C=4,H=3,W=3 flattened row-major, sliced
  deterministically out of the embedding vector.
- ``prefixed_keys`` — merged REAL/FAKE key table
  (``src/extract_embedding_multiple.py:183``).

Each Spark builder has a byte-equivalent DuckDB CTE string; queries
embed the CTE so the driver's oracle derives the same fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

# ---------------------------------------------------------------- D3

def grouped_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group = genN (N = label mod 4), image_key = img_<vec_id>.png."""
    return table(spark, sf_dir, "embeddings").select(
        F.concat(F.lit("gen"), (F.col("label") % 4).cast("string")).alias("group"),
        F.concat(F.lit("img_"), F.col("vec_id").cast("string"), F.lit(".png")).alias(
            "image_key"
        ),
        F.col("embedding").alias("vector"),
        F.col("vec_id"),
    )


GROUPED_EMBEDDINGS_CTE = """
grouped_embeddings AS (
    SELECT 'gen' || CAST(label % 4 AS VARCHAR) AS "group",
           'img_' || CAST(vec_id AS VARCHAR) || '.png' AS image_key,
           embedding AS vector,
           vec_id
    FROM embeddings)
"""

# ---------------------------------------------------------------- D4
# Stage s slices 36 floats (=4x3x3) out of the 64-dim embedding with a
# stage-dependent offset, so stages differ but stay byte-identical
# across engines (no libm, no RNG).

FM_C, FM_H, FM_W = 4, 3, 3
_FM_LEN = FM_C * FM_H * FM_W  # 36


def featuremaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            "label",
            "embedding",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("stage_n"),
        )
        .select(
            F.lit("resnet50").alias("backbone"),
            F.concat(F.lit("gen"), (F.col("label") % 4).cast("string")).alias("group"),
            F.concat(F.lit("img_"), F.col("vec_id").cast("string")).alias("stem"),
            F.concat(F.lit("stage"), F.col("stage_n").cast("string")).alias("stage"),
            F.lit(FM_C).alias("c"),
            F.lit(FM_H).alias("h"),
            F.lit(FM_W).alias("w"),
            F.slice(
                F.col("embedding"), (F.col("stage_n") - 1) * 14 + 1, _FM_LEN
            ).alias("data"),
            F.col("vec_id"),
        )
    )


FEATUREMAPS_CTE = f"""
featuremaps AS (
    SELECT 'resnet50' AS backbone,
           'gen' || CAST(label % 4 AS VARCHAR) AS "group",
           'img_' || CAST(vec_id AS VARCHAR) AS stem,
           'stage' || CAST(stage_n AS VARCHAR) AS stage,
           {FM_C} AS c, {FM_H} AS h, {FM_W} AS w,
           embedding[(stage_n - 1) * 14 + 1 : (stage_n - 1) * 14 + {_FM_LEN}] AS data,
           vec_id
    FROM embeddings, (SELECT UNNEST([1, 2, 3]) AS stage_n))
"""

# ---------------------------------------------------------------- merged keys

def prefixed_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL/FAKE-prefixed merged key table + some non-matching keys
    (reference drops those at demux — compare_embeddings_vs_features
    .py:105-115)."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        F.when(F.col("vec_id") % 3 == 0, F.concat(F.lit("REAL/img_"), F.col("vec_id")))
        .when(F.col("vec_id") % 3 == 1, F.concat(F.lit("FAKE/img_"), F.col("vec_id")))
        .otherwise(F.concat(F.lit("MISC/img_"), F.col("vec_id")))
        .alias("key"),
        F.col("vec_id"),
        F.col("embedding").alias("vector"),
    )


PREFIXED_KEYS_CTE = """
prefixed_keys AS (
    SELECT CASE
             WHEN vec_id % 3 = 0 THEN 'REAL/img_' || CAST(vec_id AS VARCHAR)
             WHEN vec_id % 3 = 1 THEN 'FAKE/img_' || CAST(vec_id AS VARCHAR)
             ELSE 'MISC/img_' || CAST(vec_id AS VARCHAR)
           END AS key,
           vec_id,
           embedding AS vector
    FROM embeddings)
"""
