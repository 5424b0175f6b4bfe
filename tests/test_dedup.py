"""Dedup-family invariants beyond the oracle compare: the IVF-blocked
cosine variant must still find every planted scaled copy, and
connected-components must fail loud instead of returning partial
labels."""

from __future__ import annotations

import pytest

from bigdata_deepfakeanalysis_spark.registry import all_queries

from .conftest import SF_DIR


def test_ivf_cosine_near_dup_covers_planted_copies(spark):
    """aug_emb plants vec_id+1000000 as a 1.01-scaled copy of every
    vec_id % 5 == 0 vector (cosine exactly 1). k-means must put each
    copy in its original's cell, so the IVF-blocked pair set must
    contain every (v, v+1000000) pair."""
    pairs = all_queries()["q_cosine_near_dup_ivf"](spark, SF_DIR).toPandas()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    planted = [
        r.vec_id
        for r in emb.where("vec_id % 5 = 0").select("vec_id").collect()
    ]
    got = set(zip(pairs["vec_a"], pairs["vec_b"]))
    missing = [v for v in planted if (v, v + 1000000) not in got]
    assert not missing, f"planted copies not paired: {missing[:5]}"


def test_semantic_dedup_removes_planted_copies(spark):
    """Every label's removed count must equal its planted-copy count:
    originals (lower id = component label) survive, the 1.01-scaled
    copies do not."""
    from pyspark.sql import functions as F

    out = all_queries()["q_semantic_dedup"](spark, SF_DIR).toPandas()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    planted = (
        emb.where("vec_id % 5 = 0")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_planted"))
        .toPandas()
        .set_index("label")["n_planted"]
    )
    for _, row in out.iterrows():
        assert row["n_removed"] >= planted.get(row["label"], 0), row
        assert (
            row["n_survivors"] + row["n_removed"] == row["n_vectors"]
        ), row


def test_connected_components_raises_on_non_convergence(spark):
    """A 5-node chain needs 4 propagation rounds; max_iter=1 must raise,
    never silently return partial labels."""
    from bigdata_deepfakeanalysis_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1).collect()

    ok = connected_components(chain, max_iter=10)
    labels = {r.component for r in ok.collect()}
    assert labels == {0}
