"""Multimodal plumbing: binary columns, Arrow batch shape, stubbed
decode determinism (SURVEY §7.5)."""

from __future__ import annotations

from bigdata_deepfakeanalysis_spark.multimodal import media, resize_half
from bigdata_deepfakeanalysis_spark.registry import all_queries

from .conftest import SF_DIR


def test_media_binary_column(spark):
    df = media(spark, SF_DIR)
    assert df.schema["content"].dataType.typeName() == "binary"
    row = df.where("media_id = 1").first()
    assert len(row.content) == 32  # two md5s = 64 hex chars = 32 bytes
    assert bytes(row.content).hex() == row.hex_payload


def test_resize_stub_shapes_and_determinism(spark):
    a = all_queries()["q_resize_stub"](spark, SF_DIR).toPandas()
    assert list(a.columns) == [
        "media_id", "new_width", "new_height", "checksum", "decoded",
    ]
    assert len(a) == 100
    assert (~a.decoded).all()  # container has no imaging libs
    src = media(spark, SF_DIR).where("media_id < 100").toPandas()
    m = a.merge(src, on="media_id")
    assert (m.new_width == m.width // 2).all()
    assert (m.new_height == m.height // 2).all()
    b = all_queries()["q_resize_stub"](spark, SF_DIR).toPandas()
    assert (a.checksum.values == b.checksum.values).all()


def test_heatmap_invariants(spark):
    df = all_queries()["q_gradcam_surrogate"](spark, SF_DIR).toPandas()
    assert len(df) == 40
    assert (df.n_cells == df.h * df.w).all()
    assert (df.hm_min == 0.0).all() and df.hm_norm_valid.all()
    assert (~df.used_torch).all()
    # rollout emits the CLS->patch grid (7x7) and is deterministic
    r1 = all_queries()["q_attention_rollout_surrogate"](spark, SF_DIR).toPandas()
    assert (r1.n_cells == 49).all() and (r1.h == 7).all()
    r2 = all_queries()["q_attention_rollout_surrogate"](spark, SF_DIR).toPandas()
    assert (r1.hm_min.values == r2.hm_min.values).all()
    assert (r1.hm_norm_valid.values == r2.hm_norm_valid.values).all()


def test_rollout_math_matches_numpy_reference(spark):
    """The chained rollout of row-stochastic matrices must itself be
    row-stochastic BEFORE normalization — verified by recomputing one
    image's rollout from the same surrogate generator."""
    import hashlib

    import numpy as np

    from bigdata_deepfakeanalysis_spark.multimodal import media

    row = (
        media(spark, SF_DIR)
        .where("media_id = 0")
        .select("content")
        .collect()[0]
    )
    content = bytes(row.content)
    t = 50
    n = 4 * 2 * t * t
    seed = hashlib.md5(content + b"attn").digest()
    buf = (seed * (n // len(seed) + 1))[:n]
    attn = (
        np.frombuffer(buf, dtype=np.uint8).astype(np.float64).reshape(
            4, 2, t, t
        )
        / 255.0
    )
    attn = np.exp(attn * 4.0)
    attn = attn / attn.sum(axis=-1, keepdims=True)
    result = np.eye(t)
    for layer in range(4):
        a = attn[layer].mean(axis=0) + np.eye(t)
        a = a / a.sum(axis=-1, keepdims=True)
        result = a @ result
    assert np.allclose(result.sum(axis=-1), 1.0)  # row-stochastic chain
    cls = result[0, 1:]
    expected = (cls - cls.min()) / (cls.max() - cls.min() + 1e-8)

    from bigdata_deepfakeanalysis_spark.explainability import (
        attention_rollout,
    )

    hm = (
        attention_rollout(media(spark, SF_DIR).where("media_id = 0"))
        .collect()[0]
        .heatmap
    )
    assert np.allclose(np.array(hm), expected, atol=1e-6)


def test_torch_extras_gate_raises_cleanly_without_torch(spark):
    """The optional torch path must fail eagerly on the driver with a
    clear message when torch is absent — never mid-job on an executor."""
    import pytest

    from bigdata_deepfakeanalysis_spark import torch_extras
    from bigdata_deepfakeanalysis_spark.multimodal import media

    from .conftest import SF_DIR

    m = media(spark, SF_DIR).limit(2)
    if torch_extras.HAS_TORCH:
        pytest.skip("torch present: gate not exercisable")
    with pytest.raises(NotImplementedError, match="torch optional extra"):
        torch_extras.torch_featurize(m)
    with pytest.raises(NotImplementedError, match="torch optional extra"):
        torch_extras.torch_multistage(m)
    with pytest.raises(NotImplementedError, match="torch optional extra"):
        torch_extras.torch_gradcam(m)
    with pytest.raises(NotImplementedError, match="torch optional extra"):
        torch_extras.torch_attention_rollout(m)


def test_phash_finds_every_planted_image_copy(spark):
    """Byte-swapped copies are mean-invariant, so each planted pair is
    within Hamming 2 by construction — the band join must find all."""
    from bigdata_deepfakeanalysis_spark.registry import all_queries

    from .conftest import SF_DIR

    rows = all_queries()["q_phash_near_dup"](spark, SF_DIR).collect()
    found = {(r.doc_a, r.doc_b) for r in rows}
    planted = {(m, m + 100000) for m in range(0, 60, 3)}
    missing = planted - found
    assert not missing, f"planted copies not recovered: {sorted(missing)}"
    assert all(r.hamming <= 2 for r in rows)
