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


def test_heatmap_stub_invariants(spark):
    df = all_queries()["q_gradcam_stub"](spark, SF_DIR).toPandas()
    assert len(df) == 40
    assert (df.n_cells == df.h * df.w).all()
    assert (df.hm_min >= 0).all() and (df.hm_max <= 1.0).all()
    assert (~df.used_torch).all()
