"""Explainability UDFs — Grad-CAM (M8) and ViT attention rollout (M9).

The reference computes these with torch autograd hooks
(``src/gradcam_dynamic.py:132-180`` Grad-CAM; ``:213-316`` rollout) —
not expressible relationally, so the engine treats them as black-box
tensor UDFs (SURVEY §2.8): ``mapInPandas`` over the media table,
emitting a per-image heatmap as ``array<float>`` + its (h, w).

Torch is an optional extra (absent in this container, task spec:
stub). When missing, a clearly-marked deterministic fake produces
heatmaps with the REAL output contract — min-max-normalized to [0, 1]
(the reference normalizes CAMs the same way, ``gradcam_dynamic.py:
174-175``) at (h//8, w//8) resolution (conv-stage downsampling) — so
schema, batch shape, normalization invariants, and partition-level
model-init (X10) are all exercised and tested.

Scale design: one pass of mapInPandas per image batch, model loaded
once per partition, heatmaps emitted as flat arrays with shape columns
(data model D4) — the same execution shape as the surrogate featurizer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal import media
from .registry import query

_HEATMAP_SCHEMA = (
    "media_id bigint, method string, h int, w int,"
    " heatmap array<float>, used_torch boolean"
)


def _heatmap_udf(method: str):
    """Build the mapInPandas fn. Closure is self-contained (stdlib +
    numpy/pandas only) so workers need no engine package on sys.path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        # A REAL implementation replaces the body of this loop with
        # per-partition model init (X10) + forward/backward hooks on the
        # target layer (M8) / per-block attention capture (M9) — see
        # src/gradcam_dynamic.py:132-180,213-316. That needs a trained
        # torch model (an optional extra this container cannot carry),
        # so the engine always runs the deterministic stub below and
        # flags used_torch=False; merely having torch importable must
        # not change behavior (a model is still absent).
        for pdf in batches:
            rows = []
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                hh, ww = max(h // 8, 1), max(w // 8, 1)
                # deterministic fake: md5-seeded pseudo-activation map,
                # min-max normalized exactly like the reference's CAM
                seed = _hashlib.md5(
                    bytes(content) + method.encode()
                ).digest()
                raw = _np.frombuffer(
                    (seed * ((hh * ww) // len(seed) + 1))[: hh * ww],
                    dtype=_np.uint8,
                ).astype(_np.float64)
                lo, hi = raw.min(), raw.max()
                norm = (raw - lo) / (hi - lo + 1e-8)
                rows.append(
                    (mid, method, hh, ww, norm.astype(float).tolist(), False)
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "method", "h", "w", "heatmap", "used_torch",
                ],
            )

    return run


def gradcam(media_df: DataFrame) -> DataFrame:
    """M8 — Grad-CAM heatmaps (torch-gated; deterministic stub without)."""
    return media_df.select(
        "media_id", "content", "width", "height"
    ).mapInPandas(_heatmap_udf("gradcam"), _HEATMAP_SCHEMA)


def attention_rollout(media_df: DataFrame) -> DataFrame:
    """M9 — ViT attention rollout (torch-gated; stub without)."""
    return media_df.select(
        "media_id", "content", "width", "height"
    ).mapInPandas(_heatmap_udf("rollout"), _HEATMAP_SCHEMA)


@query("q_gradcam_stub")  # rows-only: autograd output is model-specific
def q_gradcam_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 plumbing — heatmap summary per image (full arrays stay in the
    engine; the query emits shape + normalization invariants)."""
    hm = gradcam(media(spark, sf_dir).where(F.col("media_id") < 40))
    return hm.select(
        "media_id",
        "method",
        "h",
        "w",
        F.size("heatmap").alias("n_cells"),
        F.array_min("heatmap").alias("hm_min"),
        F.array_max("heatmap").alias("hm_max"),
        "used_torch",
    ).orderBy("media_id")


@query("q_attention_rollout_stub")  # rows-only
def q_attention_rollout_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 plumbing — same contract as q_gradcam_stub for the rollout
    method (the reference's Grad-CAM cap is 40 images per group —
    BASELINE.md — mirrored here)."""
    hm = attention_rollout(media(spark, sf_dir).where(F.col("media_id") < 40))
    return hm.select(
        "media_id",
        "method",
        "h",
        "w",
        F.size("heatmap").alias("n_cells"),
        F.array_min("heatmap").alias("hm_min"),
        F.array_max("heatmap").alias("hm_max"),
        "used_torch",
    ).orderBy("media_id")
