"""Explainability UDFs — Grad-CAM (M8) and ViT attention rollout (M9).

The reference computes these with torch autograd hooks
(``src/gradcam_dynamic.py:132-180`` Grad-CAM; ``:213-316`` rollout).
A trained torch model is an optional extra this container cannot carry,
so — as with the M1/M3 featurizers (SURVEY §7.5) — the TENSORS are
deterministic md5-seeded surrogates, but the OPERATOR MATH is the
reference's real computation, executed in full:

- Grad-CAM: channel weights = GAP of the gradients over (h, w);
  ``cam = relu(Σ_c w_c · A_c)``; min-max normalization
  (``gradcam_dynamic.py:168-175``).
- Rollout: per layer mean over heads, add identity, row-normalize;
  chain the layer matrices; CLS row → patch grid; min-max normalize
  (``gradcam_dynamic.py:262-300``).

``used_torch=False`` marks the surrogate tensor source; swapping the
surrogate generator for real hook captures changes nothing downstream.

Scale design: one pass of mapInPandas per image batch, tensor state
built once per row from the image bytes, heatmaps emitted as flat
arrays with shape columns (data model D4) — the same execution shape as
the surrogate featurizer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal import MEDIA_CTE, media
from .registry import query

_HEATMAP_SCHEMA = (
    "media_id bigint, method string, h int, w int,"
    " heatmap array<float>, used_torch boolean"
)

_N_CHANNELS = 8       # surrogate conv channels (M8)
_N_LAYERS = 4         # surrogate transformer depth (M9)
_N_HEADS = 2          # surrogate attention heads
_GRID = 7             # ViT patch grid -> 7x7 = 49 patches + CLS


def _heatmap_udf(method: str):
    """Build the mapInPandas fn. Closure is self-contained (stdlib +
    numpy/pandas only) so workers need no engine package on sys.path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def _surrogate(content: bytes, tag: str, shape: tuple) -> _np.ndarray:
            """md5-seeded uniform tensor in [0, 1) — deterministic per
            (image bytes, tag); stands in for a hook capture."""
            n = int(_np.prod(shape))
            seed = _hashlib.md5(bytes(content) + tag.encode()).digest()
            buf = (seed * (n // len(seed) + 1))[:n]
            return (
                _np.frombuffer(buf, dtype=_np.uint8)
                .astype(_np.float64)
                .reshape(shape)
                / 255.0
            )

        def _gradcam(content: bytes, h: int, w: int):
            hh, ww = max(h // 8, 1), max(w // 8, 1)
            acts = _surrogate(content, "acts", (_N_CHANNELS, hh, ww))
            # centered so relu has something to clip (real grads are
            # signed; uniform [0,1) grads would make relu a no-op)
            grads = _surrogate(content, "grads", (_N_CHANNELS, hh, ww)) - 0.5
            weights = grads.mean(axis=(1, 2))          # GAP of gradients
            cam = _np.einsum("c,chw->hw", weights, acts)
            cam = _np.maximum(cam, 0.0)                # relu
            lo, hi = cam.min(), cam.max()
            norm = (cam - lo) / (hi - lo + 1e-8)       # ref :174-175
            return hh, ww, norm.ravel()

        def _rollout(content: bytes):
            t = _GRID * _GRID + 1                      # CLS + patches
            attn = _surrogate(
                content, "attn", (_N_LAYERS, _N_HEADS, t, t)
            )
            # softmax per row so each head is a real attention matrix
            attn = _np.exp(attn * 4.0)
            attn = attn / attn.sum(axis=-1, keepdims=True)
            result = _np.eye(t)
            for layer in range(_N_LAYERS):
                a = attn[layer].mean(axis=0)           # mean over heads
                a = a + _np.eye(t)                     # + identity
                a = a / a.sum(axis=-1, keepdims=True)  # row-normalize
                result = a @ result                    # chain product
            cls_to_patches = result[0, 1:]             # CLS row
            lo, hi = cls_to_patches.min(), cls_to_patches.max()
            norm = (cls_to_patches - lo) / (hi - lo + 1e-8)
            return _GRID, _GRID, norm

        for pdf in batches:
            rows = []
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                if method == "gradcam":
                    hh, ww, hm = _gradcam(bytes(content), int(h), int(w))
                else:
                    hh, ww, hm = _rollout(bytes(content))
                rows.append(
                    (mid, method, hh, ww, hm.astype(float).tolist(), False)
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "method", "h", "w", "heatmap", "used_torch",
                ],
            )

    return run


def gradcam(media_df: DataFrame) -> DataFrame:
    """M8 — Grad-CAM heatmaps: real GAP-weight/relu/normalize math over
    surrogate activation + gradient tensors (torch hooks would replace
    only the tensor source)."""
    return media_df.select(
        "media_id", "content", "width", "height"
    ).mapInPandas(_heatmap_udf("gradcam"), _HEATMAP_SCHEMA)


def attention_rollout(media_df: DataFrame) -> DataFrame:
    """M9 — attention rollout: real head-mean/+I/row-normalize/chain
    math over surrogate per-layer attention matrices."""
    return media_df.select(
        "media_id", "content", "width", "height"
    ).mapInPandas(_heatmap_udf("rollout"), _HEATMAP_SCHEMA)


def _heatmap_summary(hm: DataFrame) -> DataFrame:
    """Driver-checkable heatmap contract: shape columns are exact;
    min-max normalization makes ``hm_min`` EXACTLY 0.0 ((x-lo)/(hi-lo+ε)
    maps the minimum to 0 bit-exactly) and pins ``hm_max`` to either
    exactly 0.0 (a degenerate map — Grad-CAM's relu can clip every cell
    on small grids) or (0.9, 1.0] — so the summary is hash-comparable
    even though the heatmap VALUES come from the engine-local surrogate
    tensors (those are covered by the numpy reference test in
    tests/test_multimodal.py)."""
    mx = F.array_max("heatmap")
    return hm.select(
        "media_id",
        "method",
        "h",
        "w",
        F.size("heatmap").alias("n_cells"),
        F.array_min("heatmap").cast("double").alias("hm_min"),
        (
            (mx == 0.0) | ((mx > 0.9) & (mx <= 1.0))
        ).alias("hm_norm_valid"),
        "used_torch",
    ).orderBy("media_id")


_GRADCAM_ORACLE = f"""
    WITH {MEDIA_CTE.strip()}
    SELECT media_id, 'gradcam' AS method,
           CAST(greatest(height // 8, 1) AS INTEGER) AS h,
           CAST(greatest(width // 8, 1) AS INTEGER) AS w,
           CAST(greatest(height // 8, 1) * greatest(width // 8, 1)
                AS INTEGER) AS n_cells,
           CAST(0.0 AS DOUBLE) AS hm_min,
           TRUE AS hm_norm_valid,
           FALSE AS used_torch
    FROM media WHERE media_id < 40 ORDER BY media_id
    """

_ROLLOUT_ORACLE = f"""
    WITH {MEDIA_CTE.strip()}
    SELECT media_id, 'rollout' AS method,
           CAST({_GRID} AS INTEGER) AS h,
           CAST({_GRID} AS INTEGER) AS w,
           CAST({_GRID * _GRID} AS INTEGER) AS n_cells,
           CAST(0.0 AS DOUBLE) AS hm_min,
           TRUE AS hm_norm_valid,
           FALSE AS used_torch
    FROM media WHERE media_id < 40 ORDER BY media_id
    """


@query("q_gradcam_surrogate", _GRADCAM_ORACLE)
def q_gradcam_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — heatmap summary per image (full arrays stay in the engine;
    the query emits shape + normalization invariants, all of which the
    oracle recomputes — only the heatmap values themselves are
    engine-local, and the numpy reference test covers those)."""
    hm = gradcam(media(spark, sf_dir).where(F.col("media_id") < 40))
    return _heatmap_summary(hm)


@query("q_attention_rollout_surrogate", _ROLLOUT_ORACLE)
def q_attention_rollout_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 — same contract as q_gradcam_surrogate for the rollout method
    (the reference's Grad-CAM cap is 40 images per group — BASELINE.md —
    mirrored here)."""
    hm = attention_rollout(media(spark, sf_dir).where(F.col("media_id") < 40))
    return _heatmap_summary(hm)
