"""Optional torch-backed featurizers — the REAL M1/M2/M3 model path.

The engine's registered queries run the deterministic surrogate
featurizers (``multimodal.surrogate_featurize`` / ``surrogate_multistage``)
because this container carries no torch; these functions are the
drop-in real implementations for clusters that do. They reproduce the
reference's extraction semantics:

- ``torch_featurize``: ResNet-50 penultimate (avgpool) embedding,
  [B, 2048] per batch — ``/root/reference/src/extract_embedding.py:48-93``
  (model init :48-56, transform :26-36, batched forward + squeeze
  :85-93).
- ``torch_multistage``: per-stage feature maps from forward hooks on
  layer1..layer4 — ``/root/reference/src/feature_map_analysis.py:87-139``
  (hook registration :92-103, [C, H, W] capture :110-127).

Execution shape is IDENTICAL to the surrogates (mapInPandas, lazy
per-partition model init, Arrow batches, flat-array tensor columns per
data model D4) — swapping surrogate → torch changes only the tensor
source, which is the property the surrogate-backed tests exercise.

Import-gated: calling either function without torch raises
``NotImplementedError`` eagerly (not mid-job on an executor).
Unit tests skip unless torch is importable (``tests/test_multimodal.py``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # optional extra — absent in this container
    import torch  # noqa: F401

    HAS_TORCH = True
except Exception:  # pragma: no cover - torch missing here by design
    HAS_TORCH = False

_EMB_SCHEMA = "media_id bigint, embedding array<float>, used_torch boolean"
_FMAP_SCHEMA = (
    "media_id bigint, stage int, c int, h int, w int, data array<float>"
)

# ImageNet normalization, the reference's eval transform
# (extract_embedding.py:26-36): Resize(256) -> CenterCrop(224) ->
# ToTensor -> Normalize(mean, std).
_IN_MEAN = (0.485, 0.456, 0.406)
_IN_STD = (0.229, 0.224, 0.225)


def _require_torch() -> None:
    if not HAS_TORCH:
        raise NotImplementedError(
            "torch optional extra is not installed; use the surrogate "
            "featurizers (multimodal.surrogate_featurize / "
            "surrogate_multistage) or install torch+torchvision+pillow"
        )


def _decode_batch(contents) -> "torch.Tensor":
    """bytes -> normalized [B, 3, 224, 224] float tensor (PIL decode;
    corrupt rows raise — wrap upstream with the validity filter P8)."""
    import io

    import torchvision.transforms as T
    from PIL import Image

    tf = T.Compose(
        [
            T.Resize(256),
            T.CenterCrop(224),
            T.ToTensor(),
            T.Normalize(_IN_MEAN, _IN_STD),
        ]
    )
    return torch.stack(
        [tf(Image.open(io.BytesIO(bytes(c))).convert("RGB")) for c in contents]
    )


def torch_featurize(media_df: DataFrame, batch_size: int = 32) -> DataFrame:
    """M1/M2 — real ResNet-50 embeddings (penultimate avgpool output,
    2048-d), one row per image. Lazy per-partition model init keeps one
    model per executor core, exactly like the surrogate's per-partition
    hashlib import stands in for (X10)."""
    _require_torch()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import torch as _torch
        from torchvision.models import ResNet50_Weights, resnet50

        model = resnet50(weights=ResNet50_Weights.IMAGENET1K_V2)
        model.fc = _torch.nn.Identity()  # keep the avgpool embedding
        model.eval()

        with _torch.no_grad():
            for pdf in batches:
                for lo in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[lo : lo + batch_size]
                    x = _decode_batch(chunk["content"])
                    feats = model(x)  # [B, 2048]
                    yield pd.DataFrame(
                        {
                            "media_id": chunk["media_id"].to_numpy(),
                            "embedding": [
                                f.tolist() for f in feats.float().cpu()
                            ],
                            "used_torch": True,
                        }
                    )

    return media_df.select("media_id", "content").mapInPandas(
        run, _EMB_SCHEMA
    )


def torch_multistage(media_df: DataFrame, batch_size: int = 8) -> DataFrame:
    """M3 — real multi-stage feature maps: forward hooks on ResNet-50
    layer1..layer4 capture each stage's [C, H, W] activation per image
    (flattened + shape columns, data model D4)."""
    _require_torch()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import torch as _torch
        from torchvision.models import ResNet50_Weights, resnet50

        model = resnet50(weights=ResNet50_Weights.IMAGENET1K_V2)
        model.eval()
        captured: dict[int, "_torch.Tensor"] = {}

        def hook(stage: int):
            def fn(_mod, _inp, out):
                captured[stage] = out.detach()

            return fn

        for s, layer in enumerate(
            (model.layer1, model.layer2, model.layer3, model.layer4), 1
        ):
            layer.register_forward_hook(hook(s))

        with _torch.no_grad():
            for pdf in batches:
                for lo in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[lo : lo + batch_size]
                    x = _decode_batch(chunk["content"])
                    model(x)
                    rows = []
                    for i, mid in enumerate(chunk["media_id"]):
                        for s, t in sorted(captured.items()):
                            fm = t[i].float().cpu()  # [C, H, W]
                            c, h, w = fm.shape
                            rows.append(
                                (int(mid), s, c, h, w, fm.ravel().tolist())
                            )
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "media_id", "stage", "c", "h", "w", "data",
                        ],
                    )

    return media_df.select("media_id", "content").mapInPandas(
        run, _FMAP_SCHEMA
    )


def torch_gradcam(media_df: DataFrame, batch_size: int = 8) -> DataFrame:
    """M8 — real Grad-CAM: hooks on ResNet-50 layer4 capture activations
    and gradients of the top-class score; downstream math (GAP of the
    gradients → channel weights → relu(Σ w_c·A_c) → min-max normalize)
    is IDENTICAL to ``explainability._heatmap_udf`` — this swaps only
    the tensor source, as that module's contract promises.
    ``/root/reference/src/gradcam_dynamic.py:132-180`` (hook capture
    :138-150, backward on the argmax logit :158-166, normalize
    :168-175)."""
    _require_torch()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import torch as _torch
        from torchvision.models import ResNet50_Weights, resnet50

        model = resnet50(weights=ResNet50_Weights.IMAGENET1K_V2)
        model.eval()
        acts: list = []
        grads: list = []
        model.layer4.register_forward_hook(
            lambda _m, _i, out: acts.append(out)
        )
        model.layer4.register_full_backward_hook(
            lambda _m, _gin, gout: grads.append(gout[0])
        )

        for pdf in batches:
            rows = []
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                x = _decode_batch(chunk["content"])
                acts.clear(), grads.clear()
                logits = model(x)
                model.zero_grad()
                logits.gather(
                    1, logits.argmax(dim=1, keepdim=True)
                ).sum().backward()
                a = acts[-1].detach().cpu().numpy()     # [B, C, h, w]
                g = grads[-1].detach().cpu().numpy()
                for i, mid in enumerate(chunk["media_id"]):
                    weights = g[i].mean(axis=(1, 2))    # GAP of gradients
                    cam = np.einsum("c,chw->hw", weights, a[i])
                    cam = np.maximum(cam, 0.0)          # relu
                    lo_, hi = cam.min(), cam.max()
                    norm = (cam - lo_) / (hi - lo_ + 1e-8)
                    rows.append(
                        (
                            int(mid), "gradcam", norm.shape[0],
                            norm.shape[1],
                            norm.astype(float).ravel().tolist(), True,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "method", "h", "w", "heatmap", "used_torch",
                ],
            )

    schema = (
        "media_id bigint, method string, h int, w int,"
        " heatmap array<float>, used_torch boolean"
    )
    return media_df.select("media_id", "content").mapInPandas(run, schema)


def torch_attention_rollout(
    media_df: DataFrame, model_name: str = "vit_base_patch16_224",
    batch_size: int = 8,
) -> DataFrame:
    """M9 — real attention rollout: hooks on every timm ViT block's
    attention dropout capture the per-layer [B, heads, T, T] matrices;
    the chain math (head mean → +I → row-normalize → product → CLS row
    → min-max) is the same as the surrogate's.
    ``/root/reference/src/gradcam_dynamic.py:213-316`` (attn capture
    :224-246, rollout chain :262-300)."""
    _require_torch()
    try:
        import timm  # noqa: F401
    except Exception as e:  # pragma: no cover
        raise NotImplementedError(
            "torch optional extra: attention rollout needs timm"
        ) from e

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import timm as _timm
        import torch as _torch

        model = _timm.create_model(model_name, pretrained=True)
        model.eval()
        captured: list = []
        for blk in model.blocks:
            # attn_drop sees the softmaxed [B, heads, T, T] matrix
            blk.attn.attn_drop.register_forward_hook(
                lambda _m, _i, out: captured.append(out.detach())
            )

        with _torch.no_grad():
            for pdf in batches:
                rows = []
                for lo in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[lo : lo + batch_size]
                    x = _decode_batch(chunk["content"])
                    captured.clear()
                    model(x)
                    layers = [c.cpu().numpy() for c in captured]
                    t = layers[0].shape[-1]
                    grid = int((t - 1) ** 0.5)
                    for i, mid in enumerate(chunk["media_id"]):
                        result = np.eye(t)
                        for a_layer in layers:
                            a = a_layer[i].mean(axis=0)   # head mean
                            a = a + np.eye(t)             # + identity
                            a = a / a.sum(axis=-1, keepdims=True)
                            result = a @ result
                        cls = result[0, 1:]
                        lo_, hi = cls.min(), cls.max()
                        norm = (cls - lo_) / (hi - lo_ + 1e-8)
                        rows.append(
                            (
                                int(mid), "rollout", grid, grid,
                                norm.astype(float).tolist(), True,
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "method", "h", "w", "heatmap",
                        "used_torch",
                    ],
                )

    schema = (
        "media_id bigint, method string, h int, w int,"
        " heatmap array<float>, used_torch boolean"
    )
    return media_df.select("media_id", "content").mapInPandas(run, schema)
