"""Model zoo + factory.

``init_model`` mirrors the reference factory (reference:
src/mamba_clip/model.py:1257-1289): a model name resolves to
(model, preprocess_train, preprocess_val, tokenizer).

- ``"medmamba"`` → VSSM(depths=[2,2,8,2], dims=[64,128,256,512]) classifier
  (reference: model.py:1267);
- any other string (e.g. the BiomedCLIP hub name) → our from-scratch
  ViT-B/16 + PubMedBERT-shaped CLIP (the reference downloads
  ``hf-hub:<name>``; this framework builds the same architecture locally
  and can load converted weights via checkpoint.load_torch_clip when a
  file is available — there is no network dependency);
- ``is_clip=True`` wraps into the two-tower ClipModel.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from .clip import (
    ClipModel,
    LOGIT_SCALE_MAX,
    VssmTower,
    build_clip,
    clamp_logit_scale,
    l2_normalize,
    lock_mask,
)
from .heads import ClipClassifier, MambaVisionClassifier
from .text_bert import TextBert
from .vit import VisionTransformer
from .vssm import VSSM, SS2D, SSConvSSM, VSSLayer, PatchEmbed2D, PatchMerging2D, medmamba

__all__ = [
    "ClipModel", "ClipClassifier", "MambaVisionClassifier",
    "TextBert", "VisionTransformer", "VSSM", "SS2D", "SSConvSSM",
    "VSSLayer", "PatchEmbed2D", "PatchMerging2D", "medmamba",
    "build_clip", "clamp_logit_scale", "lock_mask", "l2_normalize",
    "VssmTower", "LOGIT_SCALE_MAX", "init_model", "build_classifier",
]


def build_classifier(
    name: Optional[str],
    num_classes: int = 2,
    dtype: Any = jnp.float32,
    grad_checkpointing: bool = False,
    scan_impl: Optional[str] = None,
    quant: Optional[str] = None,
):
    """Classifier model zoo (reference: integrations/optuna.py:85-114):
    ``None``/``vssm``/``medmamba`` → the VSSM (medmamba) classifier;
    names containing ``mamba`` (e.g. ``mambavision``) →
    :class:`MambaVisionClassifier` over a VSSM backbone (the reference wraps
    NVIDIA mambavision from the HF hub; this framework's Mamba vision
    family is the in-repo VSSM). Anything else raises — there is no hub
    access for ``AutoModelForImageClassification`` equivalents."""
    from ..ops.quant import make_dot_general_cls

    dg_cls = make_dot_general_cls(quant)
    n = (name or "vssm").lower()
    if n in ("vssm", "medmamba"):
        return medmamba(
            num_classes=num_classes, dtype=dtype,
            use_checkpoint=grad_checkpointing, scan_impl=scan_impl,
            dot_general_cls=dg_cls,
        )
    if "mamba" in n:
        backbone = VSSM(
            depths=(2, 2, 8, 2), dims=(64, 128, 256, 512), num_classes=0,
            dtype=dtype, use_checkpoint=grad_checkpointing,
            scan_impl=scan_impl, dot_general_cls=dg_cls,
        )
        return MambaVisionClassifier(backbone=backbone, num_classes=num_classes)
    raise ValueError(
        f"Model {name!r} not recognized (reference falls back to the HF hub "
        "AutoModel, unavailable here): use vssm | medmamba | mambavision"
    )


def init_model(
    model: Optional[str],
    tokenizer: Optional[str] = None,
    aug_cfg: Optional[dict] = None,
    is_clip: bool = False,
    use_tokenizer: bool = False,
    image_size: int = 224,
    num_classes: int = 2,
    dtype: Any = jnp.float32,
    grad_checkpointing: bool = False,
    siglip: bool = False,
    patch_dropout: float = 0.0,
    quick_gelu: bool = False,
    scan_impl: Optional[str] = None,
):
    """Build (model, preprocess_train, preprocess_val, tokenizer)."""
    from ..data.preprocess_cfg import get_transform_config
    from ..data.tokenizer import get_tokenizer

    name = model or "biomedclip"
    if name == "medmamba" and not is_clip:
        module = medmamba(
            num_classes=num_classes, dtype=dtype,
            use_checkpoint=grad_checkpointing, scan_impl=scan_impl,
        )
    else:
        module = build_clip(
            model_name=name,
            image_size=image_size,
            quick_gelu=quick_gelu,
            patch_dropout=patch_dropout,
            grad_checkpointing=grad_checkpointing,
            siglip=siglip,
            dtype=dtype,
            scan_impl=scan_impl,
        )

    preprocess_train = get_transform_config(aug_cfg, image_size, is_train=True)
    preprocess_val = get_transform_config(aug_cfg, image_size, is_train=False)
    tok = get_tokenizer(tokenizer or name) if use_tokenizer else None
    return module, preprocess_train, preprocess_val, tok
