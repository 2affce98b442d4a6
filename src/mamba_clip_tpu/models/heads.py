"""Stage-2 classification heads.

- :class:`ClipClassifier` — the reference's frozen-CLIP MLP head
  (reference: src/mamba_clip/model.py:1115-1205): encode image+text with a
  frozen CLIP, combine (concat | inner product | visual-only | text-only),
  then Linear(feature_dim → out) → ReLU → Linear(→ num_classes). Freezing
  is a ``jax.lax.stop_gradient`` on the CLIP features — gradients never
  flow into the towers, the TPU-native equivalent of requires_grad=False
  (model.py:1129-1131).
- :class:`MambaVisionClassifier` — classifier over a Mamba vision backbone's
  pooled features (reference: model.py:1208-1254 wraps NVIDIA mambavision;
  here the backbone is our VSSM, the in-repo Mamba vision family).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip import ClipModel
from .vssm import VSSM

Dtype = Any


class ClipClassifier(nn.Module):
    clip: ClipModel
    num_classes: int = 2
    feature_dim: Optional[int] = None  # None = img_dim + text_dim
    use_visual_only: bool = False
    use_text_only: bool = False
    use_inner_prod: bool = False
    freeze_clip: bool = True

    @nn.compact
    def __call__(self, image, text, deterministic: bool = True):
        out = self.clip(image=image, text=text, deterministic=deterministic)
        img = out.get("image_features")
        txt = out.get("text_features")
        if self.freeze_clip:
            img = jax.lax.stop_gradient(img) if img is not None else None
            txt = jax.lax.stop_gradient(txt) if txt is not None else None

        if self.use_visual_only:
            feats = img
        elif self.use_text_only:
            feats = txt
        elif self.use_inner_prod:
            feats = img * txt
        else:
            feats = jnp.concatenate([img, txt], axis=-1)

        feature_dim = self.feature_dim or feats.shape[-1]
        # single-tower variants keep output_dim == feature_dim
        # (reference: model.py:1163-1167)
        if self.use_visual_only or self.use_text_only or self.use_inner_prod:
            hidden = feature_dim
        else:
            hidden = feature_dim // 2
        x = feats.astype(jnp.float32)
        x = nn.Dense(hidden, dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc2")(x)

    def classify(self, image, text):
        logits = self(image, text)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(probs, axis=-1), probs


class MambaVisionClassifier(nn.Module):
    """Dropout + Linear over VSSM pooled features
    (reference: model.py:1208-1254; feature_dim = dims[-1] mirrors
    ``config.dim * 2**(len(depths)-1)``)."""

    backbone: VSSM  # construct with num_classes=0 (features mode)
    num_classes: int = 2
    dropout: float = 0.1
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, image, text=None, deterministic: bool = True):
        feats = self.backbone(image, deterministic)
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        feats = nn.Dropout(self.dropout)(
            feats.astype(jnp.float32), deterministic=deterministic
        )
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(feats)
