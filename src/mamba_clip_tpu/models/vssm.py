"""VSSM ("medmamba") — hierarchical vision state-space model, TPU-native.

Re-design of the reference's VMamba/MedMamba stack
(reference: src/mamba_clip/model.py — PatchEmbed2D :174-201,
PatchMerging2D :204-246, SS2D :297-647, SS_Conv_SSM :666-723,
VSSLayer :726-795, VSSM :868-995, channel_shuffle :650-663) as Flax
modules:

- NHWC layouts throughout (TPU conv-friendly); the selective scan consumes
  **time-major** (B, K, L, D) tensors directly, so the 4 directional
  sequences are built with reshapes/flips and never transposed to the CUDA
  kernel's channel-major layout;
- the scan core is the Pallas kernel in ops/selective_scan.py (fp32 state,
  bf16 activations);
- init distributions preserve the reference's *effective* init (the VSSM
  ``_init_weights`` override wins for Linear/LayerNorm; Conv2d gets
  kaiming-normal fan-out; the SS2D special params — dt projection,
  inverse-softplus dt bias, S4D-real A_log, D=1 — keep their own inits,
  model.py:437-501);
- ``use_checkpoint`` maps to ``nn.remat`` (reference: torch.utils.checkpoint
  at model.py:788).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.selective_scan import selective_scan_tm

Dtype = Any

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
conv_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _dense(dot_general_cls, *args, **kw):
    """nn.Dense with optional quantized dot injection (ops/quant.py) — the
    same hook the ViT/BERT towers expose, so ``--quant`` applies to the
    VSSM family's GEMMs too (in/out projections, patch-merge reductions).
    The per-direction einsum projections and the Pallas scan stay
    unquantized: the scan is VPU-bound and the einsums are batched
    contractions outside the supported Dense pattern."""
    if dot_general_cls is not None:
        kw["dot_general_cls"] = dot_general_cls
    return nn.Dense(*args, **kw)


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Interleave channel groups (reference: model.py:650-663)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _dt_proj_kernel_init(dt_rank: int, dt_scale: float):
    std = dt_rank**-0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


def _dt_bias_init(dt_min: float, dt_max: float, dt_init_floor: float):
    """Inverse-softplus of log-uniform[dt_min, dt_max]
    (reference: model.py:455-470)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, dt_init_floor)
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def _a_log_init(key, shape, dtype=jnp.float32):
    """S4D-real: A[d, n] = n+1 → store log (reference: model.py:474-489).
    shape = (K*D, N)."""
    n = shape[-1]
    a = jnp.broadcast_to(jnp.arange(1, n + 1, dtype=jnp.float32), shape)
    return jnp.log(a).astype(dtype)


class SS2D(nn.Module):
    """2D selective scan block (reference: model.py:297-647).

    in_proj → depthwise 3x3 conv + SiLU → 4 directional scans →
    per-direction projections → fused selective scan → merge →
    LayerNorm → y·silu(z) → out_proj.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dt_rank: Optional[int] = None  # None = ceil(d_model/16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    dropout: float = 0.0
    conv_bias: bool = True
    bias: bool = False
    dtype: Dtype = jnp.float32
    scan_impl: Optional[str] = None
    dot_general_cls: Any = None  # quantized dot injection (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, _ = x.shape
        L = H * W
        K = 4
        d_inner = int(self.expand * self.d_model)
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        N = self.d_state
        cdt = self.dtype

        xz = _dense(
            self.dot_general_cls,
            d_inner * 2, use_bias=self.bias, dtype=cdt,
            kernel_init=trunc_normal_02, name="in_proj",
        )(x.astype(cdt))
        xpart, z = jnp.split(xz, 2, axis=-1)

        xpart = nn.Conv(
            d_inner, (self.d_conv, self.d_conv),
            feature_group_count=d_inner, use_bias=self.conv_bias,
            padding="SAME", dtype=cdt, kernel_init=conv_kaiming, name="conv2d",
        )(xpart)
        xpart = nn.silu(xpart)

        # 4 directional time-major sequences (reference: model.py:510-517):
        # row-major, col-major, and both reversed.
        x_hw = xpart.reshape(B, L, d_inner)
        x_wh = jnp.swapaxes(xpart, 1, 2).reshape(B, L, d_inner)
        xs = jnp.stack(
            [x_hw, x_wh, jnp.flip(x_hw, axis=1), jnp.flip(x_wh, axis=1)], axis=1
        )  # (B, K, L, D)

        x_proj_w = self.param(
            "x_proj_weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (K, dt_rank + 2 * N, d_inner),
            jnp.float32,
        )
        dt_proj_w = self.param(
            "dt_projs_weight",
            _dt_proj_kernel_init(dt_rank, self.dt_scale),
            (K, d_inner, dt_rank),
            jnp.float32,
        )
        dt_proj_b = self.param(
            "dt_projs_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (K, d_inner),
            jnp.float32,
        )
        A_logs = self.param("A_logs", _a_log_init, (K * d_inner, N), jnp.float32)
        Ds = self.param("Ds", nn.initializers.ones, (K * d_inner,), jnp.float32)

        x_dbl = jnp.einsum("bkld,kcd->bklc", xs, x_proj_w.astype(cdt))
        dts_r, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + N], axis=-1)
        dts = jnp.einsum("bklr,kdr->bkld", dts_r, dt_proj_w.astype(cdt))

        As = -jnp.exp(A_logs)  # (K*D, N) fp32
        ys = selective_scan_tm(
            xs, dts, As, Bs, Cs,
            D=Ds, delta_bias=dt_proj_b.reshape(-1),
            delta_softplus=True, impl=self.scan_impl,
        )  # (B, K, L, D) fp32

        # Merge the 4 directions back into row-major (reference: model.py:553-565).
        def wh_to_hw(y):
            return jnp.swapaxes(y.reshape(B, W, H, d_inner), 1, 2).reshape(B, L, d_inner)

        y = (
            ys[:, 0]
            + wh_to_hw(ys[:, 1])
            + jnp.flip(ys[:, 2], axis=1)
            + wh_to_hw(jnp.flip(ys[:, 3], axis=1))
        )

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_norm")(y)
        y = y * nn.silu(z.astype(jnp.float32).reshape(B, L, d_inner))
        y = y.reshape(B, H, W, d_inner).astype(cdt)
        out = _dense(
            self.dot_general_cls,
            self.d_model, use_bias=self.bias, dtype=cdt,
            kernel_init=trunc_normal_02, name="out_proj",
        )(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ConvBranch(nn.Module):
    """BN → 3x3 → BN → ReLU → 3x3 → BN → ReLU → 1x1 → ReLU
    (reference: model.py:686-714)."""

    dim: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype, axis_name=self.bn_axis_name,
        )
        conv = partial(
            nn.Conv, use_bias=True, dtype=self.dtype, kernel_init=conv_kaiming
        )
        x = bn()(x)
        x = conv(self.dim, (3, 3), padding="SAME")(x)
        x = bn()(x)
        x = nn.relu(x)
        x = conv(self.dim, (3, 3), padding="SAME")(x)
        x = bn()(x)
        x = nn.relu(x)
        x = conv(self.dim, (1, 1))(x)
        return nn.relu(x)


class SSConvSSM(nn.Module):
    """Split-channel block: conv branch ∥ SS2D branch, concat, channel
    shuffle, residual (reference: model.py:666-723)."""

    hidden_dim: int
    drop_path: float = 0.0
    attn_drop_rate: float = 0.0
    d_state: int = 16
    dtype: Dtype = jnp.float32
    scan_impl: Optional[str] = None
    bn_axis_name: Optional[str] = None
    dot_general_cls: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        half = self.hidden_dim // 2
        left, right = jnp.split(x, 2, axis=-1)
        r = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_1")(right)
        r = SS2D(
            d_model=half, d_state=self.d_state, dropout=self.attn_drop_rate,
            dtype=self.dtype, scan_impl=self.scan_impl,
            dot_general_cls=self.dot_general_cls, name="self_attention",
        )(r.astype(self.dtype), deterministic=deterministic)
        r = DropPath(self.drop_path)(r, deterministic=deterministic)
        l = ConvBranch(half, dtype=self.dtype, bn_axis_name=self.bn_axis_name)(
            left, train=not deterministic
        )
        out = jnp.concatenate([l, r], axis=-1)
        out = channel_shuffle(out, groups=2)
        return (out + x).astype(x.dtype)


class PatchEmbed2D(nn.Module):
    """Conv patchify + optional LN (reference: model.py:174-201)."""

    patch_size: int = 4
    embed_dim: int = 96
    patch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
            kernel_init=conv_kaiming, name="proj",
        )(x.astype(self.dtype))
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(
                self.dtype
            )
        return x


class PatchMerging2D(nn.Module):
    """2x2 space-to-channel + LN + Linear 4C→2C (reference: model.py:204-246)."""

    dim: int
    dtype: Dtype = jnp.float32
    dot_general_cls: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(
            self.dtype
        )
        return _dense(
            self.dot_general_cls,
            2 * self.dim, use_bias=False, dtype=self.dtype,
            kernel_init=trunc_normal_02, name="reduction",
        )(x)


class PatchExpand2D(nn.Module):
    """Decoder upsample: Linear expand + depth-to-space + LN
    (reference: model.py:249-272; unused in the classification path but part
    of the reference's API surface)."""

    dim: int  # channels of the *output* half-resolution
    dim_scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.dim_scale
        x = nn.Dense(
            s * C, use_bias=False, dtype=self.dtype,
            kernel_init=trunc_normal_02, name="expand",
        )(x)
        x = x.reshape(B, H, W, s, s, C // s)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * s, W * s, C // s)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(
            self.dtype
        )


class FinalPatchExpand2D(nn.Module):
    """Final 4x decoder upsample (reference: model.py:275-294; part of the
    VSSM decoder API surface, unused in the classification path)."""

    dim: int
    dim_scale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.dim_scale
        x = nn.Dense(
            s * C, use_bias=False, dtype=self.dtype,
            kernel_init=trunc_normal_02, name="expand",
        )(x)
        x = x.reshape(B, H, W, s, s, C // s)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * s, W * s, C // s)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(
            self.dtype
        )


class VSSLayer(nn.Module):
    """One stage: depth × SSConvSSM, optional downsample
    (reference: model.py:726-795)."""

    dim: int
    depth: int
    d_state: int = 16
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    downsample: bool = False
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32
    scan_impl: Optional[str] = None
    bn_axis_name: Optional[str] = None
    dot_general_cls: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        block_cls = SSConvSSM
        if self.use_checkpoint:
            block_cls = nn.remat(SSConvSSM, static_argnums=(2,))
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = block_cls(
                hidden_dim=self.dim,
                drop_path=dp,
                attn_drop_rate=self.attn_drop,
                d_state=self.d_state,
                dtype=self.dtype,
                scan_impl=self.scan_impl,
                bn_axis_name=self.bn_axis_name,
                dot_general_cls=self.dot_general_cls,
                name=f"block{i}",
            )(x, deterministic)
        if self.downsample:
            x = PatchMerging2D(
                self.dim, dtype=self.dtype,
                dot_general_cls=self.dot_general_cls, name="downsample",
            )(x)
        return x


class VSSLayerUp(nn.Module):
    """Decoder stage: blocks + PatchExpand2D upsample
    (reference: model.py:798-865; ships for parity with the reference's
    decoder API, unused in the classification path)."""

    dim: int
    depth: int
    d_state: int = 16
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    upsample: bool = False
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32
    scan_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.upsample:
            x = PatchExpand2D(self.dim, dtype=self.dtype, name="upsample")(x)
        block_cls = SSConvSSM
        if self.use_checkpoint:
            block_cls = nn.remat(SSConvSSM, static_argnums=(2,))
        dim = x.shape[-1]
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = block_cls(
                hidden_dim=dim, drop_path=dp, attn_drop_rate=self.attn_drop,
                d_state=self.d_state, dtype=self.dtype,
                scan_impl=self.scan_impl, name=f"block{i}",
            )(x, deterministic)
        return x


class VSSM(nn.Module):
    """MedMamba classifier (reference: model.py:868-995).

    forward: patch_embed → stages (PatchMerging between) → global avg pool →
    linear head. ``medmamba`` factory config: depths [2,2,8,2],
    dims [64,128,256,512] (reference: model.py:1267).
    """

    patch_size: int = 4
    num_classes: int = 1000
    depths: Sequence[int] = (2, 2, 4, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32
    scan_impl: Optional[str] = None
    bn_axis_name: Optional[str] = None
    dot_general_cls: Any = None

    @property
    def num_features(self) -> int:
        return self.dims[-1]

    @nn.nowrap
    def _dpr(self):
        total = sum(self.depths)
        return [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """Backbone → pooled features → linear head. With num_classes == 0
        the head is identity and pooled features are returned (reference:
        model.py:941-945 uses nn.Identity), which is the CLIP-tower /
        MambaVision-backbone mode."""
        x = PatchEmbed2D(
            patch_size=self.patch_size, embed_dim=self.dims[0],
            patch_norm=self.patch_norm, dtype=self.dtype, name="patch_embed",
        )(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        dpr = self._dpr()
        n = len(self.depths)
        for i in range(n):
            x = VSSLayer(
                dim=self.dims[i],
                depth=self.depths[i],
                d_state=self.d_state,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[sum(self.depths[:i]): sum(self.depths[: i + 1])],
                downsample=i < n - 1,
                use_checkpoint=self.use_checkpoint,
                dtype=self.dtype,
                scan_impl=self.scan_impl,
                bn_axis_name=self.bn_axis_name,
                dot_general_cls=self.dot_general_cls,
                name=f"layer{i}",
            )(x, deterministic)
        feats = jnp.mean(x, axis=(1, 2))  # (B, num_features)
        if self.num_classes > 0:
            return nn.Dense(
                self.num_classes, dtype=jnp.float32,
                kernel_init=trunc_normal_02, name="head",
            )(feats.astype(jnp.float32))
        return feats


def medmamba(num_classes: int = 2, **kw) -> VSSM:
    """The reference's "medmamba" config (reference: model.py:1267)."""
    return VSSM(
        depths=(2, 2, 8, 2), dims=(64, 128, 256, 512),
        num_classes=num_classes, **kw,
    )
