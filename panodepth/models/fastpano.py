"""TPU-fast panoramic baseline family (single-branch equirect U-Net).

The fifth panoramic baseline family, designed for the e2e graph's baseline
stage rather than ported from a paper.  The reference consumes baseline
panoramas produced offline by UniFuse/BiFuse-class nets (reference
``Main.cpp:500-516``); the on-TPU replacements of those families
(:mod:`.panoramic`, :mod:`.bifuse`) are faithful two-branch designs whose
per-level cube<->equirect feature gathers are HBM-gather-bound on TPU
(1-6 % MFU, PERF.md).  This family keeps their accuracy class at
perspective-net MFU by replacing the cubemap branch with three cheap,
MXU-friendly equivalents of what that branch actually provides:

- **azimuth-seam correctness** -> circular (wrap) padding on every conv's
  width axis, so the left/right panorama edge sees its true neighborhood
  (the fusion stage's seam wrap, PARITY quirk #19, then diffuses a
  consistent baseline);
- **distortion awareness** -> fixed latitude-prior input channels
  (sin/cos of zenith), the per-row distortion cue an equirect conv stack
  cannot otherwise recover (translation invariance hides the row index);
- **global scene context** -> a squeeze-excitation gate at the encoder
  bottleneck (global average -> tiny MLP -> channel gate), standing in
  for the cube branch's cross-hemisphere receptive field.

Everything else is the proven perspective-family recipe (ResNet encoder +
RefineNet-style decoder, bfloat16 compute, f32 params, GroupNorm with
bf16 inference dtype) at wider channel counts than PanoBaselineNet —
pure conv chains XLA fuses onto the MXU with zero feature-map gathers.
"""

from __future__ import annotations

import numpy as np
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import GroupNorm
from .perspective import _groups


class CircConv(nn.Module):
    """Conv with circular (wrap) padding on the width/azimuth axis and
    zero padding on height — the seam-correct equirect convolution.

    Output centering matches SAME padding exactly for odd kernels at
    stride 1 or 2 (window for output column j centers at input column
    ``strides[1] * j``), so checkpoints are layout-identical to a SAME
    conv; only the columns within ``kw // 2`` of the seam differ.
    """

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # "same" drops the wrap pad (zero padding; WRONG at the seam) — a
    # perf-diagnostic mode only (scripts/fastpano_diag.py), never shipped
    pad: str = "circ"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        if pw and self.pad == "circ":
            x = jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)
            wpad = (0, 0)
        else:
            wpad = (pw, pw)
        return nn.Conv(self.features, self.kernel, self.strides,
                       padding=[(ph, ph), wpad], use_bias=self.use_bias,
                       dtype=self.dtype, name="conv")(x)


class CircResBlock(nn.Module):
    """:class:`~panodepth.models.perspective.ResBlock` with circular
    azimuth padding (the 1x1 shortcut needs no padding)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    pad: str = "circ"

    @nn.compact
    def __call__(self, x):
        gn = lambda **kw: GroupNorm(num_groups=_groups(self.features),
                                    dtype=self.norm_dtype, **kw)
        y = CircConv(self.features, (3, 3), (self.stride, self.stride),
                     use_bias=False, dtype=self.dtype, pad=self.pad)(x)
        y = gn(fuse_relu=True)(y)
        y = CircConv(self.features, (3, 3), use_bias=False,
                     dtype=self.dtype, pad=self.pad)(y)
        y = gn()(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1),
                        (self.stride, self.stride), use_bias=False,
                        dtype=self.dtype)(x)
            x = gn()(x)
        return nn.relu(y + x)


class CircFusionBlock(nn.Module):
    """RefineNet-style decoder block (upsample, add skip, refine) with
    circular azimuth padding throughout."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    pad: str = "circ"

    @nn.compact
    def __call__(self, x, skip=None):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = CircConv(self.features, (3, 3), dtype=self.dtype,
                     pad=self.pad)(x)
        if skip is not None:
            skip = CircConv(self.features, (3, 3), use_bias=False,
                            dtype=self.dtype, pad=self.pad)(skip)
            x = x + skip
        return CircResBlock(self.features, dtype=self.dtype,
                            norm_dtype=self.norm_dtype, pad=self.pad)(x)


class GlobalContext(nn.Module):
    """Squeeze-excitation channel gate at the bottleneck: global average
    pooled features through a small MLP modulate every channel — the
    cross-hemisphere context path (a cube branch's receptive-field role)
    at O(C^2) cost."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Dense(max(self.features // 4, 8), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.features, dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


def _circ_upsample2_bilinear(y):
    """Bilinear 2x upsample that wraps in azimuth: one wrap column padded
    each side before the resize, two cropped after — output tap centers
    are then exactly the unpadded resize's, but the seam interpolates its
    true neighbor instead of a clamped edge (caught by the roll-
    equivariance test)."""
    b, h, w, c = y.shape
    yp = jnp.concatenate([y[:, :, -1:], y, y[:, :, :1]], axis=2)
    up = jax.image.resize(yp, (b, h * 2, (w + 2) * 2, c), "bilinear")
    return up[:, :, 2:-2]


def _latitude_features(h: int, w: int, dtype) -> jnp.ndarray:
    """(h, w, 2) fixed per-row distortion cue: (cos zen, sin zen) at row
    centers — matches the pipeline's pixel-center zenith convention
    (``ops/projection.py``; reference Depth.cpp texture mapping)."""
    zen = (np.arange(h, dtype=np.float32) + 0.5) / h * np.pi
    row = np.stack([np.cos(zen), np.sin(zen)], axis=-1)  # (h, 2)
    return jnp.asarray(np.broadcast_to(row[:, None, :], (h, w, 2)), dtype)


class FastPanoNet(nn.Module):
    """(B, H, W, 3) equirect RGB in [0, 1] -> (B, H, W) depth in 0~1.

    W must be a multiple of 32 (H = W/2).  Output matches the 16-bit 0~1
    encoding of the baseline files the reference loads (Depth.cpp:277-355),
    like every panoramic family.
    """

    widths: Sequence[int] = (48, 96, 192, 384)
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    decoder_width: int = 96
    dtype: jnp.dtype = jnp.bfloat16
    # f32 for training; bf16 at inference halves the normalization layers'
    # HBM traffic (see PerspectiveDepthNet.norm_dtype)
    norm_dtype: jnp.dtype = jnp.float32
    pad: str = "circ"  # "same" = perf diagnostic only (seam-incorrect)

    @nn.compact
    def __call__(self, rgb):
        b, h, w, _ = rgb.shape
        if w % 32 != 0 or h != w // 2:
            raise ValueError(
                f"FastPanoNet needs an equirect (W/2, W) input with "
                f"W % 32 == 0, got ({h}, {w})")
        x = rgb.astype(self.dtype)
        lat = jnp.broadcast_to(_latitude_features(h, w, self.dtype)[None],
                               (b, h, w, 2))
        x = jnp.concatenate([x, lat], axis=-1)

        x = CircConv(self.widths[0] // 2, (5, 5), (2, 2), use_bias=False,
                     dtype=self.dtype, pad=self.pad)(x)
        x = GroupNorm(num_groups=_groups(x.shape[-1]),
                      dtype=self.norm_dtype, fuse_relu=True)(x)

        skips = []
        for blocks, width in zip(self.stage_sizes, self.widths):
            for i in range(blocks):
                x = CircResBlock(width, stride=2 if i == 0 else 1,
                                 dtype=self.dtype, pad=self.pad,
                                 norm_dtype=self.norm_dtype)(x)
            skips.append(x)
        x = GlobalContext(self.widths[-1], dtype=self.dtype)(x)

        y = CircConv(self.decoder_width, (3, 3), use_bias=False,
                     dtype=self.dtype, pad=self.pad)(x)
        for skip in reversed(skips[:-1]):
            y = CircFusionBlock(self.decoder_width, dtype=self.dtype,
                                norm_dtype=self.norm_dtype,
                                pad=self.pad)(y, skip)
        y = CircFusionBlock(self.decoder_width, dtype=self.dtype,
                            norm_dtype=self.norm_dtype,
                            pad=self.pad)(y)  # to H/2

        y = CircConv(self.decoder_width // 2, (3, 3),
                     dtype=self.dtype, pad=self.pad)(y)
        y = nn.relu(y)
        y = _circ_upsample2_bilinear(y)
        y = CircConv(32, (3, 3), dtype=self.dtype, pad=self.pad)(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=jnp.float32)(y)
        return nn.sigmoid(y[..., 0])
