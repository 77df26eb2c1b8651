"""Panoramic baseline depth network (UniFuse-class), TPU-native flax.

The reference consumes baseline depth panoramas produced *offline* by
UniFuse/HoHoNet/BiFuse/SliceNet (filename conventions, reference
``Main.cpp:500-516``; ``README.md:15``).  This module is the on-TPU
replacement so the whole pipeline — baseline inference -> view extraction ->
perspective inference -> registration -> fusion — can run in one device
graph.

Architecture follows UniFuse's shape (Jiang et al. 2021): an equirectangular
encoder plus a cubemap encoder whose per-level features are projected back to
the equirect grid and fused *unidirectionally* (cube -> equirect) with a
squeeze-excitation gate, then a skip-connected decoder regresses depth.
Projections use :mod:`panodepth.ops.cubemap` (pure gathers, differentiable).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cubemap import cubemap_to_equirect, equirect_to_cubemap
from .norm import GroupNorm
from .perspective import NFResBlock, ResBlock, WSConv, _groups


class SEGate(nn.Module):
    """Squeeze-excitation gating used by UniFuse's fusion module."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Dense(max(self.features // 4, 8), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.features, dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class UniFuseBlock(nn.Module):
    """Unidirectional cube->equirect fusion at one pyramid level."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, equi_feat, cube_feat_equi):
        z = jnp.concatenate([equi_feat, cube_feat_equi], axis=-1)
        z = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(z)
        z = GroupNorm(num_groups=_groups(self.features),
                      dtype=self.norm_dtype, fuse_relu=True)(z)
        z = SEGate(self.features, dtype=self.dtype)(z)
        return equi_feat + z


class NFUniFuseBlock(nn.Module):
    """Normalizer-free unidirectional cube->equirect fusion (WS conv +
    SE gate; no GroupNorm => no activation-stats HBM traffic)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, equi_feat, cube_feat_equi):
        z = jnp.concatenate([equi_feat, cube_feat_equi], axis=-1)
        z = WSConv(self.features, (3, 3), dtype=self.dtype,
                   gain_act=1.0)(z)
        z = nn.relu(z)
        z = SEGate(self.features, dtype=self.dtype)(z)
        return equi_feat + z


class PanoBaselineNet(nn.Module):
    """UniFuse-class panoramic depth net on (B, H, W, 3), H = W/2.

    W must be a multiple of 32.  Returns (B, H, W) depth in 0~1 (sigmoid),
    matching the 16-bit 0~1 encoding of the baseline files the reference
    loads (Depth.cpp:277-355).
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16
    # f32 for training; bf16 at inference halves the normalization layers'
    # HBM traffic (see PerspectiveDepthNet.norm_dtype)
    norm_dtype: jnp.dtype = jnp.float32
    # "fast" = nearest-tap cube->equirect feature projections for the same
    # checkpoint (see BiFuseNet.proj; gathers are the two-branch families'
    # TPU bottleneck)
    proj: str = "bilinear"

    @nn.compact
    def __call__(self, rgb):
        b, h, w, _ = rgb.shape
        taps = "nearest" if self.proj == "fast" else "bilinear"
        x = rgb.astype(self.dtype)
        cube = jax.vmap(lambda img: equirect_to_cubemap(img, w // 4))(x)
        cube = cube.reshape(b * 6, w // 4, w // 4, 3)

        equi_skips, cube_skips = [], []
        e, c = x, cube
        for i, width in enumerate(self.widths):
            e = ResBlock(width, stride=2, dtype=self.dtype,
                         norm_dtype=self.norm_dtype)(e)
            c = ResBlock(width, stride=2, dtype=self.dtype,
                         norm_dtype=self.norm_dtype)(c)
            eh, ew = e.shape[1], e.shape[2]
            c6 = c.reshape(b, 6, c.shape[1], c.shape[2], width)
            c2e = jax.vmap(
                lambda f: cubemap_to_equirect(f, eh, ew, taps))(c6)
            e = UniFuseBlock(width, dtype=self.dtype,
                             norm_dtype=self.norm_dtype)(e, c2e)
            equi_skips.append(e)

        y = equi_skips[-1]
        for skip in reversed(equi_skips[:-1]):
            bb, hh, ww, cc = y.shape
            y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), "nearest")
            y = nn.Conv(skip.shape[-1], (3, 3), use_bias=False,
                        dtype=self.dtype)(y)
            y = GroupNorm(num_groups=_groups(skip.shape[-1]),
                          dtype=self.norm_dtype, fuse_relu=True)(y)
            y = y + skip
        bb, hh, ww, cc = y.shape
        # the x2 from the h/2 skip level lands exactly at (h, w) for every
        # stride-even input (the module contract) — no trailing resize
        y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), "bilinear")
        y = nn.Conv(32, (3, 3), dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=jnp.float32)(y)
        return nn.sigmoid(y[..., 0])


class NFPanoBaselineNet(nn.Module):
    """Normalizer-free PanoBaselineNet: same UniFuse-class topology with
    weight-standardized convs in place of every GroupNorm (see
    ``perspective.NFPerspectiveNet`` for the HBM-traffic rationale).
    Select with ``train_cli panoramic --variant nf``; reconstructed from
    the sidecar's ``variant`` field.  ``norm_dtype`` accepted/ignored.
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32  # unused; API-compatible

    @nn.compact
    def __call__(self, rgb):
        b, h, w, _ = rgb.shape
        x = rgb.astype(self.dtype)
        cube = jax.vmap(lambda img: equirect_to_cubemap(img, w // 4))(x)
        cube = cube.reshape(b * 6, w // 4, w // 4, 3)

        equi_skips = []
        e, c = x, cube
        for width in self.widths:
            e = NFResBlock(width, stride=2, dtype=self.dtype)(e)
            c = NFResBlock(width, stride=2, dtype=self.dtype)(c)
            eh, ew = e.shape[1], e.shape[2]
            c6 = c.reshape(b, 6, c.shape[1], c.shape[2], width)
            c2e = jax.vmap(lambda f: cubemap_to_equirect(f, eh, ew))(c6)
            e = NFUniFuseBlock(width, dtype=self.dtype)(e, c2e)
            equi_skips.append(e)

        y = equi_skips[-1]
        for skip in reversed(equi_skips[:-1]):
            bb, hh, ww, cc = y.shape
            y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), "nearest")
            y = WSConv(skip.shape[-1], (3, 3), dtype=self.dtype,
                       gain_act=1.0)(y)
            y = nn.relu(y)
            y = y + skip
        bb, hh, ww, cc = y.shape
        y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), "bilinear")
        y = WSConv(32, (3, 3), dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=jnp.float32)(y)
        return nn.sigmoid(y[..., 0])
