"""HoHoNet-class panoramic depth network (horizon-feature family).

Second on-TPU panoramic baseline family (alongside the UniFuse-class
:class:`~panodepth.models.panoramic.PanoBaselineNet`), mirroring the
reference's support for HoHoNet baselines (filename convention
``<raw>.depth.png``, reference ``Main.cpp:511-515``).  Architecture follows
the HoHoNet shape (Sun et al. 2021): a conv encoder squeezes the
equirectangular image's *height* axis into a 1-D horizon feature sequence,
a sequence model mixes information along the (circular) horizon, and a
per-column decoder expands the horizon features back to dense depth.

TPU notes: the horizon sequence stage is multi-head self-attention over
W/16 tokens — a few fused MXU matmuls; the height squeeze/expand are
convolutions with strong reuse.  All compute in bfloat16, params f32.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .norm import GroupNorm
from .perspective import ResBlock, _groups


class HorizonAttention(nn.Module):
    """Circular multi-head self-attention along the horizon axis."""

    features: int
    heads: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, W, C)
        b, w, c = x.shape
        # relative circular position encoding via sin/cos features
        pos = jnp.arange(w, dtype=jnp.float32) / w * 2 * np.pi
        pe = jnp.stack([jnp.sin(pos), jnp.cos(pos),
                        jnp.sin(2 * pos), jnp.cos(2 * pos)], axis=-1)
        pe = jnp.broadcast_to(pe[None], (b, w, 4)).astype(self.dtype)
        h = jnp.concatenate([x, pe], axis=-1)
        y = nn.LayerNorm(dtype=self.dtype)(h)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.features,
            dtype=self.dtype)(y, y)
        x = x + nn.Dense(c, dtype=self.dtype)(y)
        z = nn.LayerNorm(dtype=self.dtype)(x)
        z = nn.Dense(c * 2, dtype=self.dtype)(z)
        z = nn.gelu(z)
        z = nn.Dense(c, dtype=self.dtype)(z)
        return x + z


class HorizonDepthNet(nn.Module):
    """HoHoNet-class: (B, H, W, 3) equirect RGB -> (B, H, W) depth in 0~1.

    W must be a multiple of 32 (so H = W/2 is a multiple of 16; the decoder
    expands H/16 horizon columns by 16x).
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    horizon_dim: int = 256
    attn_blocks: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    # f32 for training; bf16 at inference halves the normalization layers'
    # HBM traffic (see PerspectiveDepthNet.norm_dtype)
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb):
        b, h, w, _ = rgb.shape
        if w % 32 != 0 or h % 16 != 0:
            raise ValueError(
                f"HorizonDepthNet needs W % 32 == 0 and H % 16 == 0 "
                f"(decoder upsamples H/16 by 16x), got ({h}, {w})")
        x = rgb.astype(self.dtype)
        for width in self.widths:  # -> (B, H/16, W/16, C)
            x = ResBlock(width, stride=2, dtype=self.dtype,
                         norm_dtype=self.norm_dtype)(x)

        # height squeeze: strided convs down to one row (HoHoNet's HC block)
        while x.shape[1] > 1:
            s = min(4, x.shape[1])
            x = nn.Conv(self.horizon_dim, (s, 1), (s, 1), use_bias=False,
                        dtype=self.dtype)(x)
            x = GroupNorm(num_groups=_groups(self.horizon_dim),
                          dtype=self.norm_dtype, fuse_relu=True)(x)
        seq = x[:, 0]  # (B, W/16, C)

        for _ in range(self.attn_blocks):
            seq = HorizonAttention(self.horizon_dim, dtype=self.dtype)(seq)

        # per-column expansion back to dense depth: predict H/16 x 16-deep
        # feature columns then refine with convs at full width
        hs, ws = h // 16, w // 16
        col = nn.Dense(hs * 32, dtype=self.dtype)(seq)  # (B, W/16, hs*32)
        y = col.reshape(b, ws, hs, 32).transpose(0, 2, 1, 3)  # (B,hs,ws,32)
        for width in (64, 32, 16, 16):
            bb, hh, ww, cc = y.shape
            y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), "nearest")
            y = nn.Conv(width, (3, 3), use_bias=False, dtype=self.dtype)(y)
            y = GroupNorm(num_groups=_groups(width),
                          dtype=self.norm_dtype, fuse_relu=True)(y)
        y = nn.Conv(1, (1, 1), dtype=jnp.float32)(y)
        return nn.sigmoid(y[..., 0])
