"""SliceNet-class panoramic depth network (vertical-slice recurrent family).

Fourth on-TPU panoramic baseline family, completing the reference's
baseline-method set (filename conventions for bifuse/slicenet/unifuse/
hohonet baselines, reference ``Main.cpp:500-516``; ``README.md:15``).
Architecture follows the SliceNet shape (Pintore et al., CVPR 2021): a conv
encoder over the equirectangular image, the feature pyramid collapsed into a
sequence of per-column *slice* features (height pooled away at multiple
scales), long-range horizontal context mixed by bidirectional recurrence
over the (circular) column sequence, and a decoder that reconstructs dense
depth from the slice features alone — no encoder skip connections, the
sequence IS the bottleneck (the family's signature, vs HoHoNet's attention +
per-column expansion with conv refinement).

TPU notes: the GRU runs as a ``lax.scan`` over W/16 tokens (tiny — 32 steps
at 512 width) with batched MXU matmuls per step; everything else is convs.
Circularity is handled by wrapping a few columns of context onto each end of
the sequence before the recurrence and cropping after, so the seam sees the
same neighborhood as any interior column.  Compute in bfloat16, params f32.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import GroupNorm
from .perspective import ResBlock, _groups


class CircularBiGRU(nn.Module):
    """Bidirectional GRU over a circular (B, W, C) sequence.

    ``wrap`` columns from each end are prepended/appended (azimuth is
    periodic) so the recurrence warms up with real context at the seam;
    the wrapped positions are cropped from the output.
    """

    features: int
    wrap: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, W, C)
        w = x.shape[1]
        k = min(self.wrap, w)
        xw = jnp.concatenate([x[:, w - k:], x, x[:, :k]], axis=1)
        # unroll the scan: the per-step matmuls are tiny (W/16 ~ 32 steps
        # at inference batch), so scan dispatch dominates on TPU; an
        # unrolled body lets XLA software-pipeline the steps.  Numerically
        # identical to the scan (same ops, same order).
        fwd = nn.RNN(nn.GRUCell(self.features, dtype=self.dtype),
                     unroll=16)(xw)
        bwd = nn.RNN(nn.GRUCell(self.features, dtype=self.dtype),
                     reverse=True, keep_order=True, unroll=16)(xw)
        y = jnp.concatenate([fwd, bwd], axis=-1)[:, k : k + w]
        return nn.Dense(self.features, dtype=self.dtype)(y)


class SliceNet(nn.Module):
    """SliceNet-class: (B, H, W, 3) equirect RGB -> (B, H, W) depth in 0~1.

    W must be a multiple of 32 (H = W/2; the decoder expands H/16-row
    slice features by 16x).  Output matches the 16-bit 0~1 encoding of the
    baseline files the reference loads (Depth.cpp:277-355).
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    slice_dim: int = 256
    rnn_layers: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    # f32 for training; bf16 at inference halves the normalization layers'
    # HBM traffic (see PerspectiveDepthNet.norm_dtype)
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb):
        b, h, w, _ = rgb.shape
        if w % 32 != 0 or h % 16 != 0:
            raise ValueError(
                f"SliceNet needs W % 32 == 0 and H % 16 == 0 "
                f"(decoder expands H/16 by 16x), got ({h}, {w})")
        x = rgb.astype(self.dtype)
        levels = []
        for width in self.widths:  # strides 2,4,8,16
            x = ResBlock(width, stride=2, dtype=self.dtype,
                         norm_dtype=self.norm_dtype)(x)
            levels.append(x)

        # multi-scale slice features: each of the last three levels is
        # height-pooled (mean + max, concatenated) per column, projected to
        # slice_dim, width-pooled to W/16 columns, and summed
        ws = w // 16
        seq = jnp.zeros((b, ws, self.slice_dim), self.dtype)
        for lvl in levels[-3:]:
            cols = jnp.concatenate(
                [jnp.mean(lvl, axis=1), jnp.max(lvl, axis=1)], axis=-1)
            cols = nn.Dense(self.slice_dim, dtype=self.dtype)(cols)
            stride = cols.shape[1] // ws
            if stride > 1:  # width-pool finer levels down to W/16 columns
                cols = jnp.mean(
                    cols.reshape(b, ws, stride, self.slice_dim), axis=2)
            seq = seq + cols
        seq = nn.LayerNorm(dtype=self.dtype)(seq)

        for _ in range(self.rnn_layers):
            seq = seq + CircularBiGRU(self.slice_dim, dtype=self.dtype)(seq)

        # slice-wise decoder (no encoder skips): each column's feature is
        # expanded to an H/16-deep column, then conv-upsampled 16x
        hs = h // 16
        col = nn.Dense(hs * 32, dtype=self.dtype)(seq)  # (B, W/16, hs*32)
        y = col.reshape(b, ws, hs, 32).transpose(0, 2, 1, 3)  # (B,hs,ws,32)
        for width in (128, 64, 32, 16):
            bb, hh, ww, cc = y.shape
            y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), "nearest")
            y = nn.Conv(width, (3, 3), use_bias=False, dtype=self.dtype)(y)
            y = GroupNorm(num_groups=_groups(width),
                          dtype=self.norm_dtype, fuse_relu=True)(y)
        y = nn.Conv(1, (1, 1), dtype=jnp.float32)(y)
        return nn.sigmoid(y[..., 0])
