"""BiFuse-class panoramic depth network (bidirectional two-branch family).

Third on-TPU panoramic baseline family, completing the reference's
baseline-method set (filename conventions for bifuse/slicenet/unifuse/
hohonet baselines, reference ``Main.cpp:500-516``; ``README.md:15``).
Architecture follows the BiFuse shape (Wang et al., CVPR 2020): TWO full
branches — an equirectangular encoder and a cubemap encoder — exchange
features **bidirectionally** at every pyramid level (bi-projection fusion:
each branch receives the other's features projected into its own domain and
emits a gated residual update), both branches decode to a depth prediction,
and a learned per-pixel weight map fuses the two predictions.  This differs
from the UniFuse-class :class:`~panodepth.models.panoramic.PanoBaselineNet`,
whose fusion is unidirectional (cube -> equirect only) and which decodes a
single branch.

TPU notes: the cube branch runs all 6 faces as one (B*6) batch so every conv
is a single large MXU matmul; the domain projections are the static-table
gathers of :mod:`panodepth.ops.cubemap` (differentiable, XLA-friendly).
Compute in bfloat16, params f32, GroupNorm (shard-friendly, batch-size
independent).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cubemap import cubemap_to_equirect, equirect_to_cubemap
from .norm import GroupNorm
from .perspective import ResBlock, _groups


class BiProjFusion(nn.Module):
    """Bidirectional bi-projection fusion at one pyramid level.

    Each branch sees [own features, other branch's features projected into
    its domain], produces a sigmoid-gated residual, and keeps its identity
    path — the BiFuse paper's bi-projection module collapsed to one gated
    conv per direction.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    taps: str = "bilinear"  # feature-projection taps ("nearest" = fast)

    @nn.compact
    def __call__(self, e, c, batch: int):
        f = self.features
        eh, ew = e.shape[1], e.shape[2]
        fs = c.shape[1]
        c6 = c.reshape(batch, 6, fs, fs, f)
        c2e = jax.vmap(
            lambda fc: cubemap_to_equirect(fc, eh, ew, self.taps))(c6)
        e2c = jax.vmap(
            lambda img: equirect_to_cubemap(img, fs, self.taps))(e)
        e2c = e2c.reshape(batch * 6, fs, fs, f)

        def gated(own, other, name):
            z = jnp.concatenate([own, other], axis=-1)
            z = nn.Conv(f, (3, 3), use_bias=False, dtype=self.dtype,
                        name=f"{name}_mix")(z)
            z = GroupNorm(num_groups=_groups(f), dtype=self.norm_dtype,
                          name=f"{name}_gn")(z)
            gate = nn.Conv(f, (1, 1), dtype=self.dtype,
                           name=f"{name}_gate")(z)
            return own + jnp.tanh(z) * nn.sigmoid(gate)

        return gated(e, c2e, "equi"), gated(c, e2c, "cube")


class _Decoder(nn.Module):
    """Skip-connected nearest-up decoder shared by both branches."""

    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skips):
        y = skips[-1]
        for skip in reversed(skips[:-1]):
            b, h, w, c = y.shape
            y = jax.image.resize(y, (b, h * 2, w * 2, c), "nearest")
            y = nn.Conv(skip.shape[-1], (3, 3), use_bias=False,
                        dtype=self.dtype)(y)
            y = GroupNorm(num_groups=_groups(skip.shape[-1]),
                          dtype=self.norm_dtype, fuse_relu=True)(y)
            y = y + skip
        b, h, w, c = y.shape
        y = jax.image.resize(y, (b, h * 2, w * 2, c), "bilinear")
        y = nn.Conv(32, (3, 3), dtype=self.dtype)(y)
        return nn.relu(y)


class BiFuseNet(nn.Module):
    """BiFuse-class: (B, H, W, 3) equirect RGB -> (B, H, W) depth in 0~1.

    W must be a multiple of 32 (H = W/2; the cube faces are W/4 wide so the
    deepest face level stays >= 2 px).  Output matches the 16-bit 0~1
    encoding of the baseline files the reference loads (Depth.cpp:277-355).
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16
    # f32 for training; bf16 at inference halves the normalization layers'
    # HBM traffic (see PerspectiveDepthNet.norm_dtype)
    norm_dtype: jnp.dtype = jnp.float32
    # "fast" = TPU inference path for the SAME checkpoint (no parameter
    # change): nearest-tap feature projections at every fusion level (1
    # gather per pixel instead of 4) and the final cube-decoder projection
    # gathered at half resolution + dense bilinear 2x upsample.  The
    # gathers are this family's measured bottleneck (1.2 % MFU, PERF.md);
    # sub-pixel interpolation of LEARNED features is not load-bearing —
    # accuracy adjudicated by the 12-scene proof before any default flip.
    proj: str = "bilinear"

    @nn.compact
    def __call__(self, rgb):
        b, h, w, _ = rgb.shape
        fastp = self.proj == "fast"
        taps = "nearest" if fastp else "bilinear"
        x = rgb.astype(self.dtype)
        # the RGB image projection stays bilinear (cheap C=3 gathers; the
        # encoder stem sees real pixels, not learned features)
        cube = jax.vmap(lambda img: equirect_to_cubemap(img, w // 4))(x)
        cube = cube.reshape(b * 6, w // 4, w // 4, 3)

        equi_skips, cube_skips = [], []
        e, c = x, cube
        for width in self.widths:
            e = ResBlock(width, stride=2, dtype=self.dtype,
                         norm_dtype=self.norm_dtype)(e)
            c = ResBlock(width, stride=2, dtype=self.dtype,
                         norm_dtype=self.norm_dtype)(c)
            e, c = BiProjFusion(width, dtype=self.dtype,
                                norm_dtype=self.norm_dtype,
                                taps=taps)(e, c, b)
            equi_skips.append(e)
            cube_skips.append(c)

        ye = _Decoder(dtype=self.dtype,
                      norm_dtype=self.norm_dtype)(equi_skips)  # (B, H, W, 32)
        yc = _Decoder(dtype=self.dtype,
                      norm_dtype=self.norm_dtype)(cube_skips)  # (B*6, S, S, 32)
        yc = yc.reshape(b, 6, yc.shape[1], yc.shape[2], yc.shape[3])
        if fastp:
            yc_e = jax.vmap(lambda fc: cubemap_to_equirect(
                fc, h // 2, w // 2, "nearest"))(yc)
            yc_e = jax.image.resize(
                yc_e, (b, h, w, yc_e.shape[-1]), "bilinear")
        else:
            yc_e = jax.vmap(lambda fc: cubemap_to_equirect(fc, h, w))(yc)

        # BiFuse's final fusion: a learned per-pixel weight map blends the
        # two branch predictions
        de = nn.Conv(1, (1, 1), dtype=jnp.float32, name="head_equi")(ye)
        dc = nn.Conv(1, (1, 1), dtype=jnp.float32, name="head_cube")(yc_e)
        wmap = nn.Conv(1, (3, 3), dtype=jnp.float32, name="fuse_weight")(
            jnp.concatenate([ye, yc_e], axis=-1))
        m = nn.sigmoid(wmap[..., 0])
        return nn.sigmoid(m * de[..., 0] + (1.0 - m) * dc[..., 0])
