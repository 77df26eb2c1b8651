"""Image sampling with the reference's exact nearest-neighbor semantics.

The reference samples *everything* nearest-neighbor via C float->int casts
(truncation), never bilinear:

* ``PerspectiveMap::Value``        (reference Depth.cpp:111-118):
  ``X = (int)(x * (w-1)); Y = (int)(y * (h-1))``
* ``EquirectangularMap::ValueAtCoord`` (reference Depth.cpp:551-556):
  ``x = (int)(azi / 2pi * (w-1)); y = (int)(zen / pi * (h-1))``

These are preserved bit-for-bit here (truncate-toward-zero then clip, which
is identical on the in-range inputs the reference feeds them).  Bilinear
sampling is provided for the stage-A RGB warp, where the reference instead
relied on GL_LINEAR texture filtering (SphereMesh.cpp:58-88).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * np.pi


def as01_post(x):
    """u16 -> f32 0~1 normalization AFTER a gather (no-op on floats).

    Gather and pointwise normalization commute exactly (u16 fits f32's
    mantissa), so streamed uint16 emaps/pmaps can stay 16-bit through the
    big slab gathers — halving their HBM read traffic (XLA TPU gather cost
    scales with gathered element width) — and normalize on the smaller
    gathered slabs.  Element-for-element the same k/65535 as normalizing
    the full table first (within 1 u16 of output wiggle from XLA fusing
    the graphs with different fma contraction).
    """
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) / 65535.0
    return x


def _trunc_index(v, n, xp):
    """C-style (int) cast of ``v`` expected in [0, n-1], then clip."""
    idx = v.astype(jnp.int32) if xp is jnp else v.astype(np.int32)
    return xp.clip(idx, 0, n - 1)


def sample_unit_nearest(img, x, y, xp=jnp):
    """pmap.Value: sample channel-0 of ``img`` (H, W[, C]) at unit coords.

    ``x``/``y`` are arrays in [0, 1]; index = trunc(x * (W-1)).
    """
    if img.ndim == 3:
        img = img[..., 0]
    h, w = img.shape
    xi = _trunc_index(x * (w - 1), w, xp)
    yi = _trunc_index(y * (h - 1), h, xp)
    return img[yi, xi]


def sample_equirect_nearest(img, azimuth, zenith, xp=jnp):
    """emap.ValueAtCoord: sample an equirect map (H, W[, C]) at spherical coords."""
    if img.ndim == 3:
        img = img[..., 0]
    h, w = img.shape
    xi = _trunc_index(azimuth / TWO_PI * (w - 1), w, xp)
    yi = _trunc_index(zenith / np.pi * (h - 1), h, xp)
    return img[yi, xi]


def rotate_equirect(img, yaw=0.0, pitch=0.0, roll=0.0, out_shape=None):
    """Resample an equirect image under a 3D rotation (bilinear).

    Covers the tilted top/bottom-cap rendering of the unused
    ``shaders/fs_equirectangular2.txt`` (per-fragment rotation matrices
    applied to the view ray before the equirect lookup) and doubles as a
    panorama rotation augmentation for model training.  Angles in radians:
    ``yaw`` about +z, ``pitch`` about +y, ``roll`` about +x, applied in that
    order to each output pixel's ray before sampling the source.
    """
    h, w = out_shape if out_shape is not None else img.shape[:2]
    # same (w-1)/(h-1) texel convention as the other samplers, so the
    # identity rotation reproduces the source exactly
    x = jnp.arange(w, dtype=jnp.float32) / (w - 1) * TWO_PI
    y = jnp.arange(h, dtype=jnp.float32) / (h - 1) * np.pi
    azi, zen = jnp.meshgrid(x, y)
    sz = jnp.sin(zen)
    d = jnp.stack([sz * jnp.cos(azi), sz * jnp.sin(azi), jnp.cos(zen)], -1)

    def rot(axis, angle):
        c, s = np.cos(angle), np.sin(angle)
        i, j = {2: (0, 1), 1: (2, 0), 0: (1, 2)}[axis]
        m = np.eye(3, dtype=np.float32)
        m[i, i] = c; m[j, j] = c; m[i, j] = -s; m[j, i] = s
        return m

    m = rot(0, roll) @ rot(1, pitch) @ rot(2, yaw)
    d = d @ jnp.asarray(m.T)
    src_azi = jnp.arctan2(d[..., 1], d[..., 0]) % TWO_PI
    src_zen = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    return sample_equirect_bilinear(img, src_azi, src_zen)


def _bilinear_coords(h, w, azimuth, zenith):
    """Shared tap coordinates for the bilinear equirect samplers.

    Azimuth wraps at the seam, zenith clamps at the poles; texel centers
    follow the same (w-1)/(h-1) convention as the nearest path so the two
    modes agree at exact pixel positions.  These conventions are
    parity-load-bearing — both samplers must tap identically.
    Returns (x0, x1, y0, y1, wx, wy) with the weights shaped (..., 1).
    """
    fx = (azimuth % TWO_PI) / TWO_PI * (w - 1)
    fy = jnp.clip(zenith / np.pi * (h - 1), 0.0, h - 1)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0 = jnp.clip(x0, 0, w - 1)
    x1 = (x0 + 1) % w  # azimuth wraps at the seam
    y0 = jnp.clip(y0, 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    return x0, x1, y0, y1, wx, wy


def sample_equirect_bilinear(img, azimuth, zenith):
    """Bilinear equirect sampling with azimuth wraparound (stage-A RGB warp).

    ``img`` is (H, W) or (H, W, C); zenith clamps at the poles, azimuth wraps
    (see :func:`_bilinear_coords`).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    x0, x1, y0, y1, wx, wy = _bilinear_coords(h, w, azimuth, zenith)
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    out = top * (1 - wy) + bot * wy
    return out[..., 0] if squeeze else out


def sample_equirect_nearest_mc(img, azimuth, zenith):
    """Multi-channel nearest equirect sampling with the BILINEAR path's
    tap convention (the max-weight tap of its 2x2 neighborhood, azimuth
    wrap included): ONE gather per output pixel instead of four.  The
    fast path for *feature-map* projection (cubemap.py ``taps="nearest"``)
    where gather cost — proportional to gathered bytes, PERF.md — is the
    bottleneck.  Distinct from :func:`sample_equirect_nearest`, the
    C-cast parity op (pmap.Value semantics, channel-0 only).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    x0, x1, y0, y1, wx, wy = _bilinear_coords(h, w, azimuth, zenith)
    xn = jnp.where(wx[..., 0] >= 0.5, x1, x0)
    yn = jnp.where(wy[..., 0] >= 0.5, y1, y0)
    out = img[yn, xn]
    return out[..., 0] if squeeze else out


def pack_rgb_u32(rgb):
    """(H, W, 3) 8-bit RGB (uint8, or f32 0~1 that decoded from 8-bit) ->
    (H, W) uint32 with R|G|B in the low 24 bits.

    One u32 gather per bilinear tap replaces a 3-element channel gather in
    :func:`sample_equirect_bilinear_packed` — a quarter of the f32 table
    bytes and one gather instead of three (measured 12.1 -> 4.7 ms/pano on
    the v5e for 15-view extraction).  Exact for 8-bit sources.
    """
    if rgb.dtype != jnp.uint8:
        rgb = jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    r = rgb.astype(jnp.uint32)
    return (r[..., 0] << 16) | (r[..., 1] << 8) | r[..., 2]


def sample_equirect_bilinear_packed(packed, azimuth, zenith):
    """Bilinear equirect RGB sampling from a :func:`pack_rgb_u32` table.

    Same coordinate conventions as :func:`sample_equirect_bilinear`
    (azimuth wraps, zenith clamps); returns (..., 3) f32 in 0~1.  The
    interpolation runs on the exact integer channel values in f32, so the
    result matches the f32 path up to f32 rounding (the source was 8-bit
    either way).
    """
    h, w = packed.shape
    x0, x1, y0, y1, wx, wy = _bilinear_coords(h, w, azimuth, zenith)

    def tap(yy, xx):
        v = packed[yy, xx]
        return jnp.stack([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF],
                         -1).astype(jnp.float32)

    top = tap(y0, x0) * (1 - wx) + tap(y0, x1) * wx
    bot = tap(y1, x0) * (1 - wx) + tap(y1, x1) * wx
    return (top * (1 - wy) + bot * wy) * (1.0 / 255.0)


def _bayer_offsets(h, w):
    """Per-pixel ordered-dither offsets in [-0.5, 0.5): the classic 4x4
    Bayer matrix tiled over (h, w).  Zero-mean over every 4x4 block."""
    base = jnp.asarray([[0, 8, 2, 10], [12, 4, 14, 6],
                        [3, 11, 1, 9], [15, 7, 13, 5]], jnp.float32)
    t = jnp.tile(base, ((h + 3) // 4, (w + 3) // 4))[:h, :w]
    return (t + 0.5) / 16.0 - 0.5


def pack_rgb565_u16(rgb, dither: bool = False):
    """(H, W, 3) RGB (uint8, or f32 0~1) -> (H, W) uint16 in RGB565.

    Half the gathered bytes of :func:`pack_rgb_u32` (TPU gather cost
    scales with gathered element width — see PERF.md), at the cost of
    quantizing the CNN's RGB input to 5/6/5 bits per channel
    (round-to-nearest; max channel error 1/62 ~ 4 u8 LSBs).  Opt-in via
    ``--extract-dtype packed16`` — accuracy must be A/B'd per model.

    ``dither=True`` adds a per-pixel ordered (Bayer 4x4) offset before
    rounding — per-channel phase-shifted so the three channels' dither
    patterns decorrelate.  The quantization error becomes zero-mean
    spatial noise instead of banded contours on smooth gradients (the
    failure mode the r4 pair16 CLI proof caught on a smooth-walled v1
    scene: false contours read as depth structure by the perspective
    CNN).  Bilinear taps then average adjacent dither phases, roughly
    halving the effective error again.  Worst-case per-pixel channel
    error grows from ~half a 565 step to ~one step (~8 u8 LSBs).
    """
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) * (1.0 / 255.0)
    rgb = jnp.clip(rgb.astype(jnp.float32), 0.0, 1.0)
    if dither:
        h, w = rgb.shape[0], rgb.shape[1]
        t = _bayer_offsets(h, w)
        tr, tg, tb = (t, jnp.roll(t, (2, 2), (0, 1)),
                      jnp.roll(t, (1, 3), (0, 1)))
        r = jnp.clip(jnp.round(rgb[..., 0] * 31.0 + tr), 0, 31)
        g = jnp.clip(jnp.round(rgb[..., 1] * 63.0 + tg), 0, 63)
        b = jnp.clip(jnp.round(rgb[..., 2] * 31.0 + tb), 0, 31)
        r, g, b = (r.astype(jnp.uint16), g.astype(jnp.uint16),
                   b.astype(jnp.uint16))
    else:
        r = jnp.round(rgb[..., 0] * 31.0).astype(jnp.uint16)
        g = jnp.round(rgb[..., 1] * 63.0).astype(jnp.uint16)
        b = jnp.round(rgb[..., 2] * 31.0).astype(jnp.uint16)
    return (r << 11) | (g << 5) | b


def sample_equirect_bilinear_packed565(packed, azimuth, zenith):
    """Bilinear equirect RGB sampling from a :func:`pack_rgb565_u16` table.

    Same tap conventions as :func:`sample_equirect_bilinear`; returns
    (..., 3) f32 in 0~1 (each channel decoded to its quantized 0~1 value,
    interpolated in f32).
    """
    h, w = packed.shape
    x0, x1, y0, y1, wx, wy = _bilinear_coords(h, w, azimuth, zenith)

    def tap(yy, xx):
        return _decode565(packed[yy, xx].astype(jnp.int32))

    top = tap(y0, x0) * (1 - wx) + tap(y0, x1) * wx
    bot = tap(y1, x0) * (1 - wx) + tap(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _decode565(v):
    """int32 RGB565 value(s) -> (..., 3) f32 in 0~1 (quantized levels)."""
    return jnp.stack([((v >> 11) & 0x1F) * (1.0 / 31.0),
                      ((v >> 5) & 0x3F) * (1.0 / 63.0),
                      (v & 0x1F) * (1.0 / 31.0)], -1).astype(jnp.float32)


def pack_rgb565_pair_u32(rgb, dither: bool = False):
    """(H, W, 3) RGB -> (H, W) uint32: RGB565 of pixel x in the high 16
    bits and of pixel (x+1) % W (azimuth wrap baked in) in the low 16.

    A bilinear tap row needs exactly pixels (x0, x0+1), so ONE u32 gather
    from this table serves BOTH horizontal taps: 2 gathers per output
    pixel instead of the 4 of :func:`pack_rgb_u32` / the per-tap u16 of
    :func:`pack_rgb565_u16`.  The extraction gather is gather-RATE-bound
    (~6.9 G elem/s generic XLA gather, PERF.md), so halving the count is
    the lever the byte-narrowing modes can't reach.  Same table bytes as
    pack_rgb_u32 (each pixel stored twice at half precision); same 5/6/5
    quantization trade as packed16 (opt-in, A/B per model; ``dither``
    trades banding for zero-mean noise — see :func:`pack_rgb565_u16`).
    """
    p = pack_rgb565_u16(rgb, dither=dither).astype(jnp.uint32)
    return (p << 16) | jnp.roll(p, -1, axis=1)


def sample_equirect_bilinear_packed565pair(packed, azimuth, zenith):
    """Bilinear equirect RGB sampling from a :func:`pack_rgb565_pair_u32`
    table — one gather per tap ROW (top + bottom = 2 total).

    Identical tap conventions and arithmetic order to
    :func:`sample_equirect_bilinear_packed565`, so the two agree
    bit-for-bit; only the gather pattern differs.
    """
    h, w = packed.shape
    x0, _x1, y0, y1, wx, wy = _bilinear_coords(h, w, azimuth, zenith)

    def row(yy):
        v = packed[yy, x0].astype(jnp.int32)
        left = _decode565((v >> 16) & 0xFFFF)   # pixel x0
        right = _decode565(v & 0xFFFF)          # pixel (x0+1) % w
        return left * (1 - wx) + right * wx

    return row(y0) * (1 - wy) + row(y1) * wy
