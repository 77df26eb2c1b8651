"""Train-time input corruption: JPEG artifacts, sensor noise, exposure.

The reference's stage-A inputs are JPEGs of real photographs (reference
``Main.cpp:320`` loads ``<name>.jpg`` panoramas), while our synthetic
training RGB is clean analytic renders — a domain gap the zoo should be
hardened against (camera pipelines add compression artifacts, sensor
noise, and exposure variation that the analytic renderer never produces).

Everything here is pure jnp and jit/vmap-friendly so it composes with the
on-device synthetic renderer (:mod:`panodepth.synth`) — corruption runs on
the TPU inside the training input graph, no host round-trip.

JPEG simulation fidelity: JPEG's information loss happens in exactly one
place — quantization of the 8x8 block-DCT coefficients (entropy coding is
lossless).  :func:`jpeg_artifacts` reproduces that stage exactly: JFIF
RGB->YCbCr, 4:2:0 chroma subsampling (box average, libjpeg's h2v2
downsampler), the orthonormal 8x8 DCT (mathematically identical to the
JPEG FDCT's 1/4*C(u)C(v) normalization), quantization with the Annex-K
tables under the standard libjpeg quality scaling, dequantization, and
inverse.  Deviations from a byte-exact libjpeg round-trip are limited to
integer-DCT approximation error and the decoder's chroma upsampling filter
(we replicate, libjpeg defaults to "fancy" triangular) — a couple of
codes out of 255, irrelevant for augmentation (the test suite pins the
luma path against a real encoder to ~1/255 mean error).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-T T.81 Annex K quantization tables (luminance / chrominance),
# row-major natural (not zigzag) order.
_QTAB_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)
_QTAB_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix.  ``D @ x @ D.T`` over an 8x8
    block equals the JPEG FDCT (T.81 A.3.3) including its 1/4*C(u)C(v)
    normalization; ``D.T @ X @ D`` is the exact inverse."""
    n = np.arange(8)
    D = np.cos((2 * n[None, :] + 1) * n[:, None] * math.pi / 16.0)
    D = D * math.sqrt(2.0 / 8.0)
    D[0] *= 1.0 / math.sqrt(2.0)
    return D.astype(np.float32)


_DCT8 = _dct8()


def _quality_scale(table: np.ndarray, quality):
    """libjpeg quality scaling (jcparam.c jpeg_quality_scaling): quality
    1..100 (traced OK) -> per-coefficient step sizes, clamped to [1, 255].
    """
    q = jnp.clip(jnp.asarray(quality, jnp.float32), 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    return jnp.clip(jnp.floor((table * scale + 50.0) / 100.0), 1.0, 255.0)


def _blockify(x):
    """(..., H, W) -> (..., H//8, W//8, 8, 8)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 8, 8, w // 8, 8)
    return jnp.moveaxis(x, -3, -2)


def _unblockify(x):
    *lead, hb, wb, _, _ = x.shape
    return jnp.moveaxis(x, -2, -3).reshape(*lead, hb * 8, wb * 8)


def _quantize_plane(plane, qtab):
    """DCT -> quantize -> dequantize -> inverse DCT on one sample plane
    (centered codes, i.e. sample-128).  ``qtab`` broadcasts (8, 8) or a
    per-sample (B, 1, 1, 8, 8)."""
    blocks = _blockify(plane)
    coef = jnp.einsum("ab,...bc,dc->...ad", _DCT8, blocks, _DCT8)
    coef = jnp.round(coef / qtab) * qtab
    out = jnp.einsum("ba,...bc,cd->...ad", _DCT8, coef, _DCT8)
    return _unblockify(out)


def jpeg_artifacts(rgb, quality):
    """Apply JPEG 4:2:0 quantization artifacts to a batch of images.

    rgb: (B, H, W, 3) in [0, 1]; H and W must be multiples of 16 (the
    4:2:0 MCU size).  quality: scalar or (B,) in 1..100 (traced values
    fine).  Returns the degraded batch, same shape/dtype-family, in [0, 1].
    """
    b, h, w, _ = rgb.shape
    if h % 16 or w % 16:
        raise ValueError(f"jpeg_artifacts needs H, W multiples of 16 "
                         f"(4:2:0 MCU), got {h}x{w}")
    quality = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,))
    q_luma = _quality_scale(_QTAB_LUMA, quality[:, None, None])
    q_chroma = _quality_scale(_QTAB_CHROMA, quality[:, None, None])
    q_luma = q_luma[:, None, None]      # (B, 1, 1, 8, 8) vs block axes
    q_chroma = q_chroma[:, None, None]

    x = jnp.round(jnp.clip(rgb, 0.0, 1.0).astype(jnp.float32) * 255.0)
    r, g, bl = x[..., 0], x[..., 1], x[..., 2]
    # JFIF RGB -> YCbCr (T.871), centered at 0 for the DCT
    y = 0.299 * r + 0.587 * g + 0.114 * bl - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bl
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bl
    # 4:2:0: box-average chroma (libjpeg h2v2_downsample), round to codes
    cb = jnp.round((cb.reshape(b, h // 2, 2, w // 2, 2)).mean((2, 4)))
    cr = jnp.round((cr.reshape(b, h // 2, 2, w // 2, 2)).mean((2, 4)))

    y = _quantize_plane(jnp.round(y), q_luma)
    cb = _quantize_plane(cb, q_chroma)
    cr = _quantize_plane(cr, q_chroma)
    # replicate chroma back up (libjpeg -nosmooth style)
    cb = jnp.repeat(jnp.repeat(cb, 2, -2), 2, -1)
    cr = jnp.repeat(jnp.repeat(cr, 2, -2), 2, -1)

    y = y + 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    out = jnp.stack([r, g, bl], -1)
    return jnp.clip(jnp.round(out) / 255.0, 0.0, 1.0).astype(rgb.dtype)


class CorruptConfig(NamedTuple):
    """Per-batch corruption distribution (all probabilities per-sample)."""

    p_jpeg: float = 0.6
    quality: Tuple[float, float] = (25.0, 95.0)
    p_noise: float = 0.5
    noise_sigma: Tuple[float, float] = (0.0, 0.04)   # read noise, [0,1] units
    shot_sigma: float = 0.5   # shot-noise scale: sigma_px = s * sqrt(px)/255
    p_photo: float = 0.8
    gain: Tuple[float, float] = (0.6, 1.4)
    gamma: Tuple[float, float] = (0.7, 1.4)
    wb: float = 0.08          # per-channel white-balance jitter (+-)


def corrupt(rgb, key, cfg: CorruptConfig = CorruptConfig()):
    """Randomized camera-pipeline corruption of an RGB batch (B, H, W, 3).

    Pipeline order matches a real camera: exposure (gain/gamma/white
    balance) -> sensor noise (shot + read) -> 8-bit quantization -> JPEG
    compression.  Each stage is applied per-sample with its own
    probability; depth targets are untouched by construction (corruption
    is appearance-only, the scene geometry is identical).
    """
    b = rgb.shape[0]
    k_sel, k_q, k_gain, k_gamma, k_wb, k_read, k_shot, k_sig = \
        jax.random.split(key, 8)
    sel = jax.random.uniform(k_sel, (3, b))
    on_photo = (sel[0] < cfg.p_photo)[:, None, None, None]
    on_noise = (sel[1] < cfg.p_noise)[:, None, None, None]
    on_jpeg = sel[2] < cfg.p_jpeg

    x = jnp.clip(rgb.astype(jnp.float32), 0.0, 1.0)

    # exposure: per-channel white balance, gamma, gain
    wb = 1.0 + jax.random.uniform(k_wb, (b, 1, 1, 3), minval=-cfg.wb,
                                  maxval=cfg.wb)
    gamma = jax.random.uniform(k_gamma, (b, 1, 1, 1), minval=cfg.gamma[0],
                               maxval=cfg.gamma[1])
    gain = jax.random.uniform(k_gain, (b, 1, 1, 1), minval=cfg.gain[0],
                              maxval=cfg.gain[1])
    photo = jnp.clip((x * wb) ** gamma * gain, 0.0, 1.0)
    x = jnp.where(on_photo, photo, x)

    # sensor noise: signal-dependent shot noise + constant read noise
    sig = jax.random.uniform(k_sig, (b, 1, 1, 1), minval=cfg.noise_sigma[0],
                             maxval=cfg.noise_sigma[1])
    read = jax.random.normal(k_read, x.shape) * sig
    shot = (jax.random.normal(k_shot, x.shape)
            * (cfg.shot_sigma / 255.0) * jnp.sqrt(x * 255.0) * (sig / max(
                cfg.noise_sigma[1], 1e-6)))
    x = jnp.where(on_noise, jnp.clip(x + read + shot, 0.0, 1.0), x)

    # 8-bit quantization + JPEG blocking/ringing artifacts
    quality = jax.random.uniform(k_q, (b,), minval=cfg.quality[0],
                                 maxval=cfg.quality[1])
    degraded = jpeg_artifacts(x, quality)
    x = jnp.where(on_jpeg[:, None, None, None], degraded, x)
    return x.astype(rgb.dtype)


def corrupt_batches(batches, seed: int, cfg: CorruptConfig = CorruptConfig()):
    """Wrap a (rgb, depth, valid) batch iterator with jitted corruption.

    Works for both the on-device synthetic stream and host-decoded file
    batches (arrays are moved to device either way); depth/valid pass
    through untouched.  The key stream is deterministic in ``seed`` and
    the step index, so a resumed run at step k corrupts identically.
    """
    fn = jax.jit(lambda r, k: corrupt(r, k, cfg))
    base = jax.random.PRNGKey(np.uint32(seed ^ 0xC0DEC))
    for i, (rgb, depth, valid) in enumerate(batches):
        yield fn(jnp.asarray(rgb), jax.random.fold_in(base, i)), depth, valid


def eval_corruption(rgb, seed: int = 0, quality: float = 40.0,
                    sigma: float = 0.02):
    """FIXED mid-severity corruption for held-out evaluation: every sample
    gets gain 0.85, gamma 1.15, the given noise sigma, and JPEG at the
    given quality — deterministic in ``seed`` (noise draw only), so clean
    vs corrupted deltas are comparable across checkpoints."""
    x = jnp.clip(rgb.astype(jnp.float32), 0.0, 1.0)
    x = jnp.clip((x ** 1.15) * 0.85, 0.0, 1.0)
    noise = jax.random.normal(jax.random.PRNGKey(seed), x.shape) * sigma
    x = jnp.clip(x + noise, 0.0, 1.0)
    return jpeg_artifacts(x, quality).astype(rgb.dtype)
