"""Perspective monocular depth network (MiDaS/LeReS-class), TPU-native flax.

The reference calls an *external* perspective depth CNN between stage A and
stage C (disabled ``system()`` calls to MiDaS ``run.py`` / LeReS
``test_depth.py``, reference ``Main.cpp:465-474``).  This module provides the
on-TPU replacement: a ResNet-style encoder with a RefineNet-style fusion
decoder (the MiDaS architecture family), NHWC, bfloat16 compute / float32
params, GroupNorm (batch-size independent, shard-friendly).

Output is a positive per-pixel *inverse-depth-like* prediction at input
resolution; :func:`predict_depth01` maps it into the 0~1 depth encoding the
registration stage consumes (the cubic registration absorbs any monotone
value remapping, exactly as it absorbs LeReS/MiDaS output conventions).
"""

from __future__ import annotations

from typing import Sequence

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import GroupNorm


def _groups(channels: int, target: int = 32) -> int:
    """A divisor of ``channels`` close to ``target`` (for GroupNorm)."""
    return math.gcd(channels, target)


class QConv(nn.Module):
    """int8 post-training-quantized conv (inference only).

    Per-OUTPUT-CHANNEL int8 weights with f32 absmax/127 scales (converted
    offline from a trained f32 checkpoint by :mod:`panodepth.models
    .quantize`), DYNAMIC per-image symmetric activation quantization (an
    absmax reduce — no calibration set, no zero-points, padding stays
    exact since 0 maps to 0), int8xint8 conv with int32 accumulation on
    the MXU (v5e int8 peak is 2x bf16, 394 TOP/s), dequant straight back
    to the compute dtype.  The GroupNorm that follows every quantized
    conv re-normalizes, which is what makes the perspective family
    PTQ-tolerant.
    """

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (kh, kw, cin, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        # per-image dynamic scale: one outlier view can't crush the
        # quantization grid of the other 119 in the e2e fan-out batch
        sx = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
        sx = jnp.maximum(sx, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (sx * scale)).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    quantized: bool = False  # int8 PTQ convs (inference; models.quantize)

    def _conv(self, features, kernel, strides, use_bias):
        if self.quantized:
            return QConv(features, kernel, strides, use_bias=use_bias,
                         dtype=self.dtype)
        return nn.Conv(features, kernel, strides, use_bias=use_bias,
                       dtype=self.dtype)

    @nn.compact
    def __call__(self, x):
        gn = lambda **kw: GroupNorm(num_groups=_groups(self.features),
                                    dtype=self.norm_dtype, **kw)
        y = self._conv(self.features, (3, 3), (self.stride, self.stride),
                       False)(x)
        y = gn(fuse_relu=True)(y)
        y = self._conv(self.features, (3, 3), (1, 1), False)(y)
        y = gn()(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = self._conv(self.features, (1, 1),
                           (self.stride, self.stride), False)(x)
            x = gn()(x)
        return nn.relu(y + x)


class FusionBlock(nn.Module):
    """RefineNet-style decoder block: upsample, add skip, refine."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, skip=None):
        b, h, w, c = x.shape
        conv = (lambda *a, **kw: QConv(*a, dtype=self.dtype, **kw)) \
            if self.quantized else \
            (lambda *a, **kw: nn.Conv(*a, dtype=self.dtype, **kw))
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = conv(self.features, (3, 3))(x)
        if skip is not None:
            skip = conv(self.features, (3, 3), use_bias=False)(skip)
            x = x + skip
        return ResBlock(self.features, dtype=self.dtype,
                        norm_dtype=self.norm_dtype,
                        quantized=self.quantized)(x)


class PerspectiveDepthNet(nn.Module):
    """Encoder-decoder monocular depth net on (B, H, W, 3) in [0, 1].

    H and W must be multiples of 32.  Returns (B, H, W) positive values.
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    decoder_width: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    # GroupNorm compute dtype.  f32 for training; bf16 at *inference*
    # halves the HBM traffic of the normalization layers — the actual
    # bottleneck of this net on TPU (the convs run at <25% MXU): +24%
    # throughput (1711 -> 2119 img/s at 120x256x256 on v5e) with held-out
    # RMSE unchanged (0.029440 vs 0.029437 on the zoo weights).  The
    # params stay f32 either way, so checkpoints load under both; the e2e
    # drivers pass bf16 on TPU (load_model_checkpoint ``norm_dtype``).
    norm_dtype: jnp.dtype = jnp.float32
    # int8 PTQ inference graph: every conv except the 1x1 output head runs
    # as a QConv (int8 MXU + dynamic activation quant).  Params for this
    # mode come from models.quantize.quantize_perspective_params; training
    # always uses the f32 graph.
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        conv = (lambda *a, **kw: QConv(*a, dtype=self.dtype, **kw)) \
            if self.quantized else \
            (lambda *a, **kw: nn.Conv(*a, dtype=self.dtype, **kw))
        x = x.astype(self.dtype)
        x = conv(self.widths[0] // 2, (7, 7), (2, 2), use_bias=False)(x)
        x = GroupNorm(num_groups=_groups(x.shape[-1]),
                      dtype=self.norm_dtype, fuse_relu=True)(x)

        skips = []
        for i, (blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for b in range(blocks):
                x = ResBlock(width, stride=2 if b == 0 else 1,
                             dtype=self.dtype, norm_dtype=self.norm_dtype,
                             quantized=self.quantized)(x)
            skips.append(x)

        # decoder: deepest feature up through the skips
        y = conv(self.decoder_width, (3, 3), use_bias=False)(skips[-1])
        for skip in reversed(skips[:-1]):
            y = FusionBlock(self.decoder_width, dtype=self.dtype,
                            norm_dtype=self.norm_dtype,
                            quantized=self.quantized)(y, skip)
        y = FusionBlock(self.decoder_width, dtype=self.dtype,
                        norm_dtype=self.norm_dtype,
                        quantized=self.quantized)(y)  # to H/2

        y = conv(self.decoder_width // 2, (3, 3))(y)
        y = nn.relu(y)
        b, h, w, c = y.shape
        y = jax.image.resize(y, (b, h * 2, w * 2, c), "bilinear")
        y = conv(32, (3, 3))(y)
        y = nn.relu(y)
        # output head: softplus (a dead output relu would zero every
        # gradient permanently), with the bias initialized so the initial
        # prediction sits at the depth targets' scale (~0.15 in the 0~1
        # Matterport encoding).  softplus(0) = 0.69 is ~5x the target mean,
        # and that large consistent error makes AdamW multiplicatively
        # shrink every layer until the pre-activation saturates (~-37,
        # where softplus' underflows to exactly 0 in f32 and training
        # freezes) — observed on the v5e before this init.
        y = nn.Conv(1, (1, 1), dtype=jnp.float32,
                    bias_init=nn.initializers.constant(-1.8))(y)
        return nn.softplus(y[..., 0])


# relu gain: 1/sqrt(E[relu(z)^2]) for z ~ N(0,1) — makes conv(relu(x))
# variance-preserving under scaled weight standardization (NF-ResNets,
# Brock et al. 2021, "Characterizing signal propagation")
_RELU_GAIN = math.sqrt(2.0 / (1.0 - 1.0 / math.pi))


class WSConv(nn.Module):
    """Conv with scaled weight standardization + learnable gain/bias.

    The standardization depends only on the *weights* (not activations),
    so at inference it costs O(params) arithmetic and ZERO extra
    activation HBM traffic — unlike GroupNorm, which forces a full
    materialize -> stats -> normalize round-trip of every activation
    tensor.  That round-trip is why the GN perspective net runs <25% MXU
    (HBM-bound); this is the norm-free replacement.
    """

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    gain_act: float = _RELU_GAIN

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features), jnp.float32)
        gain = self.param("gain", nn.initializers.ones,
                          (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mu = w.mean((0, 1, 2), keepdims=True)
        var = w.var((0, 1, 2), keepdims=True)
        fan_in = kh * kw * cin
        w = (w - mu) * jax.lax.rsqrt(var * fan_in + 1e-8)
        w = w * (self.gain_act * gain)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class NFResBlock(nn.Module):
    """Pre-activation normalizer-free residual block.

    ``h <- h + alpha * f(relu(h / beta))`` with f built from
    variance-preserving WS convs; ``beta`` is the ANALYTIC running std of
    the residual stream (tracked in Python at trace time, no activation
    stats), ``alpha`` the residual rate.  Transition blocks (stride/width
    change) also route the shortcut through the downscaled activation,
    resetting the stream variance (NF-ResNet signal-propagation recipe).
    """

    features: int
    stride: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x * jnp.asarray(1.0 / self.beta, self.dtype))
        y = WSConv(self.features, (3, 3), (self.stride, self.stride),
                   dtype=self.dtype)(out)
        y = nn.relu(y)
        y = WSConv(self.features, (3, 3), dtype=self.dtype)(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = WSConv(self.features, (1, 1), (self.stride, self.stride),
                       dtype=self.dtype)(out)
        return x + jnp.asarray(self.alpha, self.dtype) * y


class NFFusionBlock(nn.Module):
    """Norm-free RefineNet-style decoder block (upsample, add skip,
    refine), WS convs throughout; additions rescaled by 1/sqrt(2) to keep
    the stream near unit variance."""

    features: int
    alpha: float = 0.2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = WSConv(self.features, (3, 3), dtype=self.dtype,
                   gain_act=1.0)(x)
        if skip is not None:
            skip = WSConv(self.features, (3, 3), dtype=self.dtype,
                          gain_act=1.0)(skip)
            x = (x + skip) * jnp.asarray(1.0 / math.sqrt(2.0), self.dtype)
        return NFResBlock(self.features, alpha=self.alpha,
                          dtype=self.dtype)(x)


class NFPerspectiveNet(nn.Module):
    """Normalizer-free PerspectiveDepthNet (same encoder/decoder topology,
    same interface, ~same parameter count) built from weight-standardized
    convs with analytic variance tracking instead of GroupNorm.

    Motivation: at inference the GN variant is HBM-bound on its norms
    (<25% MXU; the fused-GN Pallas kernel lost its A/B, PERF.md) — the
    norm-free design removes ALL activation-statistics traffic, leaving
    pure conv->relu chains XLA fuses into single MXU passes.  Select with
    ``train_cli --variant nf``; checkpoints carry ``variant: "nf"`` in the
    arch sidecar.  ``norm_dtype`` is accepted for interface compatibility
    and ignored (there are no norms).
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    decoder_width: int = 128
    alpha: float = 0.2
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32  # unused; API-compatible

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # stem: gain_act=1 (raw RGB in, no preceding relu)
        x = WSConv(self.widths[0] // 2, (7, 7), (2, 2), dtype=self.dtype,
                   gain_act=1.0)(x)

        skips = []
        var = 1.0
        for blocks, width in zip(self.stage_sizes, self.widths):
            for b in range(blocks):
                x = NFResBlock(width, stride=2 if b == 0 else 1,
                               alpha=self.alpha, beta=math.sqrt(var),
                               dtype=self.dtype)(x)
                # transition resets the stream (shortcut re-derived from
                # the normalized pre-activation), then each block adds
                # alpha^2 variance
                var = (1.0 if b == 0 else var) + self.alpha ** 2
            skips.append(x)

        y = WSConv(self.decoder_width, (3, 3), dtype=self.dtype,
                   gain_act=1.0)(skips[-1])
        for skip in reversed(skips[:-1]):
            y = NFFusionBlock(self.decoder_width, alpha=self.alpha,
                              dtype=self.dtype)(y, skip)
        y = NFFusionBlock(self.decoder_width, alpha=self.alpha,
                          dtype=self.dtype)(y)  # to H/2

        y = WSConv(self.decoder_width // 2, (3, 3), dtype=self.dtype)(
            nn.relu(y))
        y = nn.relu(y)
        b, h, w, c = y.shape
        y = jax.image.resize(y, (b, h * 2, w * 2, c), "bilinear")
        y = WSConv(32, (3, 3), dtype=self.dtype)(y)
        y = nn.relu(y)
        # output head: identical to the GN variant (see its comment for
        # the softplus + bias-init rationale)
        y = nn.Conv(1, (1, 1), dtype=jnp.float32,
                    bias_init=nn.initializers.constant(-1.8))(y)
        return nn.softplus(y[..., 0])


def _percentile99(flat):
    """Per-row 99th percentile of (B, N), same linear-interpolation
    semantics as ``jnp.percentile(..., 99.0, axis=1)``.

    ``jnp.percentile`` lowers to a full per-row sort; on TPU the exact
    interpolated rank statistic only needs the top ~1% via ``lax.top_k``
    (PANODEPTH_P99=topk selects it; parity vs the sort path is pinned in
    tests, the on-chip timing A/B lives in scripts/tpu_validate.py).
    PANODEPTH_P99=approx swaps in ``lax.approx_max_k`` (measured 3.6x
    faster than the sort on the v5e at the e2e shape): the TPU-native
    partial-reduce top-k with a >=95% recall target, aggregated to an
    exact top-k of its candidates, so the rank statistic can only shift
    by a few ranks within the top 1% — a tiny monotone perturbation of
    the normalize scale that the downstream cubic registration absorbs
    (Depth.cpp:1261-1414 registers every view to the baseline anyway).
    approx is the DEFAULT on TPU: the same-conditions 12-scene held-out
    CLI A/B measured it accuracy-neutral (mean fused RMSE 0.012528 vs
    0.012529 on v1, 0.012384 vs 0.012381 on v2; 7/12 scenes bit-identical,
    max per-scene delta +0.7%, 12/12 improved over baseline either way).
    Other backends default to the exact sort (CPU tests stay bit-exact).
    """
    import os

    default = "approx" if jax.default_backend() == "tpu" else "sort"
    mode = os.environ.get("PANODEPTH_P99", default)
    if mode not in ("topk", "approx"):
        return jnp.percentile(flat, 99.0, axis=1)
    n = flat.shape[1]
    rank = (n - 1) * 99 // 100            # floor((n-1)*0.99), exact in int
    frac = (n - 1) * 0.99 - rank
    k = n - rank                          # descending index n-1-rank, +1
    if mode == "approx":
        v = jax.lax.approx_max_k(flat, k)[0]  # (B, k) descending
    else:
        v = jax.lax.top_k(flat, k)[0]     # (B, k) descending
    lo = v[:, k - 1]                      # ascending a[rank]
    hi = v[:, k - 2] if k >= 2 else v[:, k - 1]
    return lo + jnp.float32(frac) * (hi - lo)


def predict_depth01(params, model: PerspectiveDepthNet, rgb):
    """Run the net and map its positive output into 0~1 depth encoding.

    Normalizes the prediction per image by its 99th-percentile value — a
    monotone map the downstream cubic registration absorbs (it registers
    each view to the panoramic baseline anyway; see Depth.cpp:1261-1414).
    """
    pred = model.apply(params, rgb)
    hi = _percentile99(pred.reshape(pred.shape[0], -1))
    return jnp.clip(pred / jnp.maximum(hi, 1e-6)[:, None, None], 0.0, 1.0)
