"""Pallas TPU kernel: fused GroupNorm (stats + normalize in one pass).

XLA lowers flax ``nn.GroupNorm`` into a stats reduction kernel plus a
normalize kernel — the activation is read twice and written once.  At the
models' shapes the norms are HBM-bound (the convs run far below MXU peak,
see models/perspective.py), so this kernel keeps the activation VMEM-
resident and does one HBM read + one write: the grid is one image per
step, statistics accumulate in f32 over row bands of the flattened
spatial dim, the per-group mean/inv-std are broadcast back to channels
with tiny one-hot matmuls, and the normalized (optionally ReLU'd) output
is written from the same VMEM block.

Numerics match flax exactly in structure: statistics in f32 from the
(bf16) input with ``var = E[x^2] - E[x]^2``, the affine normalize in f32,
one cast to the output dtype at the end (flax ``_compute_stats`` /
``_normalize`` promote to f32 the same way) — only the f32 summation
*order* differs (banded vs XLA's tree), a <=2 ulp effect.

Used by :class:`panodepth.models.norm.GroupNorm` (a drop-in
``nn.GroupNorm`` subclass) on the bf16-norm TPU inference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's scoped-VMEM limit is 16 MB and grid blocks are DOUBLE-buffered.
# Input/output aliasing does NOT share their VMEM windows (measured on the
# v5e: an aliased 4 MB in + 4 MB out pair still allocates 16.07 MB and
# OOMs), so the gate counts both blocks, doubled, plus the two live f32
# band temporaries of the stats loop.
_VMEM_BUDGET = 15 * 1024 * 1024
# f32 working-band budget (one band is materialized in f32 at a time)
_BAND_BYTES = 2 * 1024 * 1024


def _fold(hw: int, c: int) -> int:
    """Channel-folding factor: pack ``fold`` consecutive pixels' channel
    vectors into one 128-lane row when C < 128 (a free row-major reshape:
    (HW, C) -> (HW/fold, C*fold)).  Without it every f32 vector temporary
    is lane-padded to 128 — a 4x VMEM and VPU waste at C=32."""
    if c >= 128 or 128 % c:
        return 1
    fold = 128 // c
    return fold if hw % fold == 0 else 1


def _pick_band(hw: int, c: int) -> int:
    """Largest row band that divides hw, is a multiple of 16 (the bf16
    sublane tile), and keeps the f32 band temporary within budget."""
    budget = max(16, _BAND_BYTES // (4 * c))
    band = min(hw, budget) // 16 * 16
    while band > 16 and hw % band:
        band -= 16
    return band if band >= 16 and hw % band == 0 else 0


def _kernel(band, c_orig, groups, eps, relu, out_dtype,
            x_ref, s_ref, b_ref, o_ref):
    # the block may be channel-FOLDED: ``fold`` consecutive pixels' channel
    # vectors share one row, so lane j holds channel j % c_orig (see
    # group_norm) — the one-hot mapping below handles both layouts
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cg = c_orig // groups
    nb = hw // band

    def stats(j, acc):
        s1, s2 = acc
        xb = x_ref[0, pl.ds(j * band, band), :].astype(jnp.float32)
        return (s1 + jnp.sum(xb, 0, keepdims=True),
                s2 + jnp.sum(xb * xb, 0, keepdims=True))

    zero = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, nb, stats, (zero, zero))

    # channel -> group one-hot (c, groups): tiny MXU matmuls do the
    # segmented reduce and the group -> channel broadcast (Mosaic lane
    # reshapes/segment ops are restricted; this is layout-trivial)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch % c_orig // cg == gr).astype(jnp.float32)
    n = jnp.float32(hw * cg * (c // c_orig))
    # Precision.HIGHEST: the MXU's default f32 matmul truncates inputs to
    # bf16, which degrades the group stats to ~bf16 accuracy (measured
    # 0.0625 output error on-chip); full precision keeps them f32-exact
    # (the one-hot contraction is a permuted sum, so HIGHEST makes these
    # matmuls exact segmented reductions).
    hi = jax.lax.Precision.HIGHEST
    gmean = jax.lax.dot_general(s1, m, (((1,), (0,)), ((), ())),
                                precision=hi,
                                preferred_element_type=jnp.float32) / n
    gmean2 = jax.lax.dot_general(s2, m, (((1,), (0,)), ((), ())),
                                 precision=hi,
                                 preferred_element_type=jnp.float32) / n
    # clamp like flax _compute_stats: E[x^2]-E[x]^2 can round negative for
    # near-constant groups at large magnitude; rsqrt(neg) would NaN
    gvar = jnp.maximum(gmean2 - gmean * gmean, 0.0)
    ginv = jax.lax.rsqrt(gvar + eps)                        # (1, groups)
    mt = m.T
    mean_c = jax.lax.dot_general(gmean, mt, (((1,), (0,)), ((), ())),
                                 precision=hi,
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(ginv, mt, (((1,), (0,)), ((), ())),
                                precision=hi,
                                preferred_element_type=jnp.float32)
    mul = inv_c * s_ref[:]                                   # (1, c) f32
    add = b_ref[:] - mean_c * mul

    def norm(j, _):
        xb = x_ref[0, pl.ds(j * band, band), :].astype(jnp.float32)
        y = xb * mul + add
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, pl.ds(j * band, band), :] = y.astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, nb, norm, 0)


@functools.partial(jax.jit, static_argnames=("c_orig", "groups", "eps",
                                             "relu", "out_dtype",
                                             "interpret"))
def _group_norm_impl(x, scale, bias, c_orig, groups, eps, relu, out_dtype,
                     interpret):
    n, hw, c = x.shape
    band = _pick_band(hw, c)
    kern = functools.partial(_kernel, band, c_orig, groups, eps, relu,
                             jnp.dtype(out_dtype))
    # same-dtype output aliases the input's HBM buffer (the norm loop
    # reads band j strictly before overwriting it, so in-place is safe);
    # saves an HBM allocation when the activation is dead after the norm.
    # NOTE: Mosaic still allocates separate VMEM windows for the aliased
    # pair — the supported() gate budgets both.
    alias = ({0: 0} if jnp.dtype(out_dtype) == x.dtype else {})
    return pl.pallas_call(
        kern,
        grid=(n,),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), jnp.dtype(out_dtype)),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        input_output_aliases=alias,
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))


def supported(shape, num_groups: int, in_dtype=jnp.bfloat16,
              out_dtype=jnp.bfloat16) -> bool:
    """True when the kernel handles this (N, ..., C) activation.

    The VMEM gate models Mosaic's actual accounting: grid blocks are
    double-buffered, the output aliases the input when dtypes match, and
    the stats loop keeps two f32 band temporaries live.
    """
    if len(shape) < 3:
        return False
    c = shape[-1]
    hw = 1
    for d in shape[1:-1]:
        hw *= d
    if c % num_groups or hw % 16:
        return False
    fold = _fold(hw, c)
    if (c * fold) % 128:
        # unfoldable narrow channels would lane-pad every vector
        # temporary up to 4x; keep those on the flax path
        return False
    in_b = hw * c * jnp.dtype(in_dtype).itemsize
    out_b = hw * c * jnp.dtype(out_dtype).itemsize
    # Mosaic pipelines grid blocks more deeply on long grids (measured on
    # the v5e: the same 1 MB block pair runs at grid 8 but allocates two
    # extra stages at grid 120), so budget 4 buffers per block beyond
    # tiny grids, plus the stats loop's live f32 band temporaries.
    # CAVEAT: only grids 8 and 120 were measured; the 8/9 boundary between
    # them is an unverified assumption (conservative at worst while the
    # kernel stays opt-in, PANODEPTH_FUSED_GN=1).  Re-measure the actual
    # buffer count at intermediate grid sizes before enabling by default.
    bufs = 2 if shape[0] <= 8 else 4
    if bufs * (in_b + out_b) + 3 * _BAND_BYTES > _VMEM_BUDGET:
        return False
    return _pick_band(hw // fold, c * fold) > 0


def group_norm(x, scale, bias, num_groups: int, eps: float = 1e-6,
               relu: bool = False, out_dtype=jnp.bfloat16,
               interpret: bool = False):
    """Fused GroupNorm over (N, ..., C); reduces over all dims but N.

    ``scale``/``bias`` are per-channel (C,) f32 params.  ``relu`` fuses
    the activation into the same pass.  Inference-only (no VJP).
    """
    shape = x.shape
    if not supported(shape, num_groups, x.dtype, out_dtype):
        raise ValueError(f"unsupported GroupNorm shape {shape} "
                         f"(groups={num_groups}); gate on supported()")
    n, c = shape[0], shape[-1]
    hw = 1
    for d in shape[1:-1]:
        hw *= d
    fold = _fold(hw, c)
    scale = scale.astype(jnp.float32)
    bias = bias.astype(jnp.float32)
    if fold > 1:  # lane j of a folded row holds channel j % c
        scale = jnp.tile(scale, fold)
        bias = jnp.tile(bias, fold)
    y = _group_norm_impl(x.reshape(n, hw // fold, c * fold),
                         scale, bias, int(c),
                         int(num_groups), float(eps), bool(relu),
                         jnp.dtype(out_dtype).name, bool(interpret))
    return y.reshape(shape)
