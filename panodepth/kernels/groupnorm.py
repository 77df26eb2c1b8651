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

# VMEM budget for the per-image (HW, C) input block; in + out + band
# temporaries must stay within the ~16 MB scoped limit with headroom.
_MAX_BLOCK_BYTES = 5 * 1024 * 1024
# f32 working-band budget (one band is materialized in f32 at a time)
_BAND_BYTES = 2 * 1024 * 1024


def _pick_band(hw: int, c: int) -> int:
    """Largest row band that divides hw, is a multiple of 16 (the bf16
    sublane tile), and keeps the f32 band temporary within budget."""
    budget = max(16, _BAND_BYTES // (4 * c))
    band = min(hw, budget) // 16 * 16
    while band > 16 and hw % band:
        band -= 16
    return band if band >= 16 and hw % band == 0 else 0


def _kernel(band, groups, eps, relu, out_dtype, x_ref, s_ref, b_ref, o_ref):
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cg = c // groups
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
    m = (ch // cg == gr).astype(jnp.float32)
    n = jnp.float32(hw * cg)
    gmean = jax.lax.dot_general(s1, m, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / n
    gmean2 = jax.lax.dot_general(s2, m, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / n
    # clamp like flax _compute_stats: E[x^2]-E[x]^2 can round negative for
    # near-constant groups at large magnitude; rsqrt(neg) would NaN
    gvar = jnp.maximum(gmean2 - gmean * gmean, 0.0)
    ginv = jax.lax.rsqrt(gvar + eps)                        # (1, groups)
    mt = m.T
    mean_c = jax.lax.dot_general(gmean, mt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(ginv, mt, (((1,), (0,)), ((), ())),
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


@functools.partial(jax.jit, static_argnames=("groups", "eps", "relu",
                                             "out_dtype", "interpret"))
def _group_norm_impl(x, scale, bias, groups, eps, relu, out_dtype,
                     interpret):
    n, hw, c = x.shape
    band = _pick_band(hw, c)
    kern = functools.partial(_kernel, band, groups, eps, relu,
                             jnp.dtype(out_dtype))
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
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))


def supported(shape, num_groups: int, in_dtype=jnp.bfloat16,
              out_dtype=jnp.bfloat16) -> bool:
    """True when the kernel handles this (N, ..., C) activation.

    The VMEM gate is sized for the *actual* element widths: the per-image
    input and output blocks live in VMEM simultaneously, so an f32
    input/output pair consumes twice the bf16 budget.
    """
    if len(shape) < 3:
        return False
    c = shape[-1]
    hw = 1
    for d in shape[1:-1]:
        hw *= d
    if c % num_groups or hw % 16:
        return False
    per_elem = jnp.dtype(in_dtype).itemsize + jnp.dtype(out_dtype).itemsize
    if hw * c * per_elem > 2 * _MAX_BLOCK_BYTES:  # in + out blocks
        return False
    return _pick_band(hw, c) > 0


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
    y = _group_norm_impl(x.reshape(n, hw, c),
                         scale.astype(jnp.float32),
                         bias.astype(jnp.float32),
                         int(num_groups), float(eps), bool(relu),
                         jnp.dtype(out_dtype).name, bool(interpret))
    return y.reshape(shape)
