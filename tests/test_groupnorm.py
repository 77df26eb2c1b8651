"""Fused Pallas GroupNorm kernel + drop-in module equivalence.

The kernel must match flax ``nn.GroupNorm`` (f32 stats from the bf16
input, ``E[x^2]-E[x]^2`` variance, affine in f32, one cast at the end) —
tolerance covers only the banded-vs-tree f32 summation order.  The
module's fallback path must be bit-exact with stock ``nn.GroupNorm`` so
training and non-TPU inference are unchanged.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panodepth.kernels import groupnorm
from panodepth.models import norm as pnorm


def _flax_gn(x, scale, bias, groups, dtype):
    gn = nn.GroupNorm(num_groups=groups, dtype=dtype)
    return gn.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("shape,groups", [
    ((2, 32, 32, 64), 32),     # single band, group size 2
    ((1, 64, 128, 128), 32),   # banded (f32 band budget), group size 4
    ((2, 16, 16, 32), 32),     # group size 1, channel-folded (fold=4)
    ((3, 48, 256), 32),        # rank-3 (hohonet horizon features)
    ((2, 64, 64, 16), 16),     # maximal fold (fold=8)
])
def test_kernel_matches_flax_bf16(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0.3, 1.7, shape).astype(np.float32)
                    ).astype(jnp.bfloat16)
    c = shape[-1]
    scale = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-1, 1, c).astype(np.float32))

    assert groupnorm.supported(shape, groups)
    got = groupnorm.group_norm(x, scale, bias, groups,
                               out_dtype=jnp.bfloat16, interpret=True)
    want = _flax_gn(x, scale, bias, groups, jnp.bfloat16)
    assert got.dtype == want.dtype == jnp.bfloat16
    # bf16 outputs: identical up to the final-rounding flip from the f32
    # summation-order difference (<= 2 bf16 ulps, magnitude-relative)
    g = got.astype(np.float32)
    w = want.astype(np.float32)
    diff = np.abs(np.asarray(g) - np.asarray(w))
    tol = 2 ** -7 * np.maximum(1.0, np.abs(np.asarray(w)))
    assert float((diff - tol).max()) <= 0, float(diff.max())
    assert (np.asarray(got) == np.asarray(want)).mean() > 0.98


def test_kernel_relu_fusion():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.ones(64)
    bias = jnp.zeros(64)
    got = groupnorm.group_norm(x, scale, bias, 32, relu=True,
                               out_dtype=jnp.bfloat16, interpret=True)
    plain = groupnorm.group_norm(x, scale, bias, 32, relu=False,
                                 out_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.maximum(plain, 0)))


def test_supported_gates():
    assert not groupnorm.supported((2, 64), 32)           # rank 2
    assert not groupnorm.supported((2, 3, 5, 64), 32)     # HW % 16
    assert not groupnorm.supported((2, 16, 16, 48), 32)   # C % groups
    assert not groupnorm.supported((1, 512, 512, 32), 32)  # block too big
    # the double-buffered 4 MB in + 4 MB out block pair was measured to
    # OOM the 16 MB scoped VMEM on the v5e — must route to flax
    assert not groupnorm.supported((1, 128, 128, 128), 32)
    assert groupnorm.supported((1, 64, 128, 128), 32)
    # the VMEM gate must account for the actual element widths: the same
    # shape that fits as bf16 in/out exceeds the budget as f32 in/out
    assert not groupnorm.supported((1, 64, 128, 128), 32,
                                   jnp.float32, jnp.float32)
    # long grids pipeline more deeply (measured: 2 extra block stages at
    # grid 120) — the same block pair that fits at batch 8 must be
    # rejected at batch 120
    assert groupnorm.supported((8, 64, 128, 128), 32)
    assert not groupnorm.supported((120, 64, 128, 128), 32)
    # unfoldable narrow channels (every vector temp lane-pads 4x) stay
    # on the flax path
    assert not groupnorm.supported((2, 16, 24, 96), 32)


def test_near_constant_group_no_nan():
    """flax clamps E[x^2]-E[x]^2 at 0 before rsqrt; the kernel must too.

    Near-constant groups at large magnitude make the fast-variance
    estimate pure f32 cancellation noise — it rounds negative, and
    without the clamp rsqrt(neg) NaNs (the one-hot broadcast matmul then
    poisons every channel).  This input NaN'd the whole output before the
    clamp was added; flax survives the same input via its own
    ``jnp.maximum(0, ...)`` in ``_compute_stats``.
    """
    rng = np.random.RandomState(0)
    base = rng.uniform(500, 2000, (1, 1, 1, 32)).astype(np.float32)
    x = np.broadcast_to(base, (1, 64, 64, 32)).copy()
    x += rng.normal(0, 1e-3, x.shape).astype(np.float32)
    xj = jnp.asarray(x)  # f32 input: magnitudes survive un-quantized
    scale = jnp.ones(32)
    bias = jnp.asarray(rng.uniform(-1, 1, 32).astype(np.float32))
    got = np.asarray(groupnorm.group_norm(
        xj, scale, bias, 32, out_dtype=jnp.float32, interpret=True),
        np.float32)
    assert np.isfinite(got).all()
    want = np.asarray(_flax_gn(xj, scale, bias, 32, jnp.float32),
                      np.float32)
    assert np.isfinite(want).all()
    # in this cancellation-dominated regime the two summation orders give
    # different (both clamped-finite) variance estimates, so outputs are
    # only loosely comparable; finiteness is the contract being pinned


def test_module_fallback_bitexact_with_flax():
    """Off-TPU (and in f32 training config) the module IS nn.GroupNorm."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 24, 24, 64)).astype(np.float32))
    for dtype in (jnp.float32, jnp.bfloat16):
        ours = pnorm.GroupNorm(num_groups=32, dtype=dtype)
        ref = nn.GroupNorm(num_groups=32, dtype=dtype)
        p = ref.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(ours.apply(p, x)),
                                      np.asarray(ref.apply(p, x)))


def test_module_fused_path_matches_flax(monkeypatch):
    monkeypatch.setattr(pnorm, "_FORCE_INTERPRET", True)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(0.2, 1.1, (2, 24, 24, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ours = pnorm.GroupNorm(num_groups=32, dtype=jnp.bfloat16)
    ref = nn.GroupNorm(num_groups=32, dtype=jnp.bfloat16)
    p = ref.init(jax.random.PRNGKey(0), x)  # same param tree both ways
    got = ours.apply(p, x)
    want = ref.apply(p, x)
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert float(diff.max()) <= 0.016

    fused = pnorm.GroupNorm(num_groups=32, dtype=jnp.bfloat16,
                            fuse_relu=True)
    np.testing.assert_array_equal(
        np.asarray(fused.apply(p, x)),
        np.asarray(jnp.maximum(got, 0)))


def test_module_fuse_relu_fallback_path():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.normal(0, 1, (2, 24, 24, 64)).astype(np.float32))
    fused = pnorm.GroupNorm(num_groups=32, fuse_relu=True)
    ref = nn.GroupNorm(num_groups=32)
    p = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(fused.apply(p, x)),
        np.asarray(nn.relu(ref.apply(p, x))))


def test_module_group_size_config_matches_flax():
    """The stock group_size form (num_groups=None) must normalize like
    nn.GroupNorm instead of dying on the fallback assert."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    ours = pnorm.GroupNorm(num_groups=None, group_size=4)
    ref = nn.GroupNorm(num_groups=None, group_size=4)
    p1 = ours.init(jax.random.PRNGKey(0), x)
    p2 = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(ours.apply(p1, x)),
                               np.asarray(ref.apply(p2, x)),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError):
        pnorm.GroupNorm(num_groups=4, group_size=4).init(
            jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError):
        pnorm.GroupNorm(num_groups=None, group_size=5).init(
            jax.random.PRNGKey(0), x)
