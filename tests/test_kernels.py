"""Pallas kernel tests (interpret mode on CPU; exact on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panodepth import fusion
from panodepth.kernels import jacobi as kj


def _case(h, w, rng):
    buf = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 0.01, (h, w)).astype(np.float32))
    cov = jnp.zeros((h, w), bool).at[h // 4 : -h // 4, w // 4 : -w // 4].set(True)
    return buf, tgt, cov


def test_single_block_kernel_matches_jnp():
    rng = np.random.RandomState(0)
    buf, tgt, cov = _case(64, 128, rng)
    a = fusion.jacobi(buf, tgt, cov, 20, 0.5, 1e-4)
    b = kj.pallas_jacobi(buf, tgt, cov, 20, 0.5, 1e-4, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_banded_kernel_matches_jnp():
    rng = np.random.RandomState(1)
    h, w = 512, 1024
    # force the banded path by shrinking the single-block budget
    old = kj._SINGLE_BLOCK_BYTES
    kj._SINGLE_BLOCK_BYTES = 0
    try:
        buf, tgt, cov = _case(h, w, rng)
        a = fusion.jacobi(buf, tgt, cov, kj.K_PER_PASS, 0.5, 1e-4)
        b = kj.pallas_jacobi(buf, tgt, cov, kj.K_PER_PASS, 0.5, 1e-4,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        kj._SINGLE_BLOCK_BYTES = old


def test_cpu_fallback_without_interpret():
    rng = np.random.RandomState(2)
    buf, tgt, cov = _case(32, 64, rng)
    a = fusion.jacobi(buf, tgt, cov, 10, 0.5, 1e-4)
    b = kj.pallas_jacobi(buf, tgt, cov, 10, 0.5, 1e-4)  # backend != tpu
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_banded_kernel_remainder_iterations():
    """Iteration counts not divisible by K run a remainder pass (the old
    assert made pallas_jacobi not a drop-in for fusion.jacobi)."""
    rng = np.random.RandomState(3)
    h, w = 256, 1024
    old = kj._SINGLE_BLOCK_BYTES
    kj._SINGLE_BLOCK_BYTES = 0
    try:
        buf, tgt, cov = _case(h, w, rng)
        a = fusion.jacobi(buf, tgt, cov, 23, 0.5, 1e-4)
        b = kj.pallas_jacobi(buf, tgt, cov, 23, 0.5, 1e-4, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        kj._SINGLE_BLOCK_BYTES = old


def test_band_config_respects_vmem_budget():
    """The (k, halo, band) selection must stay inside the ~10 MB slab
    budget at EVERY width (the old 32-row floor blew it past ~4600 wide)
    and fall back to None when nothing fits."""
    for w in (512, 1024, 2048, 4096, 8192, 12288):
        k, halo, band = kj._band_config(w)
        assert band >= 8 and band % 8 == 0
        assert halo >= k  # the corruption front must die in the halo
        assert 8 * (band + 2 * halo) * w * 4 <= 10 * 1024 * 1024, w
    assert kj._band_config(2048) == (10, 16, 128)  # production unchanged
    assert kj._band_config(4096) == (10, 16, 48)
    assert kj._band_config(16384) is None  # jnp fallback kicks in
