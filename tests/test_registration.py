"""Registration solver parity vs the literal reference implementation."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from panodepth import registration
from panodepth.config import MergeConfig

from reference_impl import (
    RefPerspectiveMap,
    ref_depth2depth_transform,
    ref_solve_depth_to_depth,
)


def _ref_register(scene, cfg):
    layout = scene["layout"]
    ranges = cfg.clamped_ranges()
    out = []
    for v in range(layout.num_views):
        pm = RefPerspectiveMap(scene["pmaps"][v], layout.fovs[v], ranges[v])
        abcd, X, Y = ref_solve_depth_to_depth(scene["emap"], pm,
                                              cfg.zenith_range)
        out.append((abcd, X, Y))
    return out


def test_register_views_matches_reference(tiny_cfg, tiny_scene):
    fast = np.asarray(registration.register_views(
        jnp.asarray(tiny_scene["emap"]), jnp.asarray(tiny_scene["pmaps"]),
        tiny_cfg))
    for v, (abcd_ref, X, Y) in enumerate(_ref_register(tiny_scene, tiny_cfg)):
        # compare the fitted curves over the sample support, not raw coeffs
        # (the cubic is mildly ill-conditioned; curves are the invariant)
        pred_fast = np.polyval(fast[v], X)
        pred_ref = np.polyval(abcd_ref, X)
        np.testing.assert_allclose(pred_fast, pred_ref, atol=5e-4)
        # residual optimality: fast residual can't be meaningfully worse
        r_fast = np.mean((pred_fast - Y) ** 2)
        r_ref = np.mean((pred_ref - Y) ** 2)
        assert r_fast <= r_ref * (1 + 1e-3) + 1e-9


def test_register_recovers_inverse_affine(tiny_cfg, tiny_scene):
    """pmaps were distorted by v-dependent affine maps; the cubic fit must
    approximately invert them over the sampled value range."""
    fast = np.asarray(registration.register_views(
        jnp.asarray(tiny_scene["emap"]), jnp.asarray(tiny_scene["pmaps"]),
        tiny_cfg))
    for v in range(2):
        scale = 0.75 + 0.1 * v
        offset = 0.08 - 0.03 * v
        x = np.linspace(0.25, 0.6, 20)  # interior of the value range
        true = (x - offset) / scale * 0.92 + 0.02  # emap = 0.92*f + 0.02
        pred = np.polyval(fast[v], x)
        np.testing.assert_allclose(pred, true, atol=0.03)


def test_fit_cubic_narrow_spread_matches_f64():
    """Narrow-spread depth data (the common real-scene regime) must still
    fit accurately: a fixed-center Vandermonde is nearly collinear there
    (t^3 ~ const*t), and the normal-equations Gram squares that — the
    standardized basis + refinement in fit_cubic has to hold the curve to
    the f64 answer.  Regression for a garbage-coefficient bug that the
    wide-spread parity fixtures missed (caught by the verify CLI drive:
    the scene registered to NaN)."""
    rng = np.random.RandomState(7)
    for lo, hi in ((0.45, 0.55), (0.30, 0.42), (0.05, 0.12)):
        x = rng.uniform(lo, hi, 3000)
        coef = np.array([0.8, -0.5, 1.2, 0.05])
        y = np.polyval(coef, x) + rng.normal(0, 1e-3, x.size)
        want = np.polyfit(x.astype(np.float64), y.astype(np.float64), 3)
        got = np.asarray(registration.fit_cubic(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.ones(x.size, jnp.float32)))
        # curves over the sample support are the invariant, not raw coeffs
        xs = np.linspace(lo, hi, 50)
        np.testing.assert_allclose(np.polyval(got, xs),
                                   np.polyval(want, xs), atol=5e-4)
        assert np.isfinite(got).all()


def test_apply_cubic_matches_reference(tiny_scene):
    abcd = np.array([0.3, -0.2, 1.1, 0.05], np.float32)
    fast = np.asarray(registration.apply_cubic(
        jnp.asarray(tiny_scene["pmaps"][0]), jnp.asarray(abcd)))
    slow = ref_depth2depth_transform(tiny_scene["pmaps"][0], abcd)
    np.testing.assert_allclose(fast, slow, atol=1e-6)


def test_apply_reciprocal_clamps():
    img = jnp.asarray(np.linspace(-0.5, 1.5, 64, dtype=np.float32))
    out = np.asarray(registration.apply_reciprocal(
        img, jnp.asarray([1.0, 0.5, 0.4, 0.1], jnp.float32)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    x = np.clip(np.asarray(img), 1e-4, 1 - 1e-4)
    np.testing.assert_allclose(out, np.clip(0.4 / (x + 0.5) + 0.1, 0, 1),
                               atol=1e-6)


def test_fit_reciprocal_gauss_newton():
    rng = np.random.RandomState(5)
    x = rng.uniform(0.1, 0.9, 500).astype(np.float32)
    a, b, c, d = 1.3, 0.4, 0.7, 0.05
    y = c / (a * x + b) + d
    p = np.asarray(registration.fit_reciprocal(
        jnp.asarray(x), jnp.asarray(y), jnp.ones_like(jnp.asarray(x))))
    pred = p[2] / (p[0] * x + p[1]) + p[3]
    np.testing.assert_allclose(pred, y, atol=1e-4)


def test_fit_cubic_global(tiny_cfg, tiny_scene):
    """fit_cubic_global must match a float64 oracle built from the literal
    SolveDepthToDepth2 sample construction (Depth.cpp:1158-1259)."""
    emap = np.asarray(tiny_scene["emap"])
    result = np.asarray(registration.apply_cubic(
        jnp.asarray(emap), jnp.asarray([0.0, 0.0, 0.8, 0.05])))
    abcd = np.asarray(registration.fit_cubic_global(
        jnp.asarray(result), jnp.asarray(emap), tiny_cfg.zenith_range))

    h, w = result.shape
    y0 = int(math.floor(h * tiny_cfg.zenith_range[0] / math.pi))
    y1 = int(math.ceil(h * tiny_cfg.zenith_range[1] / math.pi))
    xs_list, ys_list = [], []
    from reference_impl import clamp01eps, emap_value_at_coord
    for Y in range(y0, y1 + 1):
        for X in range(w):
            azi = X / (w - 1) * 2 * math.pi
            zen = Y / (h - 1) * math.pi
            xs_list.append(clamp01eps(float(result[Y, X])))
            ys_list.append(clamp01eps(emap_value_at_coord(emap, azi, zen)))
    Xv = np.asarray(xs_list, np.float64)
    Yv = np.asarray(ys_list, np.float64)
    V = np.stack([Xv ** 3, Xv ** 2, Xv, np.ones_like(Xv)], -1)
    oracle, *_ = np.linalg.lstsq(V, Yv, rcond=None)
    grid = np.linspace(Xv.min(), Xv.max(), 50)
    np.testing.assert_allclose(np.polyval(abcd, grid),
                               np.polyval(oracle, grid), atol=1e-3)


def test_fit_poly_degrees():
    """fit_poly covers the reference's whole functor family (deg 1,2,3,4)."""
    rng = np.random.RandomState(11)
    x = rng.uniform(0.05, 0.95, 2000).astype(np.float32)
    for deg in (1, 2, 3, 4):
        true = rng.uniform(-0.5, 0.8, deg + 1)
        y = np.polyval(true, x).astype(np.float32)
        c = np.asarray(registration.fit_poly(
            jnp.asarray(x), jnp.asarray(y), jnp.ones_like(jnp.asarray(x)),
            degree=deg))
        np.testing.assert_allclose(np.polyval(c, x), y, atol=2e-3,
                                   err_msg=f"degree {deg}")


def test_apply_poly_matches_apply_cubic(tiny_scene):
    abcd = jnp.asarray([0.3, -0.2, 1.1, 0.05])
    img = jnp.asarray(tiny_scene["pmaps"][0])
    np.testing.assert_allclose(
        np.asarray(registration.apply_poly(img, abcd)),
        np.asarray(registration.apply_cubic(img, abcd)), atol=1e-6)
