"""Full-merge parity on the PRODUCTION 5fold_leres layout vs the oracle.

The other parity suites use a small synthetic layout; this one runs the real
15-view configuration (reversed azimuth ranges, the 359.9-degree clamp, all
three zenith rows) end to end — registration, cubic transform, and the full
multiresolution fusion — against the literal loop-based reference
implementation, at reduced resolution so the oracle stays tractable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panodepth import registration
from panodepth.config import MergeConfig
from panodepth.fusion import build_fusion_plan
from panodepth.pipeline import merge_arrays

from conftest import make_equirect, smooth_depth
from reference_impl import (
    RefPerspectiveMap,
    ref_depth2depth_transform,
    ref_solve_depth_all,
    ref_solve_depth_to_depth,
)


@pytest.fixture(scope="module")
def leres_scene():
    from panodepth import geometry

    cfg = MergeConfig(layout_name="5fold_leres", out_width=128)
    layout = cfg.layout
    emap = np.clip(make_equirect(128, 64) * 0.9 + 0.04, 0, 1)
    pmaps = []
    for v in range(layout.num_views):
        win = geometry.make_window(*layout.fovs[v], xp=np)
        w, h = 128, 124  # aspect ~1.036 for the leres windows
        xg, yg = np.meshgrid(np.arange(w) / (w - 1), np.arange(h) / (h - 1))
        azi, zen = geometry.xy_to_spherical(win, xg, yg, xp=np)
        true = smooth_depth(azi, zen)
        pm = np.clip(true * (0.78 + 0.02 * (v % 5)) + 0.03 + 0.01 * (v // 5),
                     0, 1)
        pmaps.append(pm.astype(np.float32))
    return dict(cfg=cfg, emap=emap, pmaps=np.stack(pmaps))


def test_leres_registration_parity(leres_scene):
    cfg = leres_scene["cfg"]
    ranges = cfg.clamped_ranges()
    fast = np.asarray(registration.register_views(
        jnp.asarray(leres_scene["emap"]), jnp.asarray(leres_scene["pmaps"]),
        cfg))
    for v in range(0, 15, 3):
        pm = RefPerspectiveMap(leres_scene["pmaps"][v], cfg.layout.fovs[v],
                               ranges[v])
        abcd_ref, X, Y = ref_solve_depth_to_depth(
            leres_scene["emap"], pm, cfg.zenith_range)
        np.testing.assert_allclose(np.polyval(fast[v], X),
                                   np.polyval(abcd_ref, X), atol=1e-3)


def test_leres_full_merge_parity(leres_scene):
    cfg = leres_scene["cfg"]
    ranges = cfg.clamped_ranges()
    out_fast, abcd = jax.jit(
        lambda e, p: merge_arrays(e, p, cfg))(
        jnp.asarray(leres_scene["emap"]), jnp.asarray(leres_scene["pmaps"]))
    out_fast = np.asarray(out_fast)

    # oracle transform + fusion using the SAME fitted coefficients: the
    # f32-vs-f64 solver difference is bounded by the registration parity
    # test above; sharing abcd isolates the transform+fusion semantics
    abcd = np.asarray(abcd, np.float64)
    ref_pmaps = []
    for v in range(15):
        pm = RefPerspectiveMap(leres_scene["pmaps"][v], cfg.layout.fovs[v],
                               ranges[v])
        pm.data = ref_depth2depth_transform(pm.data, abcd[v])
        ref_pmaps.append(pm)
    out_ref = ref_solve_depth_all(
        leres_scene["emap"], ref_pmaps, cfg.out_width, cfg.out_height,
        cfg.zenith_range, schedule=cfg.schedule)

    diff = np.abs(out_fast.astype(np.int64) - out_ref.astype(np.int64))
    # identical semantics incl. the flat-index seam wrap; residual is f32
    # summation-order noise
    assert diff.max() <= 4, diff.max()
    assert diff.mean() < 0.5, diff.mean()
    # rows above the finest band: zeroed rows are exact; rows upsampled
    # from covered coarse rows may carry +-1 ulp of f32 Jacobi noise
    plan = build_fusion_plan(cfg)
    lvl = plan.levels[-1]
    top = np.abs(out_fast[: lvl.height0].astype(np.int64)
                 - out_ref[: lvl.height0].astype(np.int64))
    assert top.max() <= 1, top.max()
    scale = 2 ** (len(plan.levels) - 1)
    zero_rows = plan.levels[0].height0 * scale
    np.testing.assert_array_equal(out_fast[:zero_rows], 0)
