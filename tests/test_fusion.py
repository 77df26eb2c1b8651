"""Fusion parity vs the literal (dict-backed) reference implementation."""

import math

import jax.numpy as jnp
import numpy as np

from panodepth import fusion
from panodepth.config import MergeConfig

from reference_impl import RefPerspectiveMap, ref_solve_depth_all


def _ref_pmaps(scene, cfg):
    ranges = cfg.clamped_ranges()
    return [
        RefPerspectiveMap(scene["pmaps"][v], scene["layout"].fovs[v],
                          ranges[v])
        for v in range(scene["layout"].num_views)
    ]


def test_view_bbox_matches_reference_walk(tiny_cfg):
    """view_bbox must equal the set of X columns the reference walk visits."""
    ranges = tiny_cfg.clamped_ranges()
    for width, height in ((16, 8), (32, 16), (64, 32)):
        height0 = int(math.floor(height * tiny_cfg.zenith_range[0] / math.pi))
        height1 = int(math.ceil(height * tiny_cfg.zenith_range[1] / math.pi))
        for v in range(ranges.shape[0]):
            r = ranges[v]
            # reference walk
            x0 = int(math.floor(r[0] / (2 * math.pi) * (width - 1) + 0.5))
            x1 = int(math.floor(r[1] / (2 * math.pi) * (width - 1) + 0.5))
            xs = 1 if x1 >= x0 else -1
            cols = []
            X = x0
            while True:
                cols.append(X)
                X += xs
                if X == x1:
                    break
            x_lo, x_hi, y_lo, y_hi = fusion.view_bbox(
                r, width, height, height0, height1)
            assert set(cols) == set(range(x_lo, x_hi + 1))
            y0 = int(math.floor(r[2] / math.pi * (height - 1) + 0.5))
            y1 = int(math.floor(r[3] / math.pi * (height - 1) + 0.5))
            assert y_lo == max(y0, height0 + 1)
            assert y_hi == min(y1, height1 - 1)


def test_fuse_matches_reference(tiny_cfg, tiny_scene):
    plan = fusion.build_fusion_plan(tiny_cfg)
    out_fast, buf = fusion.fuse(jnp.asarray(tiny_scene["emap"]),
                                jnp.asarray(tiny_scene["pmaps"]), plan)
    out_fast = np.asarray(out_fast)

    out_ref = ref_solve_depth_all(
        tiny_scene["emap"], _ref_pmaps(tiny_scene, tiny_cfg),
        tiny_cfg.out_width, tiny_cfg.out_height, tiny_cfg.zenith_range,
        schedule=tiny_cfg.schedule)

    assert out_fast.shape == out_ref.shape == (32, 64)
    diff = out_fast.astype(np.int64) - out_ref.astype(np.int64)
    # identical math modulo f32 summation order; allow a few u16 ulps
    assert np.abs(diff).max() <= 4, (
        f"max {np.abs(diff).max()} at {np.unravel_index(np.abs(diff).argmax(), diff.shape)}")
    assert np.abs(diff).mean() < 0.5


def test_uncovered_pixels_pass_baseline_through(tiny_cfg, tiny_scene):
    """Pixels no view covers must keep the (resampled) baseline value."""
    plan = fusion.build_fusion_plan(tiny_cfg)
    emap = jnp.asarray(tiny_scene["emap"])
    out, buf = fusion.fuse(emap, jnp.asarray(tiny_scene["pmaps"]), plan)
    lvl = plan.levels[-1]
    # a pixel uncovered at every level carries the level-0 init value,
    # nearest-upsampled through the pyramid (pure pass-through)
    expected = np.asarray(fusion.init_level0(emap, plan.levels[0]))
    uncovered_all = np.ones_like(lvl.inv_cov, bool)
    for i, l in enumerate(plan.levels):
        up = l.inv_cov > 0
        for _ in range(len(plan.levels) - 1 - i):
            up = np.repeat(np.repeat(up, 2, 0), 2, 1)
        uncovered_all &= ~up
    scale = 2 ** (len(plan.levels) - 1)
    expected = np.repeat(np.repeat(expected, scale, 0), scale, 1)
    band = np.zeros_like(uncovered_all)
    band[lvl.height0: lvl.height1 + 1] = True
    mask = uncovered_all & band
    assert mask.any()
    np.testing.assert_allclose(np.asarray(buf)[mask], expected[mask],
                               atol=1e-6)


def test_out_of_band_rows_zero(tiny_cfg, tiny_scene):
    plan = fusion.build_fusion_plan(tiny_cfg)
    out, _ = fusion.fuse(jnp.asarray(tiny_scene["emap"]),
                         jnp.asarray(tiny_scene["pmaps"]), plan)
    out = np.asarray(out)
    lvl0 = plan.levels[0]
    # rows that were zeroed at level 0 and only upsampled afterwards
    scale = 2 ** (len(plan.levels) - 1)
    assert (out[: lvl0.height0 * scale] == 0).all()


def test_lap4_wraparound():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    lap = np.asarray(fusion.lap4(img))
    # center (1,0): left wraps to (1,3)
    expect = img[1, 0] - 0.25 * (img[1, 3] + img[1, 1] + img[0, 0] + img[2, 0])
    np.testing.assert_allclose(lap[1, 0], expect, atol=1e-6)


def test_upsample2x():
    a = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    up = np.asarray(fusion.upsample2x(a))
    assert up.shape == (4, 4)
    np.testing.assert_array_equal(up[:2, :2],
                                  np.array([[1, 1], [1, 1]], np.float32))
    np.testing.assert_array_equal(up[2:, 2:], np.full((2, 2), 4, np.float32))


def test_fused_abcd_matches_explicit_transform(tiny_cfg, tiny_scene):
    """Applying the cubic inside the slab gathers must equal transforming
    the full perspective maps first (gather and pointwise map commute)."""
    import jax
    from panodepth import registration

    plan = fusion.build_fusion_plan(tiny_cfg)
    pmaps = jnp.asarray(tiny_scene["pmaps"])
    emap = jnp.asarray(tiny_scene["emap"])
    abcd = jnp.asarray(np.array([[0.2, -0.1, 1.05, 0.02],
                                 [0.0, 0.3, 0.7, 0.05]], np.float32))
    out_a, _ = fusion.fuse(emap, jax.vmap(registration.apply_cubic)(pmaps, abcd),
                           plan)
    out_b, _ = fusion.fuse(emap, pmaps, plan, abcd=abcd)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_four_level_schedule_4096():
    """The >=4096 path uses the 4-level 200/150/100/50 schedule."""
    from panodepth.config import MergeConfig, jacobi_schedule

    assert jacobi_schedule(4096) == (200, 150, 100, 50)
    assert jacobi_schedule(2048) == (200, 100, 50)
    cfg = MergeConfig(layout_name="test2", out_width=256)
    plan = fusion.build_fusion_plan(cfg)
    assert len(plan.levels) == 3
    cfg4 = MergeConfig(layout_name="test2", out_width=4096)
    plan4 = fusion.build_fusion_plan(cfg4)
    assert len(plan4.levels) == 4
    assert plan4.levels[0].width == 512
    assert [l.iterations for l in plan4.levels] == [200, 150, 100, 50]
