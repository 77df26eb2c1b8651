"""End-to-end on-device pipeline test (RGB -> fused depth, one graph)."""

import jax
import jax.numpy as jnp
import numpy as np

import math

from panodepth.config import MergeConfig, ViewLayout, register_layout
from panodepth.e2e import full_pipeline
from panodepth.models.panoramic import PanoBaselineNet
from panodepth.models.perspective import PerspectiveDepthNet

from conftest import make_equirect

D2R = math.pi / 180.0

# stage A requires window FOVs < 180 deg (gnomonic hemisphere); the shared
# "test2" layout's second view is wider, so e2e uses its own sane layout
register_layout(ViewLayout(
    "test_e2e",
    fovs=np.array([(25 * D2R, 175 * D2R, 30 * D2R, 150 * D2R),
                   (185 * D2R, 355 * D2R, 30 * D2R, 150 * D2R)]),
    ranges=np.array([(170 * D2R, 30 * D2R, 40 * D2R, 140 * D2R),
                     (350 * D2R, 190 * D2R, 40 * D2R, 140 * D2R)]),
))
E2E_CFG = MergeConfig(layout_name="test_e2e", out_width=64)


def test_full_pipeline_runs():
    tiny_cfg = E2E_CFG
    rgb = jnp.asarray(np.stack([make_equirect(64, 32)] * 3, -1))
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    base = PanoBaselineNet(widths=(8, 16, 16, 32))
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    bp = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))

    out, abcd, baseline, pmaps = jax.jit(
        lambda r: full_pipeline(r, persp, pp, base, bp, cfg=tiny_cfg,
                                view_width=64)
    )(rgb)
    assert out.shape == (tiny_cfg.out_height, tiny_cfg.out_width)
    assert out.dtype == jnp.uint16
    assert baseline.shape == (32, 64)
    assert np.isfinite(np.asarray(abcd)).all()
    assert len(pmaps) == tiny_cfg.layout.num_views  # per-view list


def test_full_pipeline_precomputed_baseline(tiny_scene):
    tiny_cfg = E2E_CFG
    rgb = jnp.asarray(np.stack([make_equirect(64, 32)] * 3, -1))
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out, abcd, baseline, _ = jax.jit(
        lambda r, b: full_pipeline(r, persp, pp, baseline=b, cfg=tiny_cfg,
                                   view_width=64)
    )(rgb, jnp.asarray(tiny_scene["emap"]))
    assert out.shape == (tiny_cfg.out_height, tiny_cfg.out_width)
    np.testing.assert_array_equal(np.asarray(baseline),
                                  tiny_scene["emap"])
