"""Tests for the map utilities, sphere mesh, smoothing fusion, stage A."""

import math

import jax.numpy as jnp
import numpy as np

from panodepth.ops import maps as pmaps_ops
from panodepth.ops.sphere import init_sphere
from panodepth.ops.projection import extract_view, view_shape
from panodepth import fusion, geometry
from panodepth.config import MergeConfig


def test_disp_depth_conversion_involution():
    v = jnp.asarray(np.array([[0.0, 0.5, 2.0, 1e-6]], np.float32))
    out = pmaps_ops.disp_depth_conversion(v)
    np.testing.assert_allclose(np.asarray(out),
                               [[0.0, 2.0, 0.5, 1e-6]], rtol=1e-6)
    back = pmaps_ops.disp_depth_conversion(out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), rtol=1e-5)


def test_copy_invalid_pixels():
    img = jnp.full((4, 8), 0.5, jnp.float32)
    ref = jnp.full((4, 8), 0.3, jnp.float32)
    ref = ref.at[0, 0].set(0.0).at[1, 1].set(1.0)
    out = np.asarray(pmaps_ops.copy_invalid_pixels(img, ref))
    assert out[0, 0] == 0.0 and out[1, 1] == 1.0
    assert out[2, 2] == 0.5  # valid ref pixels don't propagate


def test_avg_valid():
    v = jnp.asarray(np.array([[0.0, 0.2, 0.4]], np.float32))
    np.testing.assert_allclose(float(pmaps_ops.avg_valid(v)), 0.3, rtol=1e-6)
    assert float(pmaps_ops.avg_valid(jnp.zeros((2, 2)))) == 0.0


def test_minmax_normalize_valid():
    v = jnp.asarray(np.array([[0.0, 0.2, 0.6, 1.0]], np.float32))
    out = np.asarray(pmaps_ops.minmax_normalize_valid(v))
    np.testing.assert_allclose(out, [[0.0, 0.0, 0.5, 1.0]], atol=1e-6)


def test_init_sphere_reference_layout():
    mesh = init_sphere(8, 6)
    assert mesh.vertices.shape == (48, 3)
    assert mesh.faces.shape == ((8 - 1) * (6 - 1), 4)
    assert mesh.triangles.shape == (2 * mesh.faces.shape[0], 3)
    # first vertex: north pole (t=0 -> zenith 0 -> (0,0,1))
    np.testing.assert_allclose(mesh.vertices[0], [0, 0, 1], atol=1e-7)
    # texcoords span [0,1] inclusive (SphereMesh.cpp:186-189)
    assert mesh.texcoords.min() == 0.0 and mesh.texcoords.max() == 1.0
    # all vertices unit length
    np.testing.assert_allclose(np.linalg.norm(mesh.vertices, axis=1), 1.0,
                               atol=1e-6)
    # mesh-interpolated warp converges to the analytic gnomonic map:
    # sample a face center and compare against xy_to_spherical
    f = mesh.faces[20]
    center = mesh.vertices[f].mean(axis=0)
    azi, zen = geometry.world_to_spherical(center[None])
    tex = mesh.texcoords[f].mean(axis=0)
    np.testing.assert_allclose(tex[0], azi[0] / (2 * math.pi), atol=0.05)
    np.testing.assert_allclose(tex[1], zen[0] / math.pi, atol=0.05)


def test_solve_depth_by_smoothing(tiny_cfg, tiny_scene):
    plan = fusion.build_fusion_plan(tiny_cfg)
    out, buf = fusion.solve_depth_by_smoothing(
        jnp.asarray(tiny_scene["pmaps"]), plan, iterations=50)
    out = np.asarray(out)
    assert out.shape == (tiny_cfg.out_height, tiny_cfg.out_width)
    assert out.dtype == np.uint16
    # covered interior pixels hold pasted view values
    lvl = plan.levels[-1]
    x_lo, x_hi, y_lo, y_hi = lvl.bboxes[0]
    assert out[(y_lo + y_hi) // 2, (x_lo + x_hi) // 2] > 0
    # pixels far outside every bbox stay black
    assert out[lvl.height0 + 1, 0] == 0


def test_extract_view_shape_and_content():
    fov = (math.radians(30), math.radians(110), math.radians(60),
           math.radians(120))
    h, w = view_shape(fov, width=256)
    # aspect = tan(40deg)/tan(30deg)
    assert w == 256 and h == round(256 / (math.tan(math.radians(40))
                                          / math.tan(math.radians(30))))
    # constant equirect image -> constant view
    rgb = jnp.full((64, 128, 3), 0.25, jnp.float32)
    view = np.asarray(extract_view(rgb, fov, 256))
    np.testing.assert_allclose(view, 0.25, atol=1e-6)


def test_extract_view_gradient_orientation():
    """Zenith gradient must appear top-to-bottom in the view."""
    h, w = 64, 128
    zen = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    img = jnp.asarray(np.broadcast_to(zen, (h, w)))
    fov = (math.radians(30), math.radians(110), math.radians(60),
           math.radians(120))
    view = np.asarray(extract_view(img, fov, 128))
    col = view[:, view.shape[1] // 2]
    assert col[0] < col[-1]  # top (small zenith) darker
    assert np.all(np.diff(col) > -1e-6)
