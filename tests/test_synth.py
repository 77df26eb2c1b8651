"""Procedural synthetic scene engine: geometry, encoding, batch APIs."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from panodepth import geometry, synth
from panodepth import io as pio


def _dev(scene):
    return jax.tree.map(jnp.asarray, scene)


def test_pano_render_shapes_and_bounds():
    rng = np.random.RandomState(0)
    scene = synth.sample_scene(rng)
    rgb, dep = jax.jit(lambda s: synth.render_pano(s, 128))(_dev(scene))
    assert rgb.shape == (64, 128, 3) and dep.shape == (64, 128)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
    # depth bounded away from the gt-invalid threshold and below the cap
    assert float(dep.min()) > 1e-3
    assert float(dep.max()) < 1.0


def test_view_matches_pano_ray():
    """A perspective pixel and the equirect ray along the same direction see
    identical depth (both are exact analytic geometry)."""
    rng = np.random.RandomState(3)
    scene = synth.sample_scene(rng)
    fov = synth.sample_view_fov(rng)
    _, vd = jax.jit(
        lambda s, f: synth.render_view(s, f, 32, 32))(_dev(scene),
                                                      jnp.asarray(fov))
    win = geometry.make_window(*fov.astype(np.float64), xp=np)
    for px, py in ((5, 7), (20, 11), (31, 31)):
        pos = win.corner0 + win.hedge * ((px + 0.5) / 32) \
            + win.vedge * ((py + 0.5) / 32)
        d = (pos / np.linalg.norm(pos)).astype(np.float32)
        _, d01 = synth._render_dirs(_dev(scene), jnp.asarray(d))
        np.testing.assert_allclose(float(vd[py, px]), float(d01), atol=2e-5)


def test_depth_poles_valid():
    """Straight up/down rays must hit ceiling/floor (regression: the
    sign-preserving direction clamp at the poles)."""
    rng = np.random.RandomState(1)
    scene = synth.sample_scene(rng)
    for zen in (0.0, np.pi):
        d = geometry.spherical_to_world(np.float32(0.0), np.float32(zen),
                                        xp=np).astype(np.float32)
        _, d01 = synth._render_dirs(_dev(scene), jnp.asarray(d))
        assert float(d01) > 1e-3


def test_synth_batches_shapes_and_determinism():
    a = next(synth.synth_batches(2, "perspective", view_size=32, seed=9))
    b = next(synth.synth_batches(2, "perspective", view_size=32, seed=9))
    assert a[0].shape == (2, 32, 32, 3) and a[1].shape == (2, 32, 32)
    assert a[2].dtype == jnp.bool_ and bool(a[2].all())
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    p = next(synth.synth_batches(2, "pano", pano_width=64, seed=9))
    assert p[0].shape == (2, 32, 64, 3) and p[1].shape == (2, 32, 64)


def test_write_dataset_roundtrip(tmp_path):
    """Files land in the matterport naming convention and the u16 gt
    quantizes the rendered depth exactly."""
    out = str(tmp_path)
    synth.write_dataset(out, 2, width=64, seed=4, log=lambda *a: None)
    rgbs = pio.list_images(os.path.join(out, "rgb"))
    assert [os.path.basename(f) for f in rgbs] == ["synth_0000.jpg",
                                                   "synth_0001.jpg"]
    gt_f = pio.gt_filename(os.path.join(out, "gt"), "synth_0000",
                           "matterport")
    assert os.path.exists(gt_f)
    gt = pio.load_image01(gt_f)
    rng = np.random.RandomState(4)
    scene = synth.sample_scene(rng)
    _, dep = synth.render_pano(_dev(scene), 64)
    np.testing.assert_allclose(gt, np.asarray(dep), atol=0.51 / 65535)

    from panodepth.models import data as pdata

    pairs = pdata.discover_pairs(os.path.join(out, "rgb"),
                                 os.path.join(out, "gt"))
    assert len(pairs) == 2
