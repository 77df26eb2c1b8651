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


def test_write_dataset_corrupted_rgb_exact_gt(tmp_path):
    """--jpeg-quality/--noise-sigma degrade only the saved RGB (real
    low-quality libjpeg encode + sensor noise); the u16 gt stays exact, so
    the corrupted evalset scores robustness against an unchanged truth."""
    clean, dirty = str(tmp_path / "a"), str(tmp_path / "b")
    synth.write_dataset(clean, 1, width=64, seed=4, log=lambda *a: None)
    synth.write_dataset(dirty, 1, width=64, seed=4, jpeg_quality=30,
                        noise_sigma=0.03, log=lambda *a: None)
    gt_a = pio.load_image01(os.path.join(clean, "gt", "synth_0000.png"))
    gt_b = pio.load_image01(os.path.join(dirty, "gt", "synth_0000.png"))
    np.testing.assert_array_equal(gt_a, gt_b)
    rgb_a = pio.load_image01(os.path.join(clean, "rgb", "synth_0000.jpg"))
    rgb_b = pio.load_image01(os.path.join(dirty, "rgb", "synth_0000.jpg"))
    d = float(np.abs(rgb_a - rgb_b).mean())
    assert d > 0.01, d  # visibly degraded
    assert os.path.getsize(os.path.join(dirty, "rgb", "synth_0000.jpg")) < \
        os.path.getsize(os.path.join(clean, "rgb", "synth_0000.jpg"))


def test_v1_render_golden():
    """v1 scenes must render bit-identically across engine changes (the
    committed zoo evals regenerate their scenes from seeds); golden values
    captured before the v2 scene-diversity extension landed."""
    rng = np.random.RandomState(0)
    scene = synth.sample_scene(rng)
    rgb, dep = jax.jit(lambda s: synth.render_pano(s, 128))(_dev(scene))
    rgb, dep = np.asarray(rgb), np.asarray(dep)
    np.testing.assert_allclose(rgb[10, 20],
                               [0.23981937766075134, 0.36071014404296875,
                                0.5624438524246216], rtol=0, atol=1e-7)
    np.testing.assert_allclose(float(dep[40, 100]), 0.21996389, atol=1e-7)
    # no v2 features may activate on a v1 scene
    assert float(scene.room2_on) == 0.0 and float(scene.light_i) == 0.0
    assert not scene.cyl_on.any() and not scene.tex_rot.any()


def _empty_room(rng):
    """A v1 scene stripped to the bare room (no furniture)."""
    f32 = np.float32
    s = synth.sample_scene(rng)
    return s._replace(
        room_lo=np.array([-2, -2, -1.5], f32),
        room_hi=np.array([2, 2, 1.5], f32),
        sph_on=np.zeros_like(s.sph_on), box_on=np.zeros_like(s.box_on))


def test_room_union_doorway():
    """A ray through the attached room's cross-section continues to the far
    wall; a ray missing the doorway stops at room 1's wall (analytic)."""
    f32 = np.float32
    s = _empty_room(np.random.RandomState(2))
    s = s._replace(room2_lo=np.array([1.8, -0.5, -1.5], f32),
                   room2_hi=np.array([5.0, 0.5, 1.2], f32),
                   room2_on=f32(1.0))
    d_through = jnp.asarray(np.array([1, 0, 0], f32))
    _, dep = synth._render_dirs(_dev(s), d_through)
    np.testing.assert_allclose(float(dep), 5.0 * synth.METERS_TO_01,
                               rtol=1e-5)
    # same ray with the doorway shifted off-axis: stops at room 1's wall
    s_miss = s._replace(room2_lo=np.array([1.8, 0.3, -1.5], f32),
                        room2_hi=np.array([5.0, 0.9, 1.2], f32))
    _, dep = synth._render_dirs(_dev(s_miss), d_through)
    np.testing.assert_allclose(float(dep), 2.0 * synth.METERS_TO_01,
                               rtol=1e-5)
    # room2_on=0 must gate the identical geometry back to room 1's wall
    _, dep = synth._render_dirs(_dev(s._replace(room2_on=f32(0.0))),
                                d_through)
    np.testing.assert_allclose(float(dep), 2.0 * synth.METERS_TO_01,
                               rtol=1e-5)


def test_cylinder_side_and_cap():
    """Analytic cylinder hits: side at t = |c|-r along +x; cap entry through
    the z slab at the slab-crossing distance."""
    f32 = np.float32
    s = _empty_room(np.random.RandomState(2))
    cyl_c = np.zeros((synth.MAX_CYLS, 2), f32)
    cyl_r = np.full(synth.MAX_CYLS, 0.05, f32)
    cyl_z = np.tile(np.array([0.0, 0.1], f32), (synth.MAX_CYLS, 1))
    cyl_on = np.zeros(synth.MAX_CYLS, f32)
    cyl_c[0] = (1.0, 0.0)
    cyl_r[0] = 0.6
    cyl_z[0] = (-1.5, -0.5)
    cyl_on[0] = 1.0
    s = s._replace(cyl_c=cyl_c, cyl_r=cyl_r, cyl_z=cyl_z, cyl_on=cyl_on)
    # side hit: horizontal ray at z=0 passes over (slab z < 0) -> room wall
    d = jnp.asarray(np.array([1, 0, 0], f32))
    _, dep = synth._render_dirs(_dev(s), d)
    np.testing.assert_allclose(float(dep), 2.0 * synth.METERS_TO_01,
                               rtol=1e-5)
    # side hit within the slab: steep enough that the xy-distance-0.4 point
    # sits at z = -0.56 (inside the slab), while the z=-0.5 cap crossing is
    # at xy distance 0.643 > r (cap miss) -> first valid hit is the side
    d = np.array([1, 0, -1.4], f32)
    d = jnp.asarray(d / np.linalg.norm(d))
    _, dep = synth._render_dirs(_dev(s), d)
    # side at xy distance 0.4 -> t = 0.4 / d_x
    t_expect = 0.4 / float(np.asarray(d)[0])
    np.testing.assert_allclose(float(dep), t_expect * synth.METERS_TO_01,
                               rtol=1e-4)
    # cap entry: ray toward the axis point on the top-cap plane
    d = np.array([1, 0, -0.5], f32)
    d = jnp.asarray(d / np.linalg.norm(d))
    _, dep = synth._render_dirs(_dev(s), d)
    np.testing.assert_allclose(float(dep),
                               np.sqrt(1.25) * synth.METERS_TO_01, rtol=1e-4)


def test_v2_render_valid_over_seeds():
    """v2 scenes render finite, in-range RGB and bounded depth, poles
    included, across seeds (exercises rooms-union, cylinders, light)."""
    render = jax.jit(lambda s: synth.render_pano(s, 64))
    for seed in range(6):
        scene = synth.sample_scene(np.random.RandomState(2000 + seed), "v2")
        rgb, dep = render(_dev(scene))
        rgb, dep = np.asarray(rgb), np.asarray(dep)
        assert np.isfinite(rgb).all() and np.isfinite(dep).all()
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        assert dep.min() > 1e-3 and dep.max() < 1.0


def test_v1_fast_path_matches_full():
    """render with v2=False (static skip of the v2 feature blocks) on v1
    scenes: depth bit-identical, rgb within 2 ulps (the skipped blocks are
    exact no-ops, but XLA's fma contraction differs between the two jit
    graphs) — it's the fast path synth_batches/evaluate use when the whole
    stream is known v1."""
    rng = np.random.RandomState(5)
    for _ in range(3):
        scene = _dev(synth.sample_scene(rng))
        full = jax.jit(lambda s: synth.render_pano(s, 96))(scene)
        fast = jax.jit(lambda s: synth.render_pano(s, 96, v2=False))(scene)
        np.testing.assert_array_equal(np.asarray(full[1]),
                                      np.asarray(fast[1]))
        np.testing.assert_allclose(np.asarray(full[0]),
                                   np.asarray(fast[0]), rtol=0, atol=1e-6)


def test_v2_sampler_invariants():
    """Placement must never break the documented invariants: objects keep
    >= 0.45 m camera clearance (no camera-inside-object scenes), cylinder
    centers satisfy |c_xy| > r (the renderer's near-vertical-ray
    assumption), and room 2's cross-section stays inside room 1's face
    (doorway-only opening, no slot windows)."""
    for seed in range(300):
        s = synth.sample_scene(np.random.RandomState(seed), "v2")
        for on, c, r in zip(s.sph_on, s.sph_c, s.sph_r):
            if on:
                assert np.linalg.norm(c) > r + 0.44
        for on, lo, hi in zip(s.box_on, s.box_lo, s.box_hi):
            if on:  # camera (origin) strictly outside every active box
                assert (lo > 0).any() or (hi < 0).any()
        for on, c, r in zip(s.cyl_on, s.cyl_c, s.cyl_r):
            if on:
                assert np.linalg.norm(c) > r + 0.44
        if s.room2_on:
            assert s.room2_hi[2] <= s.room_hi[2] + 1e-6
            inside = [(s.room2_lo[a] >= s.room_lo[a] - 1e-6
                       and s.room2_hi[a] <= s.room_hi[a] + 1e-6)
                      for a in (0, 1)]
            assert sum(inside) >= 1  # the non-attach axis is clamped


def test_synth_batches_v2_and_mix():
    a = next(synth.synth_batches(2, "pano", pano_width=64, seed=9,
                                 version="v2"))
    b = next(synth.synth_batches(2, "pano", pano_width=64, seed=9,
                                 version="v2"))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    v1 = next(synth.synth_batches(2, "pano", pano_width=64, seed=9))
    assert not np.array_equal(np.asarray(a[0]), np.asarray(v1[0]))
    m = next(synth.synth_batches(2, "pano", pano_width=64, seed=9,
                                 version="mix"))
    assert np.asarray(m[0]).shape == (2, 32, 64, 3)
