"""Projection-math unit tests (SURVEY.md section 4 plan, item 1)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from panodepth import geometry
from panodepth.config import five_fold_leres

from reference_impl import RefPerspectiveMap, spherical_to_world, world_to_spherical

D2R = math.pi / 180.0


def test_spherical_world_roundtrip():
    rng = np.random.RandomState(1)
    azi = rng.uniform(0, 2 * math.pi, 256)
    zen = rng.uniform(1e-3, math.pi - 1e-3, 256)
    p = geometry.spherical_to_world(azi, zen)
    a2, z2 = geometry.world_to_spherical(p)
    np.testing.assert_allclose(a2, azi, atol=1e-12)
    np.testing.assert_allclose(z2, zen, atol=1e-12)


def test_matches_reference_scalar_math():
    rng = np.random.RandomState(2)
    for _ in range(50):
        azi = rng.uniform(0, 2 * math.pi)
        zen = rng.uniform(0.1, math.pi - 0.1)
        np.testing.assert_allclose(
            geometry.spherical_to_world(azi, zen),
            spherical_to_world(azi, zen), atol=1e-12)
        p = rng.randn(3)
        a, z = geometry.world_to_spherical(p[None])
        A, Z = world_to_spherical(p)
        np.testing.assert_allclose([a[0], z[0]], [A, Z], atol=1e-12)


def test_window_matches_reference():
    layout = five_fold_leres()
    wins = geometry.layout_windows(layout.fovs)
    for v in range(layout.num_views):
        ref = RefPerspectiveMap(np.zeros((4, 4)), layout.fovs[v],
                                layout.ranges[v])
        np.testing.assert_allclose(wins.corner0[v], ref.corner0, atol=1e-12)
        np.testing.assert_allclose(wins.hedge[v], ref.hedge, atol=1e-12)
        np.testing.assert_allclose(wins.vedge[v], ref.vedge, atol=1e-12)


def test_gnomonic_forward_inverse_consistency():
    layout = five_fold_leres()
    rng = np.random.RandomState(3)
    for v in [0, 7, 14]:
        win = geometry.make_window(*layout.fovs[v], xp=np)
        x = rng.uniform(0, 1, 128)
        y = rng.uniform(0, 1, 128)
        azi, zen = geometry.xy_to_spherical(win, x, y, xp=np)
        x2, y2 = geometry.spherical_to_xy(win, azi, zen, xp=np)
        np.testing.assert_allclose(x2, x, atol=1e-10)
        np.testing.assert_allclose(y2, y, atol=1e-10)


def test_gnomonic_matches_reference_impl():
    layout = five_fold_leres()
    rng = np.random.RandomState(4)
    for v in range(0, 15, 4):
        win = geometry.make_window(*layout.fovs[v], xp=np)
        ref = RefPerspectiveMap(np.zeros((4, 4)), layout.fovs[v],
                                layout.ranges[v])
        for _ in range(30):
            azi = rng.uniform(layout.ranges[v][1], layout.ranges[v][0]) \
                if layout.ranges[v][0] > layout.ranges[v][1] \
                else rng.uniform(layout.ranges[v][0], layout.ranges[v][1])
            zen = rng.uniform(layout.ranges[v][2], layout.ranges[v][3])
            x, y = geometry.spherical_to_xy(win, azi, zen, xp=np)
            X, Y = ref.spherical_to_2d(azi, zen)
            np.testing.assert_allclose([x, y], [X, Y], atol=1e-10)


def test_ranges_inside_windows():
    """Every layout's valid range must map into [0,1]^2 of its window."""
    from panodepth.config import LAYOUTS

    for name in ("5fold_leres", "5fold_midas", "4fold", "3fold"):
        layout = LAYOUTS[name]()
        for v in range(layout.num_views):
            win = geometry.make_window(*layout.fovs[v], xp=np)
            r0, r1, z0, z1 = layout.ranges[v]
            azi = np.linspace(min(r0, r1), max(r0, r1), 25)
            zen = np.linspace(max(z0, 26 * D2R), min(z1, 154 * D2R), 25)
            ag, zg = np.meshgrid(azi, zen)
            x, y = geometry.spherical_to_xy(win, ag, zg, xp=np)
            assert x.min() > -1e-6 and x.max() < 1 + 1e-6, name
            assert y.min() > -1e-6 and y.max() < 1 + 1e-6, name


def test_contains():
    layout = five_fold_leres()
    win = geometry.make_window(*layout.fovs[0], xp=np)
    center_a = (layout.fovs[0][0] + layout.fovs[0][1]) / 2
    center_z = (layout.fovs[0][2] + layout.fovs[0][3]) / 2
    assert geometry.contains(win, center_a, center_z)
    assert not geometry.contains(win, center_a + math.pi, center_z)


def test_window_coords():
    """Corner coords of a centered window (WindowCoords parity)."""
    center = (math.radians(90), math.radians(90))
    lu, ld, rd, ru = geometry.window_coords(center, math.radians(30),
                                            math.radians(20))
    # corners symmetric about the center azimuth
    assert abs((lu[0] + ru[0]) / 2 - center[0]) < 1e-9
    # left-up is west of right-up, up is above down
    assert lu[0] > ru[0] - 2 * math.pi  # azimuths ordered (left = larger azi
    assert lu[1] < ld[1]
    # consistency with the window construction itself
    win = geometry.make_window(center[0] - math.radians(30),
                               center[0] + math.radians(30),
                               center[1] - math.radians(20),
                               center[1] + math.radians(20), xp=np)
    a, z = geometry.world_to_spherical(np.asarray(win.corner0))
    np.testing.assert_allclose([lu[0], lu[1]], [a, z], atol=1e-12)
