"""Spherical / gnomonic projection geometry, as pure array math.

TPU-native reformulation of the reference's window geometry:

* ``spherical_to_world`` / ``world_to_spherical`` — reference
  ``Depth.cpp:2955-2971`` (z-up, zenith measured from the north pole).
* ``Window`` + ``make_window`` — the cached tangent-plane viewing window of
  ``PerspectiveMap::SetWindow`` (reference ``Depth.cpp:120-155``).
* ``spherical_to_xy`` — the inverse gnomonic map ray -> (x, y) in [0, 1]^2 on
  the window plane (``PerspectiveMap::SphericalTo2D``, ``Depth.cpp:168-182``).
* ``xy_to_spherical`` — forward map (``PerspectiveMap::ToSphericalCoord``,
  ``Depth.cpp:157-166``).

All functions are shape-polymorphic pure functions of arrays, usable from
numpy (host precompute) and jax.numpy (on-device, inside jit / vmap / pallas).
Window parameters are tiny per-view constants, computed once on the host in
float64 and baked into the compiled graph.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

TWO_PI = 2.0 * np.pi


def spherical_to_world(azimuth, zenith, xp=np):
    """(azi, zen) -> unit vector; z-up, zenith from the north pole.

    Mirrors reference Depth.cpp:2955-2958.  Returns an array with a trailing
    axis of size 3.
    """
    sz = xp.sin(zenith)
    return xp.stack(
        [sz * xp.cos(azimuth), sz * xp.sin(azimuth), xp.cos(zenith)], axis=-1
    )


def world_to_spherical(p, xp=np):
    """Unit-ish vector -> (azimuth in [0, 2pi), zenith in [0, pi]).

    Mirrors reference Depth.cpp:2960-2971 (fmod + wrap of atan2 azimuth;
    zenith via atan2(|xy|, z); input normalization is irrelevant to both
    atan2 forms so it is skipped).
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    azimuth = xp.arctan2(y, x) % TWO_PI
    zenith = xp.arctan2(xp.sqrt(x * x + y * y), z)
    return azimuth, zenith


class Window(NamedTuple):
    """Tangent-plane viewing window (per-view constants).

    ``corner0`` is the upper-left corner; ``hedge``/``vedge`` span the window
    left->right and top->bottom; ``middle`` is the unit view direction (also a
    point on the plane).  Mirrors the cached fields of
    ``PerspectiveMap::SetWindow`` (reference Depth.cpp:127-155).
    Each field has shape (..., 3) so a stack of windows batches naturally.
    """

    middle: np.ndarray
    corner0: np.ndarray
    hedge: np.ndarray
    vedge: np.ndarray


def make_window(azimuth_left, azimuth_right, zenith_top, zenith_down, xp=np):
    """Build the tangent-plane window for a viewing FOV (broadcastable)."""
    azimuth_left = xp.asarray(azimuth_left)
    middle = spherical_to_world(
        (azimuth_left + azimuth_right) / 2.0, (zenith_top + zenith_down) / 2.0, xp
    )
    up = xp.broadcast_to(xp.asarray([0.0, 0.0, 1.0], dtype=middle.dtype), middle.shape)
    left_dir = _normalize(xp.cross(up, middle), xp)
    up_dir = _normalize(xp.cross(left_dir, middle), xp)

    th = xp.tan(xp.abs(azimuth_right - azimuth_left) / 2.0)[..., None]
    tv = xp.tan(xp.abs(zenith_top - zenith_down) / 2.0)[..., None]
    left_middle = middle + left_dir * th
    right_middle = middle - left_dir * th
    up_middle = middle - up_dir * tv
    down_middle = middle + up_dir * tv

    corner0 = left_middle + up_middle - middle
    hedge = right_middle - left_middle
    vedge = down_middle - up_middle
    return Window(middle=middle, corner0=corner0, hedge=hedge, vedge=vedge)


def _normalize(v, xp):
    return v / xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True))


def _dot(a, b, xp):
    return xp.sum(a * b, axis=-1)


def spherical_to_xy(window: Window, azimuth, zenith, xp=np):
    """Inverse gnomonic: spherical coord -> (x, y) in the window, each in [0,1].

    The ray from the origin along (azi, zen) is intersected with the window
    plane (plane point = normal = ``middle``), then decomposed on the
    ``hedge``/``vedge`` axes.  Mirrors reference Depth.cpp:168-182 combined
    with LinePlaneIntersection (Depth.cpp:34-42).  Values outside [0, 1] mean
    the ray leaves the window (not clamped here).
    """
    d = spherical_to_world(azimuth, zenith, xp)
    # t = (middle . middle) / (dir . middle); pos = t * dir
    t = _dot(window.middle, window.middle, xp) / _dot(d, window.middle, xp)
    pos = d * t[..., None]
    e = pos - window.corner0
    x = _dot(e, window.hedge, xp) / _dot(window.hedge, window.hedge, xp)
    y = _dot(e, window.vedge, xp) / _dot(window.vedge, window.vedge, xp)
    return x, y


def xy_to_spherical(window: Window, x, y, xp=np):
    """Forward map: (x, y) in [0,1]^2 on the window -> (azimuth, zenith).

    Mirrors reference Depth.cpp:157-166.
    """
    pos = window.corner0 + window.hedge * xp.asarray(x)[..., None] \
        + window.vedge * xp.asarray(y)[..., None]
    return world_to_spherical(pos, xp)


def contains(window: Window, azimuth, zenith, threshold=1e-3, xp=np):
    """Whether rays fall inside the window (reference Depth.cpp:184-207)."""
    x, y = spherical_to_xy(window, azimuth, zenith, xp)
    return (
        (x >= -threshold) & (x <= 1 + threshold)
        & (y >= -threshold) & (y <= 1 + threshold)
    )


def window_coords(middle_coord, azi_half, zen_half):
    """Spherical coords of a window's 4 corners (WindowCoords parity).

    Given the window center (azi, zen) and half-FOVs, returns the corner
    coords (left-up, left-down, right-down, right-up), mirroring the debug
    utility at reference Depth.cpp:2973-3039 (minus its stdout dumps).
    """
    a0 = middle_coord[0] - azi_half
    a1 = middle_coord[0] + azi_half
    z0 = middle_coord[1] - zen_half
    z1 = middle_coord[1] + zen_half
    win = make_window(a0, a1, z0, z1, xp=np)
    c0 = win.corner0
    c1 = win.corner0 + win.vedge
    c2 = win.corner0 + win.hedge + win.vedge
    c3 = win.corner0 + win.hedge
    return tuple(world_to_spherical(np.asarray(c)) for c in (c0, c1, c2, c3))


def layout_windows(fovs: np.ndarray) -> Window:
    """Stack of windows for an (N, 4) FOV table, computed in float64."""
    f = np.asarray(fovs, np.float64)
    return make_window(f[:, 0], f[:, 1], f[:, 2], f[:, 3], xp=np)
