"""Stage A: equirectangular RGB -> perspective view extraction.

The reference renders a textured 180x90 lat-long sphere mesh through
``gluLookAt``/``gluPerspective`` per view and reads the framebuffer back
(reference ``Main.cpp:242-326``, ``SphereMesh.cpp``, ``shaders/vs.txt`` +
``fs_perspective_texcoord.txt``).  On TPU the rasterizer disappears: each
output pixel's ray is computed analytically on the view's tangent-plane
window and the equirect texture is gathered bilinearly — the exact math of
the unused ``shaders/fs_perspective.txt:67-73`` inverse path, with no mesh
tessellation error.

View geometry matches SaveCubeMap (Main.cpp:242-294): fovy = zenith span,
aspect = tan(fovx/2)/tan(fovy/2), up = +z, nominal viewport width 1024 and
height = round(width / aspect) (the reference additionally clamps to its
desktop window size; we keep the nominal resolution).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry
from ..config import ViewLayout
from .sampling import sample_equirect_bilinear


def view_shape(fov, width: int = 1024) -> Tuple[int, int]:
    """(height, width) of a view's output image (Main.cpp:250-272)."""
    a0, a1, z0, z1 = (float(v) for v in fov)
    fovx = abs(a1 - a0)
    fovy = abs(z1 - z0)
    if fovx >= math.pi or fovy >= math.pi:
        raise ValueError(
            f"perspective window FOV must be < 180 deg, got "
            f"({math.degrees(fovx):.1f}, {math.degrees(fovy):.1f})")
    aspect = math.tan(fovx / 2.0) / math.tan(fovy / 2.0)
    return int(round(width / aspect)), width


def extract_view(rgb, fov, width: int = 1024, shape: Tuple[int, int] = None,
                 sampler=None):
    """One perspective view from an equirect image (H, W[, C]) -> (h, w[, C]).

    Rays go through pixel centers ((i+0.5)/w on the window), matching GL
    rasterization sample positions.  ``fov`` may be a traced (4,) array if
    the static output ``shape`` is supplied.  ``sampler`` overrides the
    bilinear gather (e.g. :func:`..ops.sampling.
    sample_equirect_bilinear_packed` over a packed-u32 RGB table).
    """
    h, w = shape if shape is not None else view_shape(fov, width)
    win = geometry.make_window(fov[0], fov[1], fov[2], fov[3], xp=jnp)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xg, yg = jnp.meshgrid(xs, ys)
    azi, zen = geometry.xy_to_spherical(win, xg, yg, xp=jnp)
    return (sampler or sample_equirect_bilinear)(rgb, azi, zen)


def extract_views(rgb, layout: ViewLayout, width: int = 1024) -> List[jnp.ndarray]:
    """All views of a layout; same-shaped views are vmapped in one launch."""
    shapes = [view_shape(layout.fovs[i], width) for i in range(layout.num_views)]
    out: List[jnp.ndarray] = [None] * layout.num_views  # type: ignore

    groups = {}
    for i, s in enumerate(shapes):
        groups.setdefault(s, []).append(i)
    for shape, idxs in groups.items():
        fovs = jnp.asarray(np.stack([layout.fovs[i] for i in idxs]), jnp.float32)
        batched = jax.vmap(lambda f: extract_view(rgb, f, width, shape))(fovs)
        for j, i in enumerate(idxs):
            out[i] = batched[j]
    return out


def elevated_zenith(zenith, camera_height: float = 0.3,
                    fovy: float = math.radians(45)):
    """Camera-height zenith remap of ``shaders/fs_perspective_elevated.txt``.

    Translates viewing zeniths of a camera raised by ``camera_height`` on a
    unit sphere into the zeniths seen from the sphere center
    (fs_perspective_elevated.txt:29-38): with r = 1 - h, b = r cos(fovy),
    the ray height h' = b tan(pi/2 - zen) shifts by the camera height.
    """
    r = 1.0 - camera_height
    b = r * math.cos(fovy)
    h = b * jnp.tan(np.pi / 2 - zenith)
    return np.pi / 2 - jnp.arctan2(camera_height + h, b)


def extract_view_elevated(rgb, fov, width: int = 1024,
                          camera_height: float = 0.3,
                          fovy: float = math.radians(45)):
    """Perspective view from an elevated camera (the unused
    fs_perspective_elevated shader path): the zenith of every ray is remapped
    by :func:`elevated_zenith` before sampling."""
    h, w = view_shape(fov, width)
    win = geometry.make_window(fov[0], fov[1], fov[2], fov[3], xp=jnp)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xg, yg = jnp.meshgrid(xs, ys)
    azi, zen = geometry.xy_to_spherical(win, xg, yg, xp=jnp)
    return sample_equirect_bilinear(rgb, azi,
                                    elevated_zenith(zen, camera_height, fovy))


def depth_view_to_equirect(depth_view, fov, out_width: int, out_height: int):
    """Inverse direction: splat-free gather of a perspective depth map onto
    the equirect grid (used by debugging / visualization paths; fusion uses
    :func:`panodepth.fusion.resample_view`)."""
    win = geometry.make_window(*(jnp.float32(v) for v in fov), xp=jnp)
    xg = jax.lax.broadcasted_iota(jnp.float32, (out_height, out_width), 1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (out_height, out_width), 0)
    azi = xg / (out_width - 1) * (2 * np.pi)
    zen = yg / (out_height - 1) * np.pi
    x, y = geometry.spherical_to_xy(win, azi, zen, xp=jnp)
    inside = (x >= 0) & (x <= 1) & (y >= 0) & (y <= 1)
    from .sampling import sample_unit_nearest

    return jnp.where(inside, sample_unit_nearest(depth_view, x, y), 0.0), inside
