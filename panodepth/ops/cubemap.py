"""Cubemap <-> equirectangular projections (for the panoramic model family).

The reference ships a disabled true-cubemap FBO path (``CreateCubeMap``,
reference ``Main.cpp:87-219``) and a cubemap-sampling shader
(``shaders/fs_equirectangular.txt``); its baseline networks
(UniFuse/BiFuse-class) are external.  The on-TPU panoramic baseline model
needs differentiable cubemap projections, implemented here as pure gathers.

Face order and orientation follow the common +x,-x,+y,-y,+z,-z convention in
the reference's z-up world frame (azimuth from +x toward +y, zenith from +z;
``Depth.cpp:2955-2971``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sampling import sample_equirect_bilinear, sample_equirect_nearest_mc

TWO_PI = 2.0 * np.pi

# face -> (forward, right, down) axes in the z-up world frame
_FACES = np.array(
    [
        # forward        right           down
        [[1, 0, 0], [0, 1, 0], [0, 0, -1]],   # +x
        [[-1, 0, 0], [0, -1, 0], [0, 0, -1]],  # -x
        [[0, 1, 0], [-1, 0, 0], [0, 0, -1]],   # +y
        [[0, -1, 0], [1, 0, 0], [0, 0, -1]],   # -y
        [[0, 0, 1], [0, 1, 0], [1, 0, 0]],     # +z (up)
        [[0, 0, -1], [0, 1, 0], [-1, 0, 0]],   # -z (down)
    ],
    np.float32,
)


def _face_dirs(face_size: int) -> np.ndarray:
    """(6, S, S, 3) unit ray directions through each face pixel center."""
    t = (np.arange(face_size, dtype=np.float32) + 0.5) / face_size * 2 - 1
    u, v = np.meshgrid(t, t)  # u: right, v: down
    dirs = []
    for fwd, right, down in _FACES:
        d = (fwd[None, None] + u[..., None] * right[None, None]
             + v[..., None] * down[None, None])
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dirs.append(d)
    return np.stack(dirs)


def equirect_to_cubemap(img, face_size: int, taps: str = "bilinear"):
    """Equirect (H, W, C) -> (6, S, S, C) cube faces.

    ``taps="nearest"`` gathers ONE tap per output pixel instead of four —
    the TPU fast path for *feature-map* projection, where gather cost
    (proportional to gathered bytes, PERF.md) dominates these nets and
    sub-pixel interpolation of learned features is not load-bearing
    (adjudicated by the bifuse fast-proj proof).  Images keep bilinear.
    """
    dirs = jnp.asarray(_face_dirs(face_size))
    azi = jnp.arctan2(dirs[..., 1], dirs[..., 0]) % TWO_PI
    zen = jnp.arccos(jnp.clip(dirs[..., 2], -1.0, 1.0))
    sampler = (sample_equirect_nearest_mc if taps == "nearest"
               else sample_equirect_bilinear)
    return jax.vmap(lambda a, z: sampler(img, a, z))(azi, zen)


def _cube_lookup(out_h: int, out_w: int, face_size: int):
    """Static gather tables: equirect pixel -> (face, iy, ix) + bilinear w.

    Returns int/float numpy arrays so the lookup bakes into the graph.
    """
    x = (np.arange(out_w, dtype=np.float64) + 0.5) / out_w * TWO_PI
    y = (np.arange(out_h, dtype=np.float64) + 0.5) / out_h * np.pi
    azi, zen = np.meshgrid(x, y)
    d = np.stack(
        [np.sin(zen) * np.cos(azi), np.sin(zen) * np.sin(azi), np.cos(zen)],
        axis=-1,
    )
    # pick the face with the largest |projection on forward|
    fwd = _FACES[:, 0]  # (6, 3)
    proj = np.einsum("hwc,fc->hwf", d, fwd)
    face = np.argmax(proj, axis=-1)
    pf = np.take_along_axis(proj, face[..., None], axis=-1)[..., 0]
    dn = d / pf[..., None]  # scale so forward component == 1
    right = _FACES[:, 1][face]
    down = _FACES[:, 2][face]
    u = np.einsum("hwc,hwc->hw", dn, right)   # in [-1, 1]
    v = np.einsum("hwc,hwc->hw", dn, down)
    fx = (u + 1) / 2 * face_size - 0.5
    fy = (v + 1) / 2 * face_size - 0.5
    x0 = np.clip(np.floor(fx).astype(np.int32), 0, face_size - 1)
    y0 = np.clip(np.floor(fy).astype(np.int32), 0, face_size - 1)
    x1 = np.minimum(x0 + 1, face_size - 1)
    y1 = np.minimum(y0 + 1, face_size - 1)
    wx = (fx - x0).astype(np.float32).clip(0, 1)
    wy = (fy - y0).astype(np.float32).clip(0, 1)
    return face.astype(np.int32), y0, x0, y1, x1, wx, wy


def cubemap_to_equirect(faces, out_h: int, out_w: int,
                        taps: str = "bilinear"):
    """(6, S, S, C) cube faces -> equirect (out_h, out_w, C).

    Bilinear taps clamp at face edges (no cross-face blending); the one-pixel
    seam error is negligible for feature maps.  ``taps="nearest"`` gathers
    one tap instead of four (see :func:`equirect_to_cubemap`).
    """
    s = faces.shape[1]
    face, y0, x0, y1, x1, wx, wy = _cube_lookup(out_h, out_w, s)
    if taps == "nearest":
        yn = np.where(wy >= 0.5, y1, y0)
        xn = np.where(wx >= 0.5, x1, x0)
        return faces[face, yn, xn]
    wx = jnp.asarray(wx)[..., None]
    wy = jnp.asarray(wy)[..., None]
    g = lambda yy, xx: faces[face, yy, xx]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy
