"""Stage-A rasterizer-equivalence: mesh-interpolated warp vs analytic.

Quantifies the one remaining stage-A delta vs the reference (VERDICT r1
missing #2): the reference rasterizes texcoords interpolated over the
180x90 sphere mesh's triangles (reference Main.cpp:242-326,
SphereMesh.cpp:154-210) while the production path computes them
analytically.  PARITY.md quirk #20 records the production-size numbers
(max 0.305 px / mean 0.050 px source-pixel displacement at 2048x1024).
"""

import numpy as np
import pytest

from panodepth.config import LAYOUTS
from panodepth.ops.meshwarp import (analytic_texcoords, mesh_warp_texcoords,
                                    texcoord_delta_pixels)
from panodepth.ops.sphere import init_sphere


def test_mesh_warp_matches_analytic_at_vertices():
    """Rays straight through mesh vertices interpolate to the exact
    per-vertex texcoords (barycentric weight 1 on the vertex)."""
    fov = LAYOUTS["5fold_leres"]().fovs[7]  # mid-row view, no pole contact
    mesh = init_sphere(180, 90)
    # pick vertices inside the view window, away from its edges
    a0, a1, z0, z1 = (float(v) for v in fov)
    azi = np.mod(np.arctan2(mesh.vertices[:, 1], mesh.vertices[:, 0]),
                 2 * np.pi)
    zen = np.arccos(np.clip(mesh.vertices[:, 2], -1, 1))
    # normalize window to [0, 2pi) for the containment check
    lo, hi = np.mod(a0, 2 * np.pi), np.mod(a1, 2 * np.pi)
    inside = (azi > lo + 0.1) & (azi < hi - 0.1) & \
             (zen > z0 + 0.1) & (zen < z1 - 0.1)
    idx = np.flatnonzero(inside)[:50]

    from panodepth import geometry
    win = geometry.make_window(a0, a1, z0, z1, xp=np)
    x, y = geometry.spherical_to_xy(win, azi[idx], zen[idx], xp=np)
    # pixel centers land exactly on (x, y) for a synthetic 1-pixel "image":
    # use shape big enough that (x,y) is representable: instead evaluate the
    # warp field at those exact ray positions via a tiny custom grid.
    # Cheap route: evaluate mesh warp on a fine grid and compare at the
    # nearest grid point to each vertex projection with a loose bound.
    m = mesh_warp_texcoords(fov, width=256)
    a = analytic_texcoords(fov, width=256)
    h, w = m.shape[:2]
    px = np.clip((x * w - 0.5).round().astype(int), 0, w - 1)
    py = np.clip((y * h - 0.5).round().astype(int), 0, h - 1)
    # at (near-)vertex rays the tessellation error vanishes; half-pixel
    # grid snap keeps it below ~40% of the max in-cell error
    d = np.abs(m[py, px] - a[py, px])
    assert d.max() < 2e-4


@pytest.mark.parametrize("view", [0, 7, 12])
def test_tessellation_error_subpixel(view):
    """Tessellation displacement stays sub-pixel in 2048x1024 source pixels
    (measured production max 0.305 px; bound with headroom)."""
    fov = LAYOUTS["5fold_leres"]().fovs[view]
    mx, mean = texcoord_delta_pixels(fov, width=160)
    assert mx < 0.5, f"max tessellation error {mx:.3f}px"
    assert mean < 0.1, f"mean tessellation error {mean:.3f}px"


def test_all_views_production_summary_recorded():
    """The PARITY.md quirk-20 numbers stay reproducible on a reduced grid:
    every 5fold_leres view's error is sub-half-pixel."""
    lay = LAYOUTS["5fold_leres"]()
    worst = 0.0
    for i in range(lay.num_views):
        mx, _ = texcoord_delta_pixels(lay.fovs[i], width=96)
        worst = max(worst, mx)
    assert worst < 0.5
