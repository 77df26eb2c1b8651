"""Multiresolution Laplacian (gradient-domain) fusion, dense TPU formulation.

The reference's ``SolveDepthAll`` (Depth.cpp:1416-1771) builds, per pyramid
level, a per-pixel ``std::map``-backed Laplacian window by walking every
view's bounding box and accumulating 4-neighbor masks under ``omp critical``,
then runs Jacobi-style relaxation over the pixels.  Because every view
contributes the *same* 5-point stencil shape, the accumulate-then-renormalize
dance (Depth.cpp:1564-1647) is exactly equivalent to:

    target(p)  = mean over covering views v of  lap4(V_v)(p)
    update(p)  = B(p) + (target(p) - lap4(B)(p)) * step     (covered p only)

where ``V_v`` is view v's depth resampled onto the equirect grid via the
inverse gnomonic map and ``lap4(I) = I - 0.25 * (left+right+up+down)``.
Pixels covered by no view keep their value (their windows are empty, so the
reference's update degenerates to the identity).  That turns the scalar
map-of-maps hot loop into dense 5-point stencils + a ``fori_loop`` — the
natural shape for the TPU VPU, with XLA fusing the whole iteration body.

Faithfully preserved reference quirks:

* bounding boxes use C ``round`` (half away from zero) on (width-1)/(height-1)
  scaled range endpoints (Depth.cpp:1498-1501);
* the x walk runs from x0 toward x1 with step +-1 and **excludes x1**
  (``X += xs; if (X == x1) break;`` — Depth.cpp:1566-1623);
* rows are clamped strictly inside the zenith band: y0 >= height0+1,
  y1 <= height1-1 (Depth.cpp:1558-1562);
* level-0 rows outside [height0, height1] are zeroed (Depth.cpp:1444-1464);
* iteration schedule 200/100/50 (or 200/150/100/50 at >=4096 wide), step 0.5,
  regularization 1e-4 toward the previous value, clamp to [0,1]
  (Depth.cpp:1649-1717);
* the final buffer is quantized by C-cast truncation ``(ushort)(v * 65535)``
  (Depth.cpp:1734).

Azimuth-seam semantics (PARITY.md quirk #19): when a Jacobi stencil tap
falls off the left/right image edge, the reference's flat row-major indexing
wraps into the *adjacent row's* opposite edge (a benign C++ out-of-bounds
read that the production layouts actually exercise) — reproduced exactly by
:func:`lap4_refwrap`; ring-tap azimuths at x = -1/width likewise come from
the raw column index, not a mod-w wrap.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .config import MergeConfig
from .ops.sampling import (as01_post, sample_equirect_nearest,
                           sample_unit_nearest)

TWO_PI = 2.0 * np.pi


from .config import _cround  # C round(): half away from zero


def view_bbox(rng, width, height, height0, height1) -> Tuple[int, int, int, int]:
    """Inclusive pixel-column/row bounds of one view's fusion footprint.

    Returns (x_lo, x_hi, y_lo, y_hi), all inclusive, after reproducing the
    reference's walk semantics (x1 endpoint excluded, rows clamped strictly
    inside the zenith band).  Empty footprints return y_lo > y_hi.
    """
    r0, r1, rz0, rz1 = rng
    x0 = _cround(r0 / TWO_PI * (width - 1))
    x1 = _cround(r1 / TWO_PI * (width - 1))
    y0 = _cround(rz0 / np.pi * (height - 1))
    y1 = _cround(rz1 / np.pi * (height - 1))
    xs = 1 if x1 >= x0 else -1
    # clamp into the image (reference Depth.cpp:1524-1556 with enlarge=0)
    x0 = min(max(x0, 0), width - 1)
    x1 = min(max(x1, 0), width - 1)
    y0 = max(y0, height0 + 1)
    y1 = min(y1, height1 - 1)
    if x0 == x1:  # unreachable for MergeConfig-validated layouts
        raise ValueError(
            "degenerate azimuth footprint (single pixel column; the "
            "reference's bbox walk would loop forever) — "
            "config.validate_layout should have rejected this layout")
    # x walk covers [x0, x1) in steps of xs -> inclusive interval:
    x_lo, x_hi = (x0, x1 - 1) if xs == 1 else (x1 + 1, x0)
    return x_lo, x_hi, y0, y1


@dataclasses.dataclass(frozen=True)
class LevelPlan:
    width: int
    height: int
    height0: int
    height1: int
    iterations: int
    bboxes: Tuple[Tuple[int, int, int, int], ...]  # per view, inclusive
    inv_cov: np.ndarray   # (H, W) f32: 1/#covering views (0 where uncovered)


@dataclasses.dataclass(frozen=True)
class FusionPlan:
    """Host-precomputed static data for the whole pyramid (cacheable)."""

    cfg: MergeConfig
    levels: Tuple[LevelPlan, ...]
    windows: geometry.Window  # stacked per-view window constants (f32)


@functools.lru_cache(maxsize=8)
def build_fusion_plan(cfg: MergeConfig) -> FusionPlan:
    ranges = cfg.clamped_ranges()
    schedule = cfg.schedule
    n_levels = len(schedule)
    zr0, zr1 = cfg.zenith_range

    levels: List[LevelPlan] = []
    for level in range(n_levels):
        width = cfg.out_width // (2 ** (n_levels - 1 - level))
        height = cfg.out_height // (2 ** (n_levels - 1 - level))
        height0 = int(np.floor(height * zr0 / np.pi))
        height1 = int(np.ceil(height * zr1 / np.pi))
        bboxes = tuple(
            view_bbox(ranges[v], width, height, height0, height1)
            for v in range(ranges.shape[0])
        )
        cov = np.zeros((height, width), np.int32)
        for x_lo, x_hi, y_lo, y_hi in bboxes:
            if y_lo <= y_hi:
                cov[y_lo : y_hi + 1, x_lo : x_hi + 1] += 1
        inv_cov = np.where(cov > 0, 1.0 / np.maximum(cov, 1), 0.0).astype(np.float32)
        levels.append(
            LevelPlan(width, height, height0, height1, schedule[level],
                      bboxes, inv_cov)
        )

    win = geometry.layout_windows(cfg.layout.fovs)
    win32 = geometry.Window(*(np.asarray(a, np.float32) for a in win))
    return FusionPlan(cfg=cfg, levels=levels, windows=win32)


def _pixel_coords(width: int, height: int):
    """Spherical coords of every equirect pixel (reference Depth.cpp:1591)."""
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    azi = x / (width - 1) * TWO_PI
    zen = y / (height - 1) * np.pi
    return azi, zen


@functools.lru_cache(maxsize=64)
def _view_gather_indices(cfg: MergeConfig, lvl_idx: int, view: int,
                         pmap_shape: Tuple[int, int]):
    """Static flat gather indices for one view's bbox+ring slab at a level.

    All geometry here is static (config + shapes), so the whole
    equirect-pixel -> gnomonic -> pmap-pixel chain is precomputed on the
    host in float64 and baked into the graph as an int32 index table; at
    runtime the view resampling is a single flat ``take``.  The slab extends
    the bbox by one ring so the 5-point target Laplacian of the interior is
    exact; ring columns wrap modulo the image width (azimuth seam).
    """
    plan = build_fusion_plan(cfg)
    lvl = plan.levels[lvl_idx]
    x_lo, x_hi, y_lo, y_hi = lvl.bboxes[view]
    if y_lo > y_hi:
        return None
    w, h = lvl.width, lvl.height
    ph, pw = pmap_shape
    # ring columns may be -1 or w: the reference computes their azimuth
    # directly as xx/(width-1)*2pi (Depth.cpp:1591) — periodic in the
    # trig, NOT equal to the mod-w column's azimuth — so keep them raw
    xs = np.arange(x_lo - 1, x_hi + 2, dtype=np.int64)
    ys = np.arange(y_lo - 1, y_hi + 2, dtype=np.int64)  # rows never clip
    azi = xs.astype(np.float64) / (w - 1) * TWO_PI
    zen = ys.astype(np.float64) / (h - 1) * np.pi
    ag, zg = np.meshgrid(azi, zen)
    win = geometry.layout_windows(cfg.layout.fovs)
    win_v = jax.tree.map(lambda a: a[view], win)
    x, y = geometry.spherical_to_xy(win_v, ag, zg, xp=np)
    pxi = np.clip((np.clip(x, 0, 1) * (pw - 1)).astype(np.int64), 0, pw - 1)
    pyi = np.clip((np.clip(y, 0, 1) * (ph - 1)).astype(np.int64), 0, ph - 1)
    return (pyi * pw + pxi).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _level0_gather_indices(cfg: MergeConfig, emap_shape: Tuple[int, int]):
    """Static flat indices for the level-0 baseline resample (f64 host)."""
    plan = build_fusion_plan(cfg)
    lvl = plan.levels[0]
    he, we = emap_shape
    x = np.arange(lvl.width, dtype=np.float64) / (lvl.width - 1) * TWO_PI
    y = np.arange(lvl.height, dtype=np.float64) / (lvl.height - 1) * np.pi
    xi = np.clip((x / TWO_PI * (we - 1)).astype(np.int64), 0, we - 1)
    yi = np.clip((y / np.pi * (he - 1)).astype(np.int64), 0, he - 1)
    return (yi[:, None] * we + xi[None, :]).astype(np.int32)


def lap4(img):
    """5-point Laplacian: center - 0.25*(left+right+up+down), x wraps."""
    return img - 0.25 * (
        jnp.roll(img, 1, axis=1) + jnp.roll(img, -1, axis=1)
        + jnp.roll(img, 1, axis=0) + jnp.roll(img, -1, axis=0)
    )


def lap4_refwrap(img):
    """5-point Laplacian with the reference's flat-index seam semantics.

    The reference reads stencil taps as ``buffer[yy * width + xx]`` with a
    flat index (Depth.cpp:1696-1701), so a tap at xx = -1 lands on the
    *previous* row's last pixel and xx = width on the *next* row's first
    pixel.  Reproduced here so fused outputs match the reference bit-for-bit
    at the azimuth seam (the 5-fold layouts cover the easternmost column).
    """
    w = img.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, img.shape, img.ndim - 1)
    left = jnp.roll(img, 1, axis=-1)
    left = jnp.where(col == 0, jnp.roll(left, 1, axis=-2), left)
    right = jnp.roll(img, -1, axis=-1)
    right = jnp.where(col == w - 1, jnp.roll(right, -1, axis=-2), right)
    return img - 0.25 * (
        left + right + jnp.roll(img, 1, axis=-2) + jnp.roll(img, -1, axis=-2)
    )


def resample_view(pmap, window: geometry.Window, width: int, height: int):
    """View depth resampled onto the full equirect grid (nearest, like ref)."""
    azi, zen = _pixel_coords(width, height)
    x, y = geometry.spherical_to_xy(window, azi, zen, xp=jnp)
    return sample_unit_nearest(pmap, x, y)


def level_target(pmaps, plan: FusionPlan, lvl_idx: int, abcd=None):
    """Mean target-Laplacian image + covered mask for one pyramid level.

    Equivalent to the reference's mask build + renormalization
    (Depth.cpp:1487-1647): per view, the target at a covered pixel is the
    4-neighbor Laplacian of the view's reprojected depth; overlaps average.
    Each view only touches its static bbox slab (one flat gather + a local
    stencil + a static slice-add), not the full panorama.

    With ``abcd`` (V, 4) given, the per-view cubic registration remap
    (Depth2DepthTransform) is applied to the gathered slab values instead of
    to the full perspective maps — pointwise transform and gather commute,
    and the slabs are ~10x smaller than the maps.
    """
    from .registration import apply_cubic

    cfg = plan.cfg
    lvl = plan.levels[lvl_idx]
    h, w = lvl.height, lvl.width
    tgt_sum = jnp.zeros((h, w), jnp.float32)
    for v, (x_lo, x_hi, y_lo, y_hi) in enumerate(lvl.bboxes):
        # pmaps may be a stacked (V, Hp, Wp) array or a list of per-view
        # maps with heterogeneous shapes (the on-device e2e path)
        idx = _view_gather_indices(cfg, lvl_idx, v,
                                   tuple(pmaps[v].shape[-2:]))
        if idx is None:
            continue
        slab = as01_post(jnp.take(pmaps[v].reshape(-1), jnp.asarray(idx)))
        if abcd is not None:
            slab = apply_cubic(slab, abcd[v])
        lap = slab[1:-1, 1:-1] - 0.25 * (
            slab[1:-1, :-2] + slab[1:-1, 2:] + slab[:-2, 1:-1] + slab[2:, 1:-1]
        )
        tgt_sum = tgt_sum.at[y_lo : y_hi + 1, x_lo : x_hi + 1].add(lap)
    inv_cov = jnp.asarray(lvl.inv_cov)
    return tgt_sum * inv_cov, inv_cov > 0


def init_level0(emap, lvl: LevelPlan, cfg: MergeConfig = None):
    """Level-0 buffer from the baseline emap (Depth.cpp:1441-1465).

    When ``cfg`` is given the nearest-resample indices are precomputed on
    the host in float64 (exact pixel-boundary behavior, no runtime trig).
    """
    emap2d = emap if emap.ndim == 2 else emap[..., 0]
    if cfg is not None:
        idx = _level0_gather_indices(cfg, tuple(emap2d.shape))
        vals = as01_post(jnp.take(emap2d.reshape(-1), jnp.asarray(idx)))
    else:
        azi, zen = _pixel_coords(lvl.width, lvl.height)
        vals = as01_post(sample_equirect_nearest(emap2d, azi, zen))
    yg = jax.lax.broadcasted_iota(jnp.int32, (lvl.height, lvl.width), 0)
    in_band = (yg >= lvl.height0) & (yg <= lvl.height1)
    return jnp.where(in_band, vals, 0.0).astype(jnp.float32)


def upsample2x(buf):
    """Nearest 2x upsample (Depth.cpp:1466-1485: prev[y/2, x/2])."""
    return jnp.repeat(jnp.repeat(buf, 2, axis=0), 2, axis=1)


def jacobi(buf, target, covered, iterations, step, reg):
    """Jacobi relaxation toward the target Laplacian (Depth.cpp:1680-1717)."""
    one_minus_reg = 1.0 - reg

    def body(_, B):
        upd = B + (target - lap4_refwrap(B)) * step
        upd = upd * one_minus_reg + B * reg
        upd = jnp.clip(upd, 0.0, 1.0)
        return jnp.where(covered, upd, B)

    return jax.lax.fori_loop(0, iterations, body, buf)


def fuse(emap, pmaps, plan: FusionPlan, jacobi_fn=None, abcd=None):
    """Full multiresolution fusion.  Returns (u16 panorama, final f32 buffer).

    ``emap``  — baseline equirect depth (He, We[, C]), 0~1 floats.
    ``pmaps`` — (V, Hp, Wp) perspective depths (or a list of V per-view
    maps with heterogeneous shapes), 0~1 floats: already registered, or raw
    with the per-view cubic ``abcd`` (V, 4) supplied (the remap is then
    fused into the slab gathers).
    ``jacobi_fn`` — optional replacement relaxation kernel with the same
    signature as :func:`jacobi` (e.g. the Pallas fused-iteration kernel).
    """
    cfg = plan.cfg
    relax = jacobi_fn or jacobi
    buf = None
    for i, lvl in enumerate(plan.levels):
        buf = init_level0(emap, lvl, cfg) if i == 0 else upsample2x(buf)
        target, covered = level_target(pmaps, plan, i, abcd=abcd)
        buf = relax(buf, target, covered, lvl.iterations,
                    cfg.jacobi_step, cfg.jacobi_reg)
    out = (jnp.clip(buf, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
    return out, buf


def solve_depth_by_smoothing(pmaps, plan: FusionPlan, iterations: int = 500,
                             smooth_range: int = 10):
    """Alternative trivial fusion: paste views, smooth their seams.

    Ports ``SolveDepthBySmoothing`` (reference Depth.cpp:1773-1878, the
    disabled alternative at Depth.cpp:919-922): each view's values are
    written into its bbox (later views overwrite earlier on overlap), pixels
    within ``smooth_range`` of any bbox edge are relaxed toward their
    4-neighbor average for ``iterations`` rounds, and the result is
    u16-quantized.  Deviation: the reference's in-place scan is Gauss-Seidel;
    this dense version is Jacobi (the path is disabled in the reference, so
    there is no behavior to match bit-for-bit).
    """
    lvl = plan.levels[-1]
    lvl_idx = len(plan.levels) - 1
    h, w = lvl.height, lvl.width
    buf = jnp.zeros((h, w), jnp.float32)
    smooth = np.zeros((h, w), bool)
    for v, (x_lo, x_hi, y_lo_band, _) in enumerate(lvl.bboxes):
        pmap_shape = tuple(pmaps[v].shape[-2:])
        # SolveDepthBySmoothing walks the UNCLAMPED y range (no zenith-band
        # clamp, Depth.cpp:1797-1813); recompute it from the raw ranges.
        rng = plan.cfg.clamped_ranges()[v]
        y0 = _cround(rng[2] / np.pi * (h - 1))
        y1 = _cround(rng[3] / np.pi * (h - 1))
        idx = _view_gather_indices(plan.cfg, lvl_idx, v, pmap_shape)
        if idx is None:
            continue
        slab = as01_post(jnp.take(pmaps[v].reshape(-1), jnp.asarray(idx)))
        # slab covers [y_lo_band-1, ...]; re-gather the unclamped rows
        xs = np.arange(x_lo, x_hi + 1)
        ys = np.arange(max(y0, 0), min(y1, h - 1) + 1)
        win = geometry.layout_windows(plan.cfg.layout.fovs)
        win_v = jax.tree.map(lambda a: a[v], win)
        azi = xs.astype(np.float64) / (w - 1) * TWO_PI
        zen = ys.astype(np.float64) / (h - 1) * np.pi
        ag, zg = np.meshgrid(azi, zen)
        px, py = geometry.spherical_to_xy(win_v, ag, zg, xp=np)
        ph, pw = pmap_shape
        pxi = np.clip((np.clip(px, 0, 1) * (pw - 1)).astype(np.int64), 0,
                      pw - 1)
        pyi = np.clip((np.clip(py, 0, 1) * (ph - 1)).astype(np.int64), 0,
                      ph - 1)
        vals = as01_post(jnp.take(
            pmaps[v].reshape(-1),
            jnp.asarray((pyi * pw + pxi).astype(np.int32))))
        buf = buf.at[ys[0] : ys[-1] + 1, x_lo : x_hi + 1].set(vals)
        near = np.zeros((h, w), bool)
        near[ys[0] : ys[-1] + 1, x_lo : x_hi + 1] = True
        interior = np.zeros((h, w), bool)
        iy0, iy1 = ys[0] + smooth_range + 1, ys[-1] - smooth_range
        ix0, ix1 = x_lo + smooth_range + 1, x_hi - smooth_range
        if iy1 > iy0 and ix1 > ix0:
            interior[iy0:iy1, ix0:ix1] = True
        smooth |= near & ~interior
    band = np.zeros((h, w), bool)
    band[lvl.height0 : lvl.height1 + 1, 1 : w - 1] = True
    smooth_m = jnp.asarray(smooth & band)

    def body(_, B):
        avg = 0.25 * (jnp.roll(B, 1, 1) + jnp.roll(B, -1, 1)
                      + jnp.roll(B, 1, 0) + jnp.roll(B, -1, 0))
        return jnp.where(smooth_m, B + 0.5 * (avg - B), B)

    buf = jax.lax.fori_loop(0, iterations, body, buf)
    return (jnp.clip(buf, 0.0, 1.0) * 65535.0).astype(jnp.uint16), buf
