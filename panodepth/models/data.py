"""Training data pipeline for the on-TPU model families.

The reference has no training code (its CNNs are external); this module
provides the data side for ours.  Panoramic RGB + gt-depth pairs are
discovered with the same folder/naming conventions the batch driver uses
(reference ``Main.cpp:496-549``), and two batch shapes are produced:

* panoramic batches ``(rgb (B, H, W, 3), depth (B, H, W), valid (B, H, W))``
  for :class:`~panodepth.models.panoramic.PanoBaselineNet`;
* perspective batches: random viewing windows are sampled on the sphere and
  both the RGB and the gt depth are gathered through the same window
  (:mod:`panodepth.ops.projection` math), training
  :class:`~panodepth.models.perspective.PerspectiveDepthNet` exactly on the
  distribution stage A produces at inference.

Decoding runs on host threads (native prefetcher when built); batches are
assembled in numpy and shipped with ``jax.device_put``.
"""

from __future__ import annotations

import math
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .. import geometry
from .. import io as pio


def discover_pairs(rgb_folder: str, gt_folder: str,
                   dataset: str = "matterport") -> List[Tuple[str, str]]:
    """(rgb, gt) file pairs via the reference naming conventions."""
    pairs = []
    for f in pio.list_images(rgb_folder):
        gt = pio.gt_filename(gt_folder, pio.raw_name(f), dataset)
        if os.path.exists(gt):
            pairs.append((f, gt))
    return pairs


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = (np.arange(h) * (img.shape[0] / h)).astype(np.int64)
    xs = (np.arange(w) * (img.shape[1] / w)).astype(np.int64)
    return img[ys[:, None], xs[None, :]]


def _load_pair_chunk(chunk: List[Tuple[str, str]]
                     ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Decode a chunk of (rgb, gt) pairs, threaded through the native
    prefetcher for PNG inputs (python decoders otherwise)."""
    from ..utils import nativeio

    files = [f for pair in chunk for f in pair]
    if nativeio.batch_prefetch_wins() and all(
            f.lower().endswith(".png") for f in files):
        pf = nativeio.BatchPrefetcher(files, threads=8)
        try:
            imgs = [pf.get(i) for i in range(len(files))]
        finally:
            pf.close()
        if all(im is not None for im in imgs):
            return [(imgs[2 * i], imgs[2 * i + 1])
                    for i in range(len(chunk))]
    return [(pio.load_image01(r), pio.load_image01(g)) for r, g in chunk]


def _prefetched(items, fn):
    """Map ``fn`` over ``items`` with one-item lookahead on a background
    thread, so decoding batch k+1 overlaps the training step on batch k."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:
        fut = None
        for item in items:
            nxt = ex.submit(fn, item)
            if fut is not None:
                yield fut.result()
            fut = nxt
        if fut is not None:
            yield fut.result()


def _to_rgb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return np.stack([img] * 3, -1)
    return img[..., :3]


def augment_batch(rgb: np.ndarray, depth: np.ndarray, valid: np.ndarray,
                  rng: np.random.RandomState, pano: bool = False):
    """Geometry-correct training augmentation (per sample, in place-safe).

    * horizontal flip (p=0.5) — a mirrored scene is a valid scene, for
      both equirect panoramas and perspective crops;
    * ``pano``: random circular azimuth roll — an equirect panorama is
      periodic in azimuth, so any roll is the same scene from a rotated
      heading (the seam moves, content is identical);
    * photometric gain on RGB only (x0.8..1.2, clipped) — depth is
      invariant to exposure.

    The same spatial transform is applied to rgb/depth/valid; only the
    gain touches rgb.  New surface (the reference trains nothing).
    """
    rgb, depth, valid = rgb.copy(), depth.copy(), valid.copy()
    for i in range(rgb.shape[0]):
        if pano:
            s = int(rng.randint(rgb.shape[2]))
            rgb[i] = np.roll(rgb[i], s, axis=1)
            depth[i] = np.roll(depth[i], s, axis=1)
            valid[i] = np.roll(valid[i], s, axis=1)
        if rng.rand() < 0.5:
            rgb[i] = rgb[i][:, ::-1]
            depth[i] = depth[i][:, ::-1]
            valid[i] = valid[i][:, ::-1]
        rgb[i] = np.clip(rgb[i] * rng.uniform(0.8, 1.2), 0.0, 1.0)
    return rgb, depth, valid


def pano_batches(pairs: List[Tuple[str, str]], batch_size: int,
                 width: int = 512, shuffle: bool = True,
                 seed: int = 0, epochs: Optional[int] = None,
                 augment: bool = False
                 ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Panoramic (rgb, depth, valid) batches at (width/2, width)."""
    h, w = width // 2, width
    if len(pairs) < batch_size:
        raise ValueError(
            f"need at least batch_size={batch_size} pairs, have {len(pairs)}")
    rng = np.random.RandomState(seed)
    # augmentation rng is consumed only inside assemble (the lookahead
    # decode thread); the epoch-shuffle rng stays main-thread-only
    aug_rng = np.random.RandomState(seed + 0x5EED)

    def assemble(chunk):
        rgbs, depths, valids = [], [], []
        for rgb, depth in _load_pair_chunk(chunk):
            rgb = _to_rgb(rgb)
            depth = depth if depth.ndim == 2 else depth[..., 0]
            rgbs.append(_resize_nearest(rgb, h, w))
            d = _resize_nearest(depth, h, w)
            depths.append(d)
            valids.append(d >= 1e-4)
        out = (np.stack(rgbs).astype(np.float32),
               np.stack(depths).astype(np.float32),
               np.stack(valids))
        return augment_batch(*out, aug_rng, pano=True) if augment else out

    def chunks():
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(pairs)) if shuffle else np.arange(
                len(pairs))
            for start in range(0, len(order) - batch_size + 1, batch_size):
                yield [pairs[k] for k in order[start : start + batch_size]]
            epoch += 1

    yield from _prefetched(chunks(), assemble)


def _sample_window(rng: np.random.RandomState):
    """Random viewing window in the reference's FOV regime."""
    fovx = rng.uniform(math.radians(60), math.radians(100))
    fovy = rng.uniform(math.radians(60), math.radians(100))
    azi_c = rng.uniform(0, 2 * math.pi)
    zen_c = rng.uniform(math.radians(45), math.radians(135))
    return (azi_c - fovx / 2, azi_c + fovx / 2,
            zen_c - fovy / 2, zen_c + fovy / 2)


def _gather_view(img: np.ndarray, fov, h: int, w: int,
                 nearest: bool) -> np.ndarray:
    win = geometry.make_window(*fov, xp=np)
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    xg, yg = np.meshgrid(xs, ys)
    azi, zen = geometry.xy_to_spherical(win, xg, yg, xp=np)
    ih, iw = img.shape[:2]
    xi = np.clip(((azi % (2 * math.pi)) / (2 * math.pi) * (iw - 1)
                  + (0 if nearest else 0.5)).astype(np.int64), 0, iw - 1)
    yi = np.clip((zen / math.pi * (ih - 1)).astype(np.int64), 0, ih - 1)
    return img[yi, xi]


def perspective_batches(pairs: List[Tuple[str, str]], batch_size: int,
                        view_size: int = 256, shuffle: bool = True,
                        seed: int = 0, epochs: Optional[int] = None,
                        augment: bool = False
                        ) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]]:
    """Perspective (rgb, depth, valid) crops of (view_size, view_size).

    Each sample draws a random window on a random panorama and gathers RGB
    and gt depth through it — the same geometry stage A uses, so train and
    inference distributions match.
    """
    if len(pairs) < batch_size:
        raise ValueError(
            f"need at least batch_size={batch_size} pairs, have {len(pairs)}")
    rng = np.random.RandomState(seed)
    aug_rng = np.random.RandomState(seed + 0x5EED)

    def assemble(work):
        chunk, fovs = work
        rgbs, depths, valids = [], [], []
        for (rgb, depth), fov in zip(_load_pair_chunk(chunk), fovs):
            rgb = _to_rgb(rgb)
            depth = depth if depth.ndim == 2 else depth[..., 0]
            rgbs.append(_gather_view(rgb, fov, view_size, view_size,
                                     nearest=False))
            d = _gather_view(depth, fov, view_size, view_size,
                             nearest=True)
            depths.append(d)
            valids.append(d >= 1e-4)
        out = (np.stack(rgbs).astype(np.float32),
               np.stack(depths).astype(np.float32),
               np.stack(valids))
        return augment_batch(*out, aug_rng) if augment else out

    def work_items():
        # windows are drawn on the main thread so the single rng stays
        # race-free under the lookahead decode thread
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(pairs)) if shuffle else np.arange(
                len(pairs))
            for start in range(0, len(order) - batch_size + 1, batch_size):
                chunk = [pairs[k] for k in order[start : start + batch_size]]
                yield chunk, [_sample_window(rng) for _ in chunk]
            epoch += 1

    yield from _prefetched(work_items(), assemble)
