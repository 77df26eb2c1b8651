"""End-to-end on-TPU pipeline: RGB panorama -> high-res depth, one graph.

The reference crosses a process boundary twice: GL renders perspective RGB
views to disk, an external CNN (LeReS/MiDaS) turns them into depth images,
and separately-produced baseline panoramas (UniFuse/HoHoNet-class) are read
from disk (reference ``Main.cpp:438-474``, ``500-516``).  Here the whole
chain is a single jit-compiled device graph:

    PanoBaselineNet(rgb)                  -> baseline emap      (0~1)
    extract_views(rgb)                    -> V perspective RGBs
    PerspectiveDepthNet(views)            -> V perspective depths (0~1)
    register_views + fuse                 -> u16 panorama

No pixels leave the device between stages.  The models are the trainable
on-TPU replacements for the external CNNs; with randomly initialized
parameters the pipeline is functional end-to-end (useful for scaling and
integration work) but needs trained weights for accurate depth.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import registration
from .config import MergeConfig
from .fusion import build_fusion_plan, fuse
from .models.panoramic import PanoBaselineNet
from .models.perspective import PerspectiveDepthNet, predict_depth01
from .ops.projection import extract_views, view_shape


def _round32(v: int) -> int:
    return max(32, (v // 32) * 32)


def full_pipeline(rgb, persp_model: PerspectiveDepthNet, persp_params,
                  base_model: Optional[PanoBaselineNet] = None,
                  base_params=None, baseline=None,
                  cfg: MergeConfig = MergeConfig(), view_width: int = 512,
                  jacobi_fn=None):
    """RGB equirect (H, W, 3) -> (u16 (out_h, out_w), abcd, baseline, pmaps).

    Either a panoramic baseline model (+params) or a precomputed ``baseline``
    array must be given.  ``view_width`` controls the perspective inference
    resolution (snapped to multiples of 32 for the CNN strides).
    """
    if baseline is None:
        baseline = base_model.apply(base_params, rgb[None])[0]

    layout = cfg.layout
    views = extract_views(rgb, layout, width=view_width)
    # group same-shaped views for batched CNN inference
    shapes = [view_shape(layout.fovs[i], view_width)
              for i in range(layout.num_views)]
    net_shapes = [( _round32(h), _round32(w)) for h, w in shapes]
    pmaps = [None] * layout.num_views
    groups = {}
    for i, s in enumerate(net_shapes):
        groups.setdefault(s, []).append(i)
    for (nh, nw), idxs in groups.items():
        batch = jnp.stack([
            jax.image.resize(views[i], (nh, nw, 3), "bilinear") for i in idxs
        ])
        depths = predict_depth01(persp_params, persp_model, batch)
        for j, i in enumerate(idxs):
            h, w = shapes[i]
            pmaps[i] = jax.image.resize(depths[j], (h, w), "bilinear")

    # registration + fusion need a single stacked (V, Hp, Wp) array; resize
    # all views to the first group's shape (identical for the 5-fold layouts)
    h0, w0 = shapes[0]
    pstack = jnp.stack([
        p if p.shape == (h0, w0) else jax.image.resize(p, (h0, w0), "bilinear")
        for p in pmaps
    ])
    abcd = registration.register_views(baseline, pstack, cfg)
    plan = build_fusion_plan(cfg)
    out_u16, _ = fuse(baseline, pstack, plan, jacobi_fn=jacobi_fn, abcd=abcd)
    return out_u16, abcd, baseline, pstack


@functools.lru_cache(maxsize=4)
def compiled_full_pipeline(cfg: MergeConfig, view_width: int = 512,
                           persp_kwargs: tuple = (), base_kwargs: tuple = ()):
    """jit of :func:`full_pipeline` with models built from kwargs tuples."""
    persp = PerspectiveDepthNet(**dict(persp_kwargs))
    base = PanoBaselineNet(**dict(base_kwargs))

    @jax.jit
    def fn(rgb, persp_params, base_params):
        return full_pipeline(rgb, persp, persp_params, base, base_params,
                             cfg=cfg, view_width=view_width)

    return fn
