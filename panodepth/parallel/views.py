"""View-parallel latency mode: one panorama sharded over the device mesh.

The batched e2e graph (:func:`panodepth.e2e.build_batched_e2e`) scales
*throughput* by sharding the panorama batch over ``dp`` — but a batch-1
request still runs every stage on one chip.  This module scales *latency*
instead: the per-view fan-out that dominates the on-device pipeline
(view extraction -> perspective CNN -> per-view registration -> per-view
fusion targets; reference ``Main.cpp:242-516`` runs the same fan-out as a
serial loop over 15 windows) is sharded over a ``vp`` mesh axis, so a
single panorama's views run on different chips concurrently.

The whole pipeline is ONE ``shard_map`` program (the collective schedule
is explicit and minimal):

* the equirect RGB + model params replicate; each device extracts and
  CNN-infers only its ``V/n`` views (the dominant cost, ~75% of the e2e
  graph on the v5e — CLAUDE.md breakdown) and solves their registration
  fits locally (per-view QR LSQ, no cross-view terms);
* each device accumulates its views' fusion target-Laplacian slabs into a
  partial canvas; one ``psum_scatter`` per pyramid level both reduces the
  partials over ``vp`` AND leaves each device exactly its *width shard* of
  the target (half the bytes of a psum);
* the Jacobi relaxation then runs width-sharded over the same devices via
  :func:`panodepth.parallel.spatial.jacobi_local` (temporal-blocked
  ``ppermute`` ring halos), and ``shard_map`` assembles the final u16
  panorama from the width shards.

Numerics: identical op order to the single-device graph except that the
per-pixel sum over covering views runs as a ``psum_scatter`` tree instead
of a fixed-order sequential add, so overlapping-view pixels can differ by
f32 summation order (~1 ulp in the target; <=2 u16 ulps after the Jacobi
schedule — the same tolerance the reference-parity suite allows).

Per-view static tables (registration grids, fusion slab gathers) are
padded to a common shape and fed as arrays sharded over their leading
view axis — the SPMD-uniform reformulation of the single-device graph's
per-view unrolled constants.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MergeConfig
from ..fusion import (_view_gather_indices, build_fusion_plan,
                      init_level0, upsample2x)
from ..ops.projection import extract_view, view_shape
from ..ops.sampling import as01_post
from ..registration import _clamp, build_sample_grids, fit_cubic
from .spatial import jacobi_local, shard_map


def _pvary(x, axis: str):
    """Type ``x`` as device-varying over ``axis`` (jax API compat)."""
    try:
        return jax.lax.pcast(x, (axis,), to="varying")
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        return jax.lax.pvary(x, (axis,))


def make_vp_mesh(n: Optional[int] = None, devices=None) -> Mesh:
    """1-axis ("vp",) mesh over ``n`` devices (defaults to all)."""
    devices = devices if devices is not None else jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), ("vp",))


def _pad_views(arr: np.ndarray, vp: int) -> np.ndarray:
    """Zero-pad the leading (view) axis of a static table to ``vp``."""
    out = np.zeros((vp, *arr.shape[1:]), arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def _registration_tables(cfg: MergeConfig, emap_shape: Tuple[int, int],
                         pmap_shape: Tuple[int, int], vp: int):
    """Stacked (vp, R, C) registration gather indices + weights.

    The same host-f64 index precompute as
    :func:`panodepth.registration.register_views`, reshaped so the view
    axis can be sharded; padded views carry weight 0 everywhere (their fit
    degenerates to abcd = 0, which downstream masks ignore).
    """
    from ..registration import grid_sample_indices

    g = build_sample_grids(cfg)
    # the ONE quantization rule, shared with register_views
    exi, eyi, pxi, pyi = grid_sample_indices(g, emap_shape, pmap_shape)
    wgt = g.weight.astype(np.float32)
    return tuple(_pad_views(a, vp) for a in (exi, eyi, pxi, pyi, wgt))


def _level_tables(cfg: MergeConfig, lvl_idx: int, pmap_shape: Tuple[int, int],
                  vp: int):
    """Padded per-view slab tables for one pyramid level.

    Returns (idx (vp, Mh, Mw) i32, mask (vp, Mh-2, Mw-2) f32,
    org (vp, 2) i32): the flat slab gather indices, the valid-extent mask of
    each view's target-Laplacian block, and the block's (y, x) origin in the
    level image.  Views with an empty fusion footprint (and padding views)
    get an all-zero mask at origin (0, 0).
    """
    plan = build_fusion_plan(cfg)
    lvl = plan.levels[lvl_idx]
    nv = len(lvl.bboxes)
    tabs = [_view_gather_indices(cfg, lvl_idx, v, pmap_shape)
            for v in range(nv)]
    mh = max([t.shape[0] for t in tabs if t is not None], default=3)
    mw = max([t.shape[1] for t in tabs if t is not None], default=3)
    idx = np.zeros((vp, mh, mw), np.int32)
    mask = np.zeros((vp, mh - 2, mw - 2), np.float32)
    org = np.zeros((vp, 2), np.int32)
    for v, t in enumerate(tabs):
        if t is None:
            continue
        sh, sw = t.shape
        idx[v, :sh, :sw] = t
        mask[v, : sh - 2, : sw - 2] = 1.0
        x_lo, _, y_lo, _ = lvl.bboxes[v]
        org[v] = (y_lo, x_lo)
    return idx, mask, org


def build_latency_e2e(persp_model, persp_params, cfg: MergeConfig,
                      mesh: Mesh, view_width: int = 512, base_model=None,
                      base_params=None, base_w: int = 512,
                      baseline_shape: Optional[Tuple[int, int]] = None,
                      extract_dtype: str = "auto", halo: int = 1,
                      axis: str = "vp", debug: bool = False):
    """One-panorama view-parallel device graph.

    Returns ``fn(rgb) -> (out_u16 (H, W), abcd (V, 4), emap)`` (or
    ``fn(rgb, baseline)`` when no ``base_model`` is given, in which case
    ``baseline_shape`` must name the baseline's static (h, w)); ``emap``
    is the 0~1 baseline panorama the views were registered against (the
    CNN output, or the normalized given baseline).  Arguments mirror
    :func:`panodepth.e2e.build_batched_e2e`; ``halo`` is the
    temporal-blocking depth of the width-sharded Jacobi (see
    :func:`..parallel.spatial.jacobi_local`).  With ``debug`` the return
    is ``(out, abcd, emap, pmaps (V', h, w), per-level targets)``.

    Requires a layout whose views share one shape at ``view_width`` (all
    built-in layouts do) and level widths divisible by the ``vp`` size.
    """
    from ..e2e import _as01_img, _resolve_extract_dtype, _round32
    from ..models.perspective import predict_depth01
    from ..registration import apply_cubic

    layout = cfg.layout
    nv = layout.num_views
    n = mesh.shape[axis]
    shapes = {view_shape(layout.fovs[i], view_width) for i in range(nv)}
    if len(shapes) != 1:
        raise ValueError(
            f"latency mode needs one view shape, layout has {shapes}; "
            "use the dp-batched e2e graph for mixed-aspect layouts")
    (h, w), = shapes
    nh, nw = _round32(h), _round32(w)
    vp = -(-nv // n) * n  # views padded to a multiple of the axis size

    plan = build_fusion_plan(cfg)
    for lvl in plan.levels:
        if lvl.width % n:
            raise ValueError(
                f"level width {lvl.width} not divisible by vp={n}")

    if base_model is not None:
        emap_shape = (base_w // 2, base_w)
    elif baseline_shape is not None:
        emap_shape = tuple(baseline_shape)
    else:
        raise ValueError("need base_model or baseline_shape")

    fovs = np.stack([layout.fovs[i] for i in range(nv)]).astype(np.float32)
    fovs = np.concatenate(
        [fovs, np.repeat(fovs[:1], vp - nv, 0)]) if vp > nv else fovs
    regt = _registration_tables(cfg, emap_shape, (h, w), vp)
    ltabs = tuple(_level_tables(cfg, l, (h, w), vp)
                  for l in range(len(plan.levels)))
    on_tpu = jax.default_backend() == "tpu"
    with_baseline = base_model is None

    def body(pparams, bparams, rgb, *rest):
        from ..ops.sampling import (pack_rgb_u32,
                                    sample_equirect_bilinear_packed)

        if with_baseline:
            baseline, fovs_l, (exi, eyi, pxi, pyi, wgt), lt, icovs = rest
        else:
            fovs_l, (exi, eyi, pxi, pyi, wgt), lt, icovs = rest

        ex_mode = _resolve_extract_dtype(extract_dtype, rgb.dtype, on_tpu)
        rgb01 = _as01_img(rgb)
        if with_baseline:
            emap = _as01_img(baseline)
            emap = emap if emap.ndim == 2 else emap[..., 0]
        else:
            # replicated compute: the baseline CNN sees one image, every
            # device runs it identically (cheap next to the 15-view fan-out)
            rb_src = rgb01 if ex_mode == "f32" else rgb01.astype(jnp.bfloat16)
            rb = jax.image.resize(rb_src, (base_w // 2, base_w, 3),
                                  "bilinear")
            emap = base_model.apply(bparams, rb[None])[0]

        # --- local view extraction + perspective CNN (the sharded fan-out)
        sampler = None
        if ex_mode == "packed":
            src = pack_rgb_u32(rgb if rgb.dtype == jnp.uint8 else rgb01)
            sampler = sample_equirect_bilinear_packed
        elif ex_mode == "packed16":
            from ..ops.sampling import (pack_rgb565_u16,
                                        sample_equirect_bilinear_packed565)

            src = pack_rgb565_u16(rgb if rgb.dtype == jnp.uint8 else rgb01)
            sampler = sample_equirect_bilinear_packed565
        elif ex_mode in ("pair16", "pair16d"):
            from ..ops.sampling import (pack_rgb565_pair_u32,
                                        sample_equirect_bilinear_packed565pair)

            src = pack_rgb565_pair_u32(rgb if rgb.dtype == jnp.uint8
                                       else rgb01,
                                       dither=ex_mode == "pair16d")
            sampler = sample_equirect_bilinear_packed565pair
        elif ex_mode == "bf16":
            src = rgb01.astype(jnp.bfloat16)
        else:
            src = rgb01
        views = jax.vmap(
            lambda f: extract_view(src, f, view_width, (h, w),
                                   sampler=sampler))(fovs_l)
        flat = views
        if (nh, nw) != (h, w):
            flat = jax.image.resize(flat, (flat.shape[0], nh, nw, 3),
                                    "bilinear")
        depths = predict_depth01(pparams, persp_model, flat)
        if (nh, nw) != (h, w):
            depths = jax.image.resize(depths, (depths.shape[0], h, w),
                                      "bilinear")
        pmaps = depths  # (Vl, h, w)

        # --- local per-view registration (same op order as register_views)
        d0 = _clamp(as01_post(
            jax.vmap(lambda pm, py, px: pm[py, px])(pmaps, pyi, pxi)))
        d1 = _clamp(as01_post(emap[eyi, exi]))
        abcd_l = jax.vmap(fit_cubic)(d0.astype(jnp.float32),
                                     d1.astype(jnp.float32), wgt)

        # --- fusion: per-level partial targets -> psum_scatter -> sharded
        # Jacobi (each device relaxes its width shard of the panorama)
        didx = jax.lax.axis_index(axis)
        pm_flat = pmaps.reshape(pmaps.shape[0], -1)
        buf = None
        dbg_tgts = []
        for l, lvl in enumerate(plan.levels):
            wl = lvl.width // n
            if l == 0:
                full0 = init_level0(emap, lvl, cfg)
                buf = jax.lax.dynamic_slice(full0, (0, didx * wl),
                                            (lvl.height, wl))
            else:
                buf = upsample2x(buf)
            idx_t, mask_t, org_t = lt[l]
            mh, mw = idx_t.shape[1:]
            # the zero canvas must be typed device-varying over vp for the
            # scan carry to match its (varying) per-view accumulations
            canvas = _pvary(
                jnp.zeros((lvl.height + mh, lvl.width + mw), jnp.float32),
                axis)

            def add_view(cv, xs):
                pm, it, mk, og, ab = xs
                slab = as01_post(jnp.take(pm, it))
                slab = apply_cubic(slab, ab)
                lap = slab[1:-1, 1:-1] - 0.25 * (
                    slab[1:-1, :-2] + slab[1:-1, 2:]
                    + slab[:-2, 1:-1] + slab[2:, 1:-1])
                # where, not multiply: padded/empty views carry junk (even
                # NaN) coefficients, and NaN * 0 = NaN would poison the sum
                lap = jnp.where(mk > 0, lap, 0.0)
                blk = jax.lax.dynamic_slice(cv, (og[0], og[1]), lap.shape)
                return jax.lax.dynamic_update_slice(
                    cv, blk + lap, (og[0], og[1])), None

            canvas, _ = jax.lax.scan(
                add_view, canvas, (pm_flat, idx_t, mask_t, org_t, abcd_l))
            # reduce the per-device partial sums over vp AND scatter the
            # width shards in one collective (half the bytes of a psum)
            tgt = jax.lax.psum_scatter(
                canvas[: lvl.height, : lvl.width], axis,
                scatter_dimension=1, tiled=True)
            # icovs arrives width-sharded (P(None, axis)): this device's
            # (H_l, W_l/n) slice, no trace-baked full-res constants and no
            # runtime dynamic_slice
            inv_l = icovs[l]
            if debug:
                dbg_tgts.append(tgt * inv_l)
            buf = jacobi_local(buf, tgt * inv_l,
                               (inv_l > 0).astype(jnp.float32),
                               lvl.iterations, cfg.jacobi_step,
                               cfg.jacobi_reg, axis, n, halo=halo)
        out = (jnp.clip(buf, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
        if debug:
            return out, abcd_l, emap, pmaps, tuple(dbg_tgts)
        return out, abcd_l, emap

    sharded = P(axis)
    repl = P()
    in_specs = (repl, repl, repl) + ((repl,) if with_baseline else ()) \
        + (sharded, sharded, sharded, P(None, axis))
    out_specs = (P(None, axis), sharded, repl)
    if debug:
        out_specs = (P(None, axis), sharded, repl, sharded, P(None, axis))
    smapped = shard_map(body, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs)

    fovs_j = jnp.asarray(fovs)
    regt_j = tuple(jnp.asarray(a) for a in regt)
    ltabs_j = tuple(tuple(jnp.asarray(a) for a in t) for t in ltabs)
    icovs_j = tuple(jnp.asarray(lvl.inv_cov) for lvl in plan.levels)
    # commit params to the replicated sharding once (same rationale as
    # build_batched_e2e: jit does not cache argument resharding)
    repl_sh = NamedSharding(mesh, P())
    persp_params = jax.device_put(persp_params, repl_sh)
    if base_params is not None:
        base_params = jax.device_put(base_params, repl_sh)

    if with_baseline:
        def fn(rgb, baseline):
            out, abcd, *dbg = smapped(persp_params, base_params, rgb,
                                      baseline, fovs_j, regt_j, ltabs_j,
                                      icovs_j)
            return (out, abcd[:nv], *dbg)
    else:
        def fn(rgb):
            out, abcd, *dbg = smapped(persp_params, base_params, rgb,
                                      fovs_j, regt_j, ltabs_j, icovs_j)
            return (out, abcd[:nv], *dbg)
    return jax.jit(fn)
