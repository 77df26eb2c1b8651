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

    # registration + fusion consume the per-view maps at their native
    # stage-C shapes (register_views/fuse accept heterogeneous lists, so
    # mixed-aspect custom layouts need no resample-to-common-shape)
    abcd = registration.register_views(baseline, pmaps, cfg)
    plan = build_fusion_plan(cfg)
    out_u16, _ = fuse(baseline, pmaps, plan, jacobi_fn=jacobi_fn, abcd=abcd)
    return out_u16, abcd, baseline, pmaps


def load_model_checkpoint(ckpt_path: str):
    """Rebuild a model + params from a train_cli checkpoint + arch sidecar.

    Looks for ``<model>.config.json`` next to the checkpoint directory (the
    sidecar train_cli writes).  Returns (model, params, arch_dict).
    """
    import json
    import os

    ckpt_path = os.path.abspath(ckpt_path)
    is_npz = ckpt_path.endswith(".npz")
    ckpt_dir = os.path.dirname(ckpt_path)
    name = os.path.basename(ckpt_path).split("_")[0].split(".")[0]
    cfg_file = os.path.join(ckpt_dir, f"{name}.config.json")
    with open(cfg_file) as fp:
        arch = json.load(fp)
    s = arch.get("width_scale", 1.0)

    from .models import train as ptrain
    from .models.hohonet import HorizonDepthNet

    kind = arch["model"]
    if kind == "perspective":
        model = PerspectiveDepthNet(
            widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
            decoder_width=max(16, int(128 * s)))
        sample = jnp.zeros((1, arch.get("view_size", 256),
                            arch.get("view_size", 256), 3))
    elif kind == "hohonet":
        model = HorizonDepthNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            horizon_dim=max(32, int(256 * s)))
        pw = arch.get("pano_width", 512)
        sample = jnp.zeros((1, pw // 2, pw, 3))
    else:
        model = PanoBaselineNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)))
        pw = arch.get("pano_width", 512)
        sample = jnp.zeros((1, pw // 2, pw, 3))

    if is_npz:
        template = model.init(jax.random.PRNGKey(0), sample)
        return model, ptrain.load_params_npz(ckpt_path, template), arch
    tx = ptrain.make_optimizer()
    template = ptrain.init_state(model, jax.random.PRNGKey(0), sample, tx)
    state = ptrain.restore_checkpoint(ckpt_path, template)
    return model, state.params, arch


def run_batch_e2e(rgb_folder: str, gt_folder: str, result_folder: str,
                  persp_ckpt: str, cfg: MergeConfig = MergeConfig(),
                  baseline_ckpt=None, baseline_folder=None,
                  dataset: str = "matterport", view_width: int = 512,
                  limit=None, profile: bool = False, log=print):
    """Fully on-device batch: RGB -> models -> registration -> fusion.

    The perspective model is mandatory; the panoramic baseline comes either
    from a second checkpoint or from baseline files on disk (reference
    conventions).  Outputs and metrics match run_batch's contract.

    Production-shaped like the file-based driver: the next panorama (and
    its gt) decodes on a background thread while the device computes the
    current one, and PNG writes go to a writer thread.  With ``profile``
    the models and registration+fusion run as two separately-timed graphs
    (host-synced between), mirroring the reference's time_Reg /
    time_Laplacian split (Main.cpp:667-681); the per-item times land in
    the returned records.
    """
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    from . import io as pio
    from . import metrics as pmetrics

    persp_model, persp_params, _ = load_model_checkpoint(persp_ckpt)
    base_model = base_params = None
    base_w = 512
    if baseline_ckpt:
        base_model, base_params, base_arch = load_model_checkpoint(
            baseline_ckpt)
        # fixed-width families (hohonet's column decoder) must run at their
        # training resolution; the 0~1 baseline works at any size downstream
        base_w = base_arch.get("pano_width", 512)

    def models_stage(r, baseline=None):
        """RGB -> (baseline, per-view pmaps)."""
        if baseline is None:
            r_base = jax.image.resize(r, (base_w // 2, base_w, 3),
                                      "bilinear")
            baseline = base_model.apply(base_params, r_base[None])[0]
        layout = cfg.layout
        views = extract_views(r, layout, width=view_width)
        shapes = [view_shape(layout.fovs[i], view_width)
                  for i in range(layout.num_views)]
        net_shapes = [(_round32(h), _round32(w)) for h, w in shapes]
        pmaps = [None] * layout.num_views
        groups = {}
        for i, s in enumerate(net_shapes):
            groups.setdefault(s, []).append(i)
        for (nh, nw), idxs in groups.items():
            batch = jnp.stack([jax.image.resize(views[i], (nh, nw, 3),
                                                "bilinear") for i in idxs])
            depths = predict_depth01(persp_params, persp_model, batch)
            for j, i in enumerate(idxs):
                h, w = shapes[i]
                pmaps[i] = jax.image.resize(depths[j], (h, w), "bilinear")
        return baseline, pmaps

    def fuse_stage(baseline, pmaps):
        abcd = registration.register_views(baseline, pmaps, cfg)
        plan = build_fusion_plan(cfg)
        out_u16, _ = fuse(baseline, pmaps, plan, abcd=abcd)
        return out_u16, abcd

    # jax.jit caches per input shape, so one jitted callable serves
    # mixed-size panorama folders
    jit_models = jax.jit(models_stage)
    jit_fuse = jax.jit(fuse_stage)

    def _full(*a):
        baseline, pmaps = models_stage(*a)
        out_u16, _ = fuse_stage(baseline, pmaps)
        return out_u16, baseline

    jit_full = jax.jit(_full)

    rgb_files = pio.list_images(rgb_folder)
    if limit is not None:
        rgb_files = rgb_files[:limit]
    os.makedirs(result_folder, exist_ok=True)
    log(f"[run_batch_e2e] {len(rgb_files)} panoramas, on-device models"
        + (", profiled stages" if profile else ""))

    def decode(f):
        raw = pio.raw_name(f)
        rgb_np = pio.load_image01(f)
        if rgb_np.ndim == 2:
            rgb_np = np.stack([rgb_np] * 3, -1)
        rgb_np = rgb_np[..., :3]
        baseline_np = None
        if base_model is None:
            bfile = pio.baseline_filename(baseline_folder, raw,
                                          result_folder)
            baseline_np = pio.load_image01(bfile)
        gt_file = pio.gt_filename(gt_folder, raw, dataset)
        gt = pio.load_image01(gt_file) if os.path.exists(gt_file) else None
        return rgb_np, baseline_np, gt

    todo = []
    for i, f in enumerate(rgb_files):
        raw = pio.raw_name(f)
        if os.path.exists(os.path.join(result_folder, raw + ".png")):
            log(f"{i}/{len(rgb_files)} skip!")
            continue
        todo.append((i, f, raw))

    all_metrics = []
    pool = ThreadPoolExecutor(max_workers=2)
    writes = []
    try:
        nxt = pool.submit(decode, todo[0][1]) if todo else None
        for k, (i, f, raw) in enumerate(todo):
            rgb_np, baseline_np, gt = nxt.result()
            nxt = (pool.submit(decode, todo[k + 1][1])
                   if k + 1 < len(todo) else None)
            args = (jnp.asarray(rgb_np),)
            if base_model is None:
                args += (jnp.asarray(baseline_np),)
            t0 = time.monotonic()
            if profile:
                baseline, pmaps = jit_models(*args)
                float(pmaps[0][0, 0])          # host sync (axon-safe)
                t1 = time.monotonic()
                out_u16, abcd = jit_fuse(baseline, pmaps)
            else:
                out_u16, baseline = jit_full(*args)
                t1 = t0
            out_np = np.asarray(jax.device_get(out_u16))
            t2 = time.monotonic()
            out_file = os.path.join(result_folder, raw + ".png")
            writes.append(pool.submit(pio.save_png16, out_file, out_np))
            rec = dict(name=raw,
                       time_models_ms=int((t1 - t0) * 1000) if profile
                       else None,
                       time_fuse_ms=int((t2 - t1) * 1000),
                       metrics=None)
            if gt is not None:
                m = pmetrics.paired_metrics(
                    jnp.asarray(gt), baseline,
                    jnp.asarray(out_np.astype(np.float32) / 65535.0),
                    align_way=cfg.align_way, cap_depth=cfg.cap_depth,
                    zenith_range=cfg.zenith_range)
                m.save(os.path.join(result_folder, raw + ".aligned.txt"))
                m.print()
                rec["metrics"] = m
                all_metrics.append(m)
            if profile:
                log(f"{i}/{len(rgb_files)} {raw}: models "
                    f"{rec['time_models_ms']} ms, reg+fusion "
                    f"{rec['time_fuse_ms']} ms")
        for wjob in writes:
            wjob.result()
    finally:
        pool.shutdown(wait=True)
    return all_metrics
