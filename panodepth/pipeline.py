"""End-to-end merge pipeline and resumable batch driver.

``merge_arrays``        — the jit-compiled device core (register every view
                          -> cubic remap -> multiresolution fusion -> u16),
                          the TPU equivalent of ``MergeDepthMaps``'s compute
                          (reference ``Depth.cpp:754-930``).
``merge_depth_maps``    — file-in/file-out per-panorama merge incl. optional
                          gt scoring and the masked ``.res.png``/``.giv.png``
                          outputs (``Depth.cpp:933-1035``).
``run_batch``           — the dataset walker with skip-if-output-exists
                          resume and rolling 5-image metric reports
                          (reference ``Main.cpp:489-685``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import io as pio
from . import metrics as pmetrics
from . import registration
from .config import MergeConfig, ZENITH_RANGE
from .fusion import build_fusion_plan, fuse


def _as01(x):
    """Accept u16 device inputs: cast to f32 0~1 on device.

    The streamed batch path transfers emaps/pmaps as uint16 (halving
    host->device bytes over the tunnel) and normalizes here — the same
    ``k/65535`` the host decoder would compute, so results are identical up
    to XLA's division ulp.
    """
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) / 65535.0
    return x


def merge_arrays(emap, pmaps, cfg: MergeConfig, jacobi_fn=None):
    """Device core: baseline emap + V perspective depths -> fused u16 pano.

    Returns (out_u16 (H, W), abcd (V, 4)).  Pure function of arrays (f32
    0~1, or streamed uint16); jit it via :func:`compiled_merge`.

    uint16 inputs stay 16-bit through the registration and fusion slab
    gathers and normalize post-gather (``ops.sampling.as01_post`` — exact,
    and half the gather HBM traffic of an f32 table).
    """
    abcd = registration.register_views(emap, pmaps, cfg)
    plan = build_fusion_plan(cfg)
    # the cubic remap is fused into the slab gathers (abcd=) instead of
    # materializing V full-size transformed maps
    out_u16, _ = fuse(emap, pmaps, plan, jacobi_fn=jacobi_fn, abcd=abcd)
    return out_u16, abcd


@functools.lru_cache(maxsize=32)
def compiled_merge(cfg: MergeConfig, jacobi_kind: str = "auto"):
    """Shape-polymorphic cached jit of :func:`merge_arrays`."""
    jacobi_fn = _resolve_jacobi(jacobi_kind)
    return jax.jit(lambda emap, pmaps: merge_arrays(emap, pmaps, cfg, jacobi_fn))


@functools.lru_cache(maxsize=32)
def compiled_merge_staged(cfg: MergeConfig, jacobi_kind: str = "auto"):
    """Registration and fusion as two separately-jitted stages.

    Used by the profiling path to report the reference's time_Reg /
    time_Laplacian split (Main.cpp:667-681); the fused single-graph path is
    faster and is the default.
    """
    from . import registration
    from .fusion import build_fusion_plan, fuse

    jacobi_fn = _resolve_jacobi(jacobi_kind)
    plan = build_fusion_plan(cfg)

    @jax.jit
    def reg_fn(emap, pmaps):
        abcd = registration.register_views(emap, pmaps, cfg)
        return abcd, jax.vmap(registration.apply_cubic)(pmaps, abcd)

    @jax.jit
    def fuse_fn(emap, pmaps_reg):
        return fuse(emap, pmaps_reg, plan, jacobi_fn=jacobi_fn)[0]

    return reg_fn, fuse_fn


def _host_sync(x):
    """True device sync: a host readback (block_until_ready can return
    before remote execution finishes on tunneled backends)."""
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def _resolve_jacobi(kind: str):
    if kind == "jnp":
        return None
    try:
        from .kernels.jacobi import pallas_jacobi

        return pallas_jacobi
    except Exception:
        if kind == "pallas":
            raise
        return None


def _load_inputs(baseline_filename, pmap_filenames):
    """Decode the baseline + all views, threaded via the native prefetcher
    when available (the reference loads synchronously, Depth.cpp:754-787)."""
    from .utils import nativeio

    # .pfm is excluded: its 0~1 normalization (LoadPfm flip/cap semantics)
    # lives in the python path
    files = [baseline_filename] + list(pmap_filenames)
    if nativeio.batch_prefetch_wins() and all(
            f.lower().endswith(".png") for f in files):
        pf = nativeio.BatchPrefetcher(files, threads=8)
        try:
            imgs = [pf.get(i) for i in range(len(files))]
        finally:
            pf.close()
        for f, img in zip(files, imgs):
            if img is None:
                raise FileNotFoundError(f)
        return imgs[0], imgs[1:]
    return (pio.load_image01(baseline_filename),
            [pio.load_image01(f) for f in pmap_filenames])


@dataclasses.dataclass
class MergeOutput:
    out_u16: np.ndarray
    abcd: np.ndarray
    metrics: Optional[pmetrics.Metrics]
    # per-item registration time; None when the stages ran as one fused
    # graph and the split is not observable (report it as unavailable
    # rather than 0 — reference prints a real split, Main.cpp:667-681)
    time_reg_ms: Optional[int]
    time_fusion_ms: int


def merge_depth_maps(
    baseline_filename: str,
    pmap_filenames: List[str],
    out_filename: str,
    cfg: MergeConfig,
    gt_filename: Optional[str] = None,
    jacobi_kind: str = "auto",
    profile: bool = False,
) -> MergeOutput:
    """File-level merge of one panorama (MergeDepthMaps parity).

    By default registration + fusion run as one fused jit invocation (the
    combined device time is attributed to fusion, the dominant stage).
    With ``profile=True`` the two stages run as separate graphs with a host
    sync between, populating the reference's time_Reg / time_Laplacian
    split (Main.cpp:667-681) at a small pipelining cost.
    """
    emap, views = _load_inputs(baseline_filename, pmap_filenames)
    shapes = {v.shape for v in views}
    if len(shapes) != 1:
        raise ValueError(f"perspective maps disagree in shape: {shapes}")
    pmaps = np.stack([v if v.ndim == 2 else v[..., 0] for v in views])

    if profile:
        reg_fn, fuse_fn = compiled_merge_staged(cfg, jacobi_kind)
        emap_d, pmaps_d = jnp.asarray(emap), jnp.asarray(pmaps)
        t0 = time.monotonic()
        abcd, pmaps_reg = reg_fn(emap_d, pmaps_d)
        _host_sync(abcd)
        t1 = time.monotonic()
        out_u16 = fuse_fn(emap_d, pmaps_reg)
        out_u16 = np.asarray(jax.device_get(out_u16))
        t2 = time.monotonic()
        abcd = np.asarray(jax.device_get(abcd))
        reg_ms, fus_ms = int((t1 - t0) * 1000), int((t2 - t1) * 1000)
    else:
        fn = compiled_merge(cfg, jacobi_kind)
        t0 = time.monotonic()
        out_u16, abcd = fn(jnp.asarray(emap), jnp.asarray(pmaps))
        out_u16 = np.asarray(jax.device_get(out_u16))
        abcd = np.asarray(jax.device_get(abcd))
        reg_ms, fus_ms = None, int((time.monotonic() - t0) * 1000)

    pio.save_png16(out_filename, out_u16)

    result = MergeOutput(out_u16, abcd, None, reg_ms, fus_ms)
    if gt_filename and os.path.exists(gt_filename):
        gt = pio.load_image01(gt_filename)
        result.metrics = pmetrics.paired_metrics(
            jnp.asarray(gt), jnp.asarray(emap),
            jnp.asarray(out_u16.astype(np.float32) / 65535.0),
            align_way=cfg.align_way, cap_depth=cfg.cap_depth,
            zenith_range=cfg.zenith_range,
        )
        _save_masked_variants(out_filename, out_u16, emap, gt, cfg)
    return result


def _save_masked_variants(out_filename, out_u16, emap, gt, cfg: MergeConfig):
    """.res.png / .giv.png with gt-invalid pixels blacked/whited out.

    Mirrors reference Depth.cpp:949-1035.
    """
    gt2 = gt if gt.ndim == 2 else gt[..., 0]
    for tag, img_u16, h, w in (
        (".res.png", out_u16, out_u16.shape[0], out_u16.shape[1]),
        (".giv.png",
         pio.to_uint16(emap if emap.ndim == 2 else emap[..., 0]),
         emap.shape[0], emap.shape[1]),
    ):
        h0 = int(math.floor(h * cfg.zenith_range[0] / math.pi))
        h1 = int(math.ceil(h * cfg.zenith_range[1] / math.pi))
        ys = (np.arange(h) * (gt2.shape[0] / h)).astype(np.int64)
        xs = (np.arange(w) * (gt2.shape[1] / w)).astype(np.int64)
        g = gt2[np.clip(ys, 0, gt2.shape[0] - 1)[:, None],
                np.clip(xs, 0, gt2.shape[1] - 1)[None, :]]
        out = img_u16.copy()
        band = np.broadcast_to(
            (np.arange(h)[:, None] >= h0) & (np.arange(h)[:, None] <= h1), (h, w)
        )
        out = np.where(band, out, 0)
        out = np.where(band & (g == 0), 0, out)
        out = np.where(band & (g >= 1 - 1e-4), 65535, out)
        pio.save_png16(out_filename + tag, out.astype(np.uint16))


@functools.lru_cache(maxsize=8)
def _compiled_extract_batched(cfg: MergeConfig, width: int):
    """Stage-A extraction jitted as one launch per same-shape view group,
    batched over panoramas (the reference renders view-by-view per panorama,
    Main.cpp:242-326).  Returns (jitted fn over (B, H, W, C) stacks,
    [(view_shape, view_indices), ...])."""
    from .ops.projection import extract_view, view_shape

    layout = cfg.layout
    shapes = [view_shape(layout.fovs[i], width)
              for i in range(layout.num_views)]
    grouped = {}
    for i, s in enumerate(shapes):
        grouped.setdefault(s, []).append(i)
    groups = list(grouped.items())

    def fn(rgbs):
        outs = []
        for shape, idxs in groups:
            fovs = jnp.asarray(np.stack([layout.fovs[i] for i in idxs]),
                               jnp.float32)
            one = lambda r, f: extract_view(r, f, width, shape)
            outs.append(jax.vmap(jax.vmap(one, in_axes=(None, 0)),
                                 in_axes=(0, None))(rgbs, fovs))
        return outs

    return jax.jit(fn), groups


def extract_stage_a(rgb_files, views_folder: str, cfg: MergeConfig,
                    width: int = 1024, pmap_ext: str = ".jpg",
                    batch_size: int = 4, log=print) -> int:
    """Extract perspective RGB views for every listed panorama (stage A).

    Panoramas are batched (grouped by image shape) so each device launch
    covers one view-shape group for the whole batch; JPEG writes for batch k
    overlap device compute for batch k+1 (double buffering).  Panoramas
    whose view files all exist are skipped.  Returns the number extracted.
    """
    layout = cfg.layout
    os.makedirs(views_folder, exist_ok=True)
    todo = []
    for f in rgb_files:
        raw = pio.raw_name(f)
        outs = pio.pmap_filenames(views_folder, raw, layout, ext=pmap_ext)
        if not all(os.path.exists(o) for o in outs):
            todo.append((f, outs))
    if not todo:
        return 0
    fn, groups = _compiled_extract_batched(cfg, width)

    def submit(batch):
        rgbs = jnp.asarray(np.stack([b[0] for b in batch]))
        return batch, fn(rgbs)

    def collect(pending):
        batch, dev = pending
        for g, (_, idxs) in enumerate(groups):
            arr = np.asarray(jax.device_get(dev[g]))  # (B, |idxs|, h, w, C)
            for bi, (_, outs) in enumerate(batch):
                for j, vi in enumerate(idxs):
                    pio.save_jpg(outs[vi], arr[bi, j])

    pending = None
    batch = []
    cur_shape = None
    for f, outs in todo:
        rgb = pio.load_image01(f)
        if rgb.ndim == 2:
            rgb = np.stack([rgb] * 3, -1)
        rgb = rgb[..., :3]
        if batch and (rgb.shape != cur_shape or len(batch) == batch_size):
            nxt = submit(batch)
            if pending is not None:
                collect(pending)
            pending = nxt
            batch = []
        cur_shape = rgb.shape
        batch.append((rgb, outs))
    if batch:
        nxt = submit(batch)
        if pending is not None:
            collect(pending)
        pending = nxt
    if pending is not None:
        collect(pending)
    return len(todo)


@functools.lru_cache(maxsize=8)
def compiled_merge_batched(cfg: MergeConfig, jacobi_kind: str = "auto"):
    jacobi_fn = _resolve_jacobi(jacobi_kind)
    return jax.jit(jax.vmap(
        lambda e, p: merge_arrays(e, p, cfg, jacobi_fn)))


@functools.lru_cache(maxsize=8)
def compiled_merge_staged_batched(cfg: MergeConfig, jacobi_kind: str = "auto"):
    """Batched registration and fusion as two separately-jitted graphs.

    The profiling counterpart of :func:`compiled_merge_batched`: a host sync
    between the stages yields the reference's time_Reg / time_Laplacian
    split (Main.cpp:667-681) for batch runs too.
    """
    jacobi_fn = _resolve_jacobi(jacobi_kind)
    plan = build_fusion_plan(cfg)

    @jax.jit
    def reg_fn(emaps, pmaps):
        emaps, pmaps = _as01(emaps), _as01(pmaps)
        abcd = jax.vmap(
            lambda e, p: registration.register_views(e, p, cfg))(emaps, pmaps)
        return abcd, jax.vmap(jax.vmap(registration.apply_cubic))(pmaps, abcd)

    @jax.jit
    def fuse_fn(emaps, pmaps_reg):
        return jax.vmap(
            lambda e, p: fuse(e, p, plan, jacobi_fn=jacobi_fn)[0])(
                emaps, pmaps_reg)

    return reg_fn, fuse_fn


def merge_many(
    items,
    cfg: MergeConfig,
    batch_size: int = 4,
    jacobi_kind: str = "auto",
    log=print,
    profile: bool = False,
    stream_u16: str = "auto",
):
    """Streamed batched merge of many panoramas.

    ``items`` — list of dicts with keys ``baseline``, ``pmaps`` (list of
    filenames), ``out``, and optional ``gt``.  Items are grouped by input
    shape into device batches; IO for the next batch overlaps device compute
    for the current one (the device queue is only fenced when results are
    read back for writing).  Returns a list of (item, MergeOutput) in input
    order; failed items get None and are reported via ``log``.

    With ``profile=True`` registration and fusion run as separate graphs
    with a host sync between, so each item carries a real time_Reg /
    time_Laplacian split (at a small pipelining cost); otherwise the split
    is reported as unavailable (``time_reg_ms=None``).

    ``stream_u16`` — "on"/"off"/"auto": transfer integer-source inputs to
    the device as uint16 (half the host->device bytes) and normalize
    on-device.  "auto" enables it only on TPU, where the tunnel transfer is
    the bottleneck; the on-device ``k/65535`` can differ from the host's by
    1 f32 ulp (XLA divides by reciprocal-multiply), which perturbs the u16
    output by at most 1 (tests/test_pipeline.py guards the bound), so exact
    batched==single equality holds only with "off".
    """
    results = [None] * len(items)
    loaded = []  # (index, emap, pmaps)
    for i, it in enumerate(items):
        try:
            emap, views = _load_inputs(it["baseline"], it["pmaps"])
            pm = np.stack([v if v.ndim == 2 else v[..., 0] for v in views])
            emap = emap if emap.ndim == 2 else emap[..., 0]
            # integer-source inputs stream to the device as uint16 (half
            # the host->device bytes); k/255 and k/65535 round-trip the
            # u16 re-quantization exactly, so only float PFMs are excluded
            files = [it["baseline"]] + list(it["pmaps"])
            u16_ok = (stream_u16 == "on"
                      or (stream_u16 == "auto"
                          and jax.default_backend() == "tpu"))
            if u16_ok and not any(
                    f.lower().endswith(".pfm") for f in files):
                emap = np.round(emap * 65535.0).astype(np.uint16)
                pm = np.round(pm * 65535.0).astype(np.uint16)
            loaded.append((i, emap, pm))
        except (FileNotFoundError, ValueError, OSError) as e:
            log(f"[merge_many] item {i} FAILED ({e}); quarantined")

    groups = {}
    for i, emap, pm in loaded:
        groups.setdefault((emap.shape, pm.shape, pm.dtype.str), []).append(
            (i, emap, pm))

    if profile:
        reg_fn, fuse_fn = compiled_merge_staged_batched(cfg, jacobi_kind)
    else:
        fn = compiled_merge_batched(cfg, jacobi_kind)

    def submit(group, start):
        chunk = group[start : start + batch_size]
        n = len(chunk)
        emaps = np.stack([c[1] for c in chunk])
        pmaps = np.stack([c[2] for c in chunk])
        if n < batch_size:  # pad to the compiled batch shape
            emaps = np.concatenate(
                [emaps, np.repeat(emaps[-1:], batch_size - n, 0)])
            pmaps = np.concatenate(
                [pmaps, np.repeat(pmaps[-1:], batch_size - n, 0)])
        t0 = time.monotonic()
        reg_ms = None
        if profile:
            emaps_d, pmaps_d = jnp.asarray(emaps), jnp.asarray(pmaps)
            abcd, pmaps_reg = reg_fn(emaps_d, pmaps_d)
            _host_sync(abcd)
            reg_ms = int((time.monotonic() - t0) * 1000 / n)
            t0 = time.monotonic()
            out_u16 = fuse_fn(emaps_d, pmaps_reg)
        else:
            out_u16, abcd = fn(jnp.asarray(emaps), jnp.asarray(pmaps))
        return chunk, emaps, out_u16, abcd, t0, reg_ms

    def collect(pending):
        chunk, emaps, out_u16, abcd, t0, reg_ms = pending
        out_u16 = np.asarray(jax.device_get(out_u16))
        abcd = np.asarray(jax.device_get(abcd))
        ms = int((time.monotonic() - t0) * 1000 / len(chunk))
        if emaps.dtype == np.uint16:  # undo the streaming quantization
            emaps = emaps.astype(np.float32) / 65535.0
        for j, (i, _, _) in enumerate(chunk):
            it = items[i]
            pio.save_png16(it["out"], out_u16[j])
            res = MergeOutput(out_u16[j], abcd[j], None, reg_ms, ms)
            gt_file = it.get("gt")
            if gt_file and os.path.exists(gt_file):
                gt = pio.load_image01(gt_file)
                res.metrics = pmetrics.paired_metrics(
                    jnp.asarray(gt), jnp.asarray(emaps[j]),
                    jnp.asarray(out_u16[j].astype(np.float32) / 65535.0),
                    align_way=cfg.align_way, cap_depth=cfg.cap_depth,
                    zenith_range=cfg.zenith_range)
                _save_masked_variants(it["out"], out_u16[j], emaps[j],
                                      gt, cfg)
            results[i] = res

    # double-buffered: submit batch k+1 before reading batch k back, so
    # host IO/metrics overlap device compute
    pending = None
    for group in groups.values():
        for start in range(0, len(group), batch_size):
            nxt = submit(group, start)
            if pending is not None:
                collect(pending)
            pending = nxt
    if pending is not None:
        collect(pending)
    return results


def run_batch(
    rgb_folder: str,
    gt_folder: str,
    baseline_folder: str,
    result_folder: str,
    cfg: MergeConfig = MergeConfig(),
    views_folder: str = "test_images",
    dataset: str = "matterport",
    extract_rgb_views: bool = True,
    pmap_ext: str = ".jpg",
    report_every: int = 5,
    log=print,
    limit: Optional[int] = None,
    include: Optional[List[str]] = None,
    exclude: Optional[List[str]] = None,
    shard: Optional[str] = None,
    profile: bool = False,
    manifest: bool = True,
    batch_size: int = 1,
    stream: str = "auto",
    jacobi: str = "auto",
) -> List[pmetrics.Metrics]:
    """Batch driver (CreateDepthPanoramas parity, Main.cpp:329-689).

    Stage A extracts perspective RGB views for every panorama into
    ``views_folder`` (unless disabled); an external or on-TPU depth model is
    expected to turn those into perspective depth maps with the same names;
    stage C merges.  Already-produced results are skipped, making the batch
    resumable at per-panorama granularity (Main.cpp:554-563).

    ``limit``/``include``/``exclude`` are the runtime form of the
    reference's compile-time "only do some / skip certain cases" blocks
    (Main.cpp:357-407).  A ``manifest.json`` records completed and
    quarantined items plus timing for elastic resume.
    """
    rgb_files = pio.filter_files(pio.list_images(rgb_folder),
                                 include, exclude, limit, shard)
    log(f"[run_batch] {len(rgb_files)} RGB panoramas")
    layout = cfg.layout

    stage_a_ms = 0
    if extract_rgb_views and rgb_files:
        os.makedirs(views_folder, exist_ok=True)
        t0 = time.monotonic()
        extract_stage_a(rgb_files, views_folder, cfg, pmap_ext=pmap_ext,
                        batch_size=max(batch_size, 4))
        stage_a_ms = int((time.monotonic() - t0) * 1000)
        log(f"[run_batch] stage A done in {stage_a_ms / 1000:.1f}s")

    os.makedirs(result_folder, exist_ok=True)
    all_metrics: List[pmetrics.Metrics] = []
    reg_times, fusion_times = [], []
    completed, skipped, quarantined = [], [], []

    todo = []
    for i, f in enumerate(rgb_files):
        raw = pio.raw_name(f)
        out_file = os.path.join(result_folder, raw + ".png")
        if os.path.exists(out_file):
            log(f"{i}/{len(rgb_files)} skip!")
            skipped.append(raw)
            continue
        todo.append(dict(
            index=i, raw=raw, out=out_file,
            baseline=pio.baseline_filename(baseline_folder, raw,
                                           result_folder),
            gt=pio.gt_filename(gt_folder, raw, dataset),
            pmaps=pio.pmap_filenames(views_folder, raw, layout, ext=pmap_ext),
        ))

    def record(i, raw, res):
        completed.append(raw)
        if res.time_reg_ms is not None:
            reg_times.append(res.time_reg_ms)
        fusion_times.append(res.time_fusion_ms)
        if res.metrics is not None:
            res.metrics.save(os.path.join(result_folder,
                                          raw + ".aligned.txt"))
            all_metrics.append(res.metrics)
            res.metrics.print()
        if all_metrics and (i == len(rgb_files) - 1
                            or (i > 0 and i % report_every == 0)):
            _rolling_report(all_metrics, reg_times, fusion_times, log)

    if batch_size > 1:
        results = merge_many(todo, cfg, batch_size=batch_size, log=log,
                             profile=profile, stream_u16=stream,
                             jacobi_kind=jacobi)
        for it, res in zip(todo, results):
            if res is None:
                quarantined.append({"name": it["raw"], "error": "load/merge"})
            else:
                record(it["index"], it["raw"], res)
    else:
        for it in todo:
            i, raw = it["index"], it["raw"]
            try:
                res = merge_depth_maps(it["baseline"], it["pmaps"], it["out"],
                                       cfg, it["gt"], profile=profile,
                                       jacobi_kind=jacobi)
            except (FileNotFoundError, ValueError, OSError) as e:
                log(f"{i}/{len(rgb_files)} FAILED ({e}); quarantined, "
                    "continuing")
                quarantined.append({"name": raw, "error": str(e)})
                continue
            record(i, raw, res)
    if manifest:
        import json

        # per-shard manifests: N fleet shards writing one shared
        # result_folder must not last-writer-clobber each other's
        # completed/quarantine records
        mname = ("manifest.json" if shard is None
                 else f"manifest.{shard.replace('/', '-of-')}.json")
        with open(os.path.join(result_folder, mname), "w") as fp:
            json.dump({
                "completed": completed,
                "skipped": skipped,
                "quarantined": quarantined,
                "time_reg_ms": reg_times,
                "time_fusion_ms": fusion_times,
                "stage_a_ms": stage_a_ms,
                "config": {"layout": cfg.layout_name,
                           "out_width": cfg.out_width},
            }, fp, indent=1)
    return all_metrics


def _rolling_report(ms: List[pmetrics.Metrics], reg, fus, log):
    """Rolling averages in the reference's report shape (Main.cpp:608-684)."""
    n = len(ms)
    avg = lambda f: sum(f(m) for m in ms) / n
    log("-" * 10)
    log(
        f"RMSE_given:{avg(lambda m: math.sqrt(m.mse_given)):.6f}"
        f" RMSE_result:{avg(lambda m: math.sqrt(m.mse_result)):.6f}"
        f" MAE_given:{avg(lambda m: m.mae_given):.6f}"
        f" MAE_result_avg:{avg(lambda m: m.mae_result):.6f}"
        f" MRE_given:{avg(lambda m: m.mre_given):.6f}"
        f" MRE_result_avg:{avg(lambda m: m.mre_result):.6f}"
        f" RMSElog_given:{avg(lambda m: math.sqrt(m.mselog_given)):.6f}"
        f" RMSElog_result:{avg(lambda m: math.sqrt(m.mselog_result)):.6f}"
        f" delta1_given:{avg(lambda m: m.delta1_given):.6f}"
        f" delta1_result:{avg(lambda m: m.delta1_result):.6f}"
        f" delta2_given:{avg(lambda m: m.delta2_given):.6f}"
        f" delta2_result:{avg(lambda m: m.delta2_result):.6f}"
        f" delta3_given:{avg(lambda m: m.delta3_given):.6f}"
        f" delta3_result:{avg(lambda m: m.delta3_result):.6f}"
    )
    reg_avg = (f"{sum(reg) / len(reg):.1f}" if reg
               else "n/a (fused graph; use --profile)")
    if fus:
        log(f"time_Reg_avg:{reg_avg}"
            f" time_Laplacian_avg:{sum(fus) / len(fus):.1f}")
    log("-" * 10)
