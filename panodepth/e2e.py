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
    """Next multiple of 32 (the CNN stride granularity), rounding UP:
    15-view leres layouts at view width 256 extract (247, 256) views, and
    inference at 256x256 — the models' training resolution — beats
    downscaling to 224x256 (6-scene held-out CLI proof: mean fused RMSE
    0.011034 vs 0.011113, all six scenes improving either way)."""
    return max(32, -(-v // 32) * 32)


def _as01_img(x):
    """On-device normalization of streamed integer images (uint8 RGB from
    JPEG/8-bit PNG, uint16 baselines) to f32 0~1.  Matches the host
    decoder's k/255 and k/65535 up to 1 f32 ulp (XLA divides by
    reciprocal-multiply), same caveat as pipeline._as01."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) / 65535.0
    return x


def _resolve_extract_dtype(mode: str, dtype, on_tpu: bool) -> str:
    """"auto" resolves per traced input dtype; >8-bit inputs (16-bit PNG,
    PFM) keep the full-precision f32 path rather than being silently
    quantized to 8 bits per channel.

    For uint8 sources on TPU, "auto" picks **pair16** (RGB565 pixel-pair
    u32 tables: ONE gather serves both horizontal bilinear taps — half
    the gather count of packed, +11.5 % e2e).  The 5/6/5 quantization was
    re-adjudicated after the corrupt-hardened NF perspective shipped
    (r5): the 12-scene held-out CLI proof improved 12/12 with fused means
    equal-or-better than packed (v1 0.011584 vs 0.011672, v2 0.011372 vs
    0.011362 — `docs/logs_r5/pair16_nf_proof.txt`; the r4 rejection's
    noise-sensitive scene now improves −4.8 %).  Same precedent as the
    approx-p99 default: accuracy-proofed, not bit-exact — pass
    ``--extract-dtype packed`` for the exact-u8 gather table."""
    if mode == "auto":
        return "pair16" if on_tpu and dtype == jnp.uint8 else "f32"
    return mode


def full_pipeline(rgb, persp_model: PerspectiveDepthNet, persp_params,
                  base_model: Optional[PanoBaselineNet] = None,
                  base_params=None, baseline=None,
                  cfg: MergeConfig = MergeConfig(), view_width: int = 512,
                  jacobi_fn=None, base_w: int = 512):
    """RGB equirect (H, W, 3) -> (u16 (out_h, out_w), abcd, baseline, pmaps).

    Either a panoramic baseline model (+params) or a precomputed ``baseline``
    array must be given.  ``view_width`` controls the perspective inference
    resolution (snapped to multiples of 32 for the CNN strides); the
    baseline CNN runs at ``base_w`` (its training width), matching
    :func:`build_batched_e2e`'s treatment.
    """
    # integer panoramas arrive as raw 0..255/0..65535 — both CNNs were
    # trained on 0~1 floats
    rgb = _as01_img(rgb)
    if baseline is None:
        rb = jax.image.resize(rgb, (base_w // 2, base_w, 3), "bilinear")
        baseline = base_model.apply(base_params, rb[None])[0]

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


def load_model_checkpoint(ckpt_path: str, norm_dtype=None,
                          quantize: bool = False):
    """Rebuild a model + params from a train_cli checkpoint + arch sidecar.

    Looks for ``<model>.config.json`` next to the checkpoint directory (the
    sidecar train_cli writes).  Returns (model, params, arch_dict).

    ``norm_dtype`` overrides the GroupNorm compute dtype (params are f32
    either way, so any checkpoint loads).  ``jnp.bfloat16`` halves the
    normalization layers' HBM traffic — the nets' actual TPU bottleneck —
    at no measured accuracy cost (held-out RMSE 0.029440 f32 vs 0.029437
    bf16 on the zoo perspective weights); the e2e drivers pass it on TPU.

    ``quantize=True`` (GN perspective checkpoints only) converts the
    trained f32 convs to int8 PTQ (models.quantize) and returns the
    ``quantized=True`` inference graph — the int8 MXU path.
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
    kw = {} if norm_dtype is None else {"norm_dtype": norm_dtype}
    if quantize and not (kind == "perspective"
                         and arch.get("variant", "gn") == "gn"):
        raise ValueError("int8 PTQ supports GN perspective checkpoints "
                         f"only, got {kind}/{arch.get('variant', 'gn')}")
    if kind == "perspective":
        cls = PerspectiveDepthNet
        if arch.get("variant", "gn") == "nf":
            from .models.perspective import NFPerspectiveNet as cls
        model = cls(
            widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
            decoder_width=max(16, int(128 * s)), **kw)
        sample = jnp.zeros((1, arch.get("view_size", 256),
                            arch.get("view_size", 256), 3))
    elif kind == "hohonet":
        model = HorizonDepthNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            horizon_dim=max(32, int(256 * s)), **kw)
        pw = arch.get("pano_width", 512)
        sample = jnp.zeros((1, pw // 2, pw, 3))
    elif kind == "bifuse":
        from .models.bifuse import BiFuseNet

        # same checkpoint, TPU-fast projection graph (nearest-tap feature
        # gathers) — A/B'd via env until the proof flips the default
        proj = os.environ.get("PANODEPTH_BIFUSE_PROJ", "bilinear")
        model = BiFuseNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            proj=proj, **kw)
        pw = arch.get("pano_width", 512)
        sample = jnp.zeros((1, pw // 2, pw, 3))
    elif kind == "slicenet":
        from .models.slicenet import SliceNet

        model = SliceNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            slice_dim=max(32, int(256 * s)), **kw)
        pw = arch.get("pano_width", 512)
        sample = jnp.zeros((1, pw // 2, pw, 3))
    elif kind == "fastpano":
        from .models.fastpano import FastPanoNet

        model = FastPanoNet(
            widths=tuple(max(8, int(w * s)) for w in (48, 96, 192, 384)),
            decoder_width=max(16, int(96 * s)), **kw)
        pw = arch.get("pano_width", 512)
        sample = jnp.zeros((1, pw // 2, pw, 3))
    else:
        cls = PanoBaselineNet
        if arch.get("variant", "gn") == "nf":
            from .models.panoramic import NFPanoBaselineNet as cls
        if cls is PanoBaselineNet:
            kw["proj"] = os.environ.get("PANODEPTH_PANO_PROJ", "bilinear")
        model = cls(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            **kw)
        pw = arch.get("pano_width", 512)
        sample = jnp.zeros((1, pw // 2, pw, 3))

    if is_npz:
        # shapes-only template: the npz loader needs tree structure and
        # leaf shapes, so eval_shape avoids compiling (and on tunneled
        # backends, remotely executing) a throwaway init graph
        template = jax.eval_shape(
            functools.partial(model.init, jax.random.PRNGKey(0)), sample)
        params = ptrain.load_params_npz(ckpt_path, template)
    else:
        tx = ptrain.make_optimizer()
        template = ptrain.init_state(model, jax.random.PRNGKey(0), sample, tx)
        params = ptrain.restore_checkpoint(ckpt_path, template).params
    if quantize:
        from .models.quantize import quantize_perspective_params

        model = model.clone(quantized=True)
        params = quantize_perspective_params(params)
    return model, params, arch


def build_batched_e2e(persp_model, persp_params, cfg: MergeConfig,
                      view_width: int = 512, base_model=None,
                      base_params=None, base_w: int = 512, mesh=None,
                      extract_dtype: str = "auto", jacobi_kind: str = "auto"):
    """Batched device graphs for the on-device model mode.

    Returns ``(jit_full, jit_models, jit_fuse)`` over (B, H, W, 3) RGB
    stacks (plus a (B, h, w) baseline stack when ``base_model`` is None):

    - ``jit_models(rgbs[, baselines]) -> (baselines, pmaps)`` — panoramic
      baseline CNN + perspective view extraction + perspective depth CNN,
      every view of every panorama in the batch through one CNN launch per
      view-shape group.
    - ``jit_fuse(baselines, pmaps) -> (out_u16, abcd)`` — vmapped
      registration + multiresolution fusion.
    - ``jit_full`` — both stages in a single graph (the fast path).

    The reference runs this per panorama across two process boundaries
    (GL views to disk, external CNN, merge; Main.cpp:438-516); here B
    panoramas share one device graph and no pixels leave the device.

    With ``mesh`` (a (dp, sp) :func:`panodepth.parallel.mesh.make_mesh`
    mesh) the batch axis of every input and output is sharded over ``dp``
    — CNNs, registration, and fusion are all per-panorama, so the whole
    e2e graph scales data-parallel with zero collectives on the forward
    path.  B must then be divisible by the dp size.

    ``extract_dtype`` — "auto"/"packed"/"packed16"/"pair16"/"bf16"/"f32":
    representation of
    the RGB fed to the view-extraction gathers, which are HBM-bandwidth-
    bound.  "packed" gathers one u32 per bilinear tap from a
    :func:`..ops.sampling.pack_rgb_u32` table — a quarter of the f32
    bytes and one gather instead of a 3-channel one (12.1 -> 4.7 ms/pano
    measured on the v5e), *exact* for 8-bit sources but quantizing for
    anything wider; "packed16" goes further — an RGB565 u16 table, half
    the gathered bytes again, but quantizes the CNN's RGB input to 5/6/5
    bits per channel (opt-in: accuracy must be A/B'd per model);
    "pair16" keeps the RGB565 quantization but packs each pixel PAIR
    (x, x+1 wrapped) into one u32 (`pack_rgb565_pair_u32`) so one gather
    serves both horizontal bilinear taps — HALF the gather count, the
    axis the byte-narrowing modes can't touch; "bf16"
    halves the bytes instead (~8-bit mantissa,
    6.4 ms/pano).  The baseline-CNN resize runs in bf16 under either
    (both CNNs cast to bf16 internally anyway).  "auto" = packed on TPU
    when the traced RGB input is uint8 (streamed 8-bit sources, where
    packing is exact), f32 otherwise — so >8-bit panoramas (16-bit PNG,
    PFM) are never silently quantized; pass "packed" explicitly to trade
    precision for bandwidth on such sources.  Registration and fusion
    are untouched (f32 everywhere).
    """
    from .ops.projection import extract_view
    from .pipeline import _resolve_jacobi

    # the Pallas fused-iteration kernel on TPU (self-falls-back to the
    # jnp Jacobi elsewhere) — same "auto" policy as the file-based driver
    jacobi_fn = _resolve_jacobi(jacobi_kind)
    layout = cfg.layout
    plan = build_fusion_plan(cfg)
    shapes = [view_shape(layout.fovs[i], view_width)
              for i in range(layout.num_views)]
    grouped = {}
    for i, s in enumerate(shapes):
        grouped.setdefault(s, []).append(i)
    ngroups = list(grouped.items())

    on_tpu = jax.default_backend() == "tpu"

    def models_stage(pparams, bparams, rgbs, baselines=None):
        import os

        from .ops.sampling import (pack_rgb_u32,
                                   sample_equirect_bilinear_packed)

        ex_mode = _resolve_extract_dtype(extract_dtype, rgbs.dtype, on_tpu)
        rgbs01 = _as01_img(rgbs)
        if baselines is None:
            feed = os.environ.get("PANODEPTH_BASE_FEED", "bilinear")
            b_, h_, w_, _ = rgbs.shape
            if (feed == "box" and rgbs.dtype == jnp.uint8
                    and h_ % (base_w // 2) == 0 and w_ % base_w == 0):
                # integer-factor box downsample straight from the streamed
                # uint8 (one reshape-mean; reads 1/4 the bytes of the
                # f32 bilinear feed and skips the full-res 0~1
                # materialization) — A/B'd vs the anti-aliased bilinear
                # feed before any default flip (a rect vs triangle
                # filter difference at 4x reduction)
                fh, fw = h_ // (base_w // 2), w_ // base_w
                rb = rgbs.reshape(b_, base_w // 2, fh, base_w, fw, 3)
                rb = (rb.astype(jnp.float32).mean((2, 4)) / 255.0)
                rb = rb.astype(jnp.bfloat16)
            else:
                rb_src = (rgbs01 if ex_mode == "f32"
                          else rgbs01.astype(jnp.bfloat16))
                rb = jax.vmap(lambda r: jax.image.resize(
                    r, (base_w // 2, base_w, 3), "bilinear"))(rb_src)
            baselines = base_model.apply(bparams, rb)
        else:
            baselines = _as01_img(baselines)
        sampler = None
        if ex_mode == "packed":
            # pack straight from uint8 when streaming (skips the f32 trip)
            src = jax.vmap(pack_rgb_u32)(
                rgbs if rgbs.dtype == jnp.uint8 else rgbs01)
            sampler = sample_equirect_bilinear_packed
        elif ex_mode == "packed16":
            from .ops.sampling import (pack_rgb565_u16,
                                       sample_equirect_bilinear_packed565)

            src = jax.vmap(pack_rgb565_u16)(
                rgbs if rgbs.dtype == jnp.uint8 else rgbs01)
            sampler = sample_equirect_bilinear_packed565
        elif ex_mode in ("pair16", "pair16d"):
            from .ops.sampling import (pack_rgb565_pair_u32,
                                       sample_equirect_bilinear_packed565pair)

            pack = functools.partial(pack_rgb565_pair_u32,
                                     dither=ex_mode == "pair16d")
            src = jax.vmap(pack)(
                rgbs if rgbs.dtype == jnp.uint8 else rgbs01)
            sampler = sample_equirect_bilinear_packed565pair
        elif ex_mode == "bf16":
            src = rgbs01.astype(jnp.bfloat16)
        else:
            src = rgbs01
        b = rgbs.shape[0]
        pmaps = [None] * layout.num_views
        for (h, w), idxs in ngroups:
            fovs = jnp.asarray(np.stack([layout.fovs[i] for i in idxs]),
                               jnp.float32)
            one = lambda r, f: extract_view(r, f, view_width, (h, w),
                                            sampler=sampler)
            views = jax.vmap(jax.vmap(one, in_axes=(None, 0)),
                             in_axes=(0, None))(src, fovs)
            flat = views.reshape(b * len(idxs), h, w, 3)
            nh, nw = _round32(h), _round32(w)
            if (nh, nw) != (h, w):
                flat = jax.image.resize(flat, (flat.shape[0], nh, nw, 3),
                                        "bilinear")
            depths = predict_depth01(pparams, persp_model, flat)
            if (nh, nw) != (h, w):
                depths = jax.image.resize(depths, (depths.shape[0], h, w),
                                          "bilinear")
            depths = depths.reshape(b, len(idxs), h, w)
            for j, i in enumerate(idxs):
                pmaps[i] = depths[:, j]
        return baselines, pmaps

    def fuse_stage(baselines, pmaps):
        def one(e, p):
            abcd = registration.register_views(e, p, cfg)
            out_u16, _ = fuse(e, p, plan, jacobi_fn=jacobi_fn, abcd=abcd)
            return out_u16, abcd

        return jax.vmap(one)(baselines, pmaps)

    def full(pparams, bparams, *args):
        baselines, pmaps = models_stage(pparams, bparams, *args)
        out_u16, _ = fuse_stage(baselines, pmaps)
        return out_u16, baselines

    # The model params are jit ARGUMENTS, not baked-in constants: the
    # compiled graph (and the persistent compilation-cache entry) is then
    # shared by every checkpoint of the same architecture — swapping
    # weights costs zero recompiles, which matters doubly on tunneled
    # backends where remote compiles take minutes.  The returned callables
    # keep the rgbs[, baselines]-only signature.
    if mesh is None:
        jfull, jmodels = jax.jit(full), jax.jit(models_stage)
        jfuse = jax.jit(fuse_stage)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # batch-axis sharding as a pytree prefix for every data
        # argument/result (rgbs, baselines, per-view pmap lists, u16
        # outputs); params replicate
        dp = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        # arity: (pparams, bparams, rgbs[, baselines]) — a baselines stack
        # is passed exactly when there is no baseline model
        in_sh = (repl, repl) + (dp,) * (1 if base_model is not None else 2)
        jfull = jax.jit(full, in_shardings=in_sh, out_shardings=dp)
        jmodels = jax.jit(models_stage, in_shardings=in_sh,
                          out_shardings=dp)
        jfuse = jax.jit(fuse_stage, in_shardings=dp, out_shardings=dp)
        # commit the params to the replicated sharding ONCE: jit does not
        # cache argument resharding, so passing host/single-device trees
        # would re-broadcast every checkpoint byte across the mesh on
        # every call
        persp_params = jax.device_put(persp_params, repl)
        if base_params is not None:
            base_params = jax.device_put(base_params, repl)
    return (lambda *a: jfull(persp_params, base_params, *a),
            lambda *a: jmodels(persp_params, base_params, *a),
            jfuse)


def run_batch_e2e(rgb_folder: str, gt_folder: str, result_folder: str,
                  persp_ckpt: str, cfg: MergeConfig = MergeConfig(),
                  baseline_ckpt=None, baseline_folder=None,
                  dataset: str = "matterport", view_width=None,
                  limit=None, include=None, exclude=None, shard=None,
                  profile: bool = False, batch_size: int = 1,
                  stream: str = "auto", jacobi: str = "auto",
                  extract_dtype: str = "auto", infer_norm: str = "auto",
                  persp_int8: bool = False, base_width=None,
                  latency: bool = False, latency_halo: int = 10,
                  log=print):
    """Fully on-device batch: RGB -> models -> registration -> fusion.

    The perspective model is mandatory; the panoramic baseline comes either
    from a second checkpoint or from baseline files on disk (reference
    conventions).  Outputs and metrics match run_batch's contract.

    Production-shaped like the file-based driver: ``batch_size`` panoramas
    run per device launch (one graph for the whole batch — CNNs, vmapped
    registration and fusion); decode of the next item overlaps device
    compute (double-buffered submits) and PNG writes go to a writer
    thread.  A batch flushes early when the input shape changes, so
    mixed-size folders work at a recompile cost.  The last chunk is padded
    to the compiled batch shape by repetition and the padding discarded.

    With ``profile`` the models and registration+fusion run as two
    separately-timed graphs (host-synced between), mirroring the
    reference's time_Reg / time_Laplacian split (Main.cpp:667-681); the
    per-item splits are logged and a batch-average summary is printed at
    the end (the reference's rolling-averages analog).  Returns the list
    of per-item :class:`panodepth.metrics.Metrics` (gt-scored items only).

    ``stream`` — "on"/"off"/"auto": transfer integer-source inputs to the
    device in their native width (uint8 RGB = quarter, uint16 baselines =
    half the host->device bytes) and normalize on-device.  "auto" enables
    it only on TPU where the tunnel transfer dominates; the on-device
    k/255 and k/65535 can differ from the host's by 1 f32 ulp (same
    caveat as merge_many's stream_u16).

    ``extract_dtype`` — forwarded to :func:`build_batched_e2e` (view-
    extraction gather representation; see there for the precision rules).

    ``infer_norm`` — "auto"/"f32"/"bf16": GroupNorm compute dtype for the
    CNNs (see :func:`load_model_checkpoint`).  "auto" = bf16 on TPU (where
    the norms' HBM traffic is the CNN bottleneck: +24% perspective-net
    throughput, no measured accuracy change), f32 elsewhere.

    ``persp_int8`` — run the perspective CNN as the int8 PTQ graph
    (models.quantize: per-channel int8 weights, dynamic activation
    quantization on the int8 MXU path).  GN perspective checkpoints only.

    ``latency`` — single-request mode: each panorama's 15-view fan-out is
    sharded over ALL devices via the view-parallel graph
    (:func:`panodepth.parallel.views.build_latency_e2e`) instead of
    batching panoramas; ``batch_size`` is then ignored.  Use when request
    latency matters more than fleet throughput (requires a uniform-shape
    layout; ``latency_halo`` = temporal-blocking depth of the
    width-sharded Jacobi's halo exchanges).
    """
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    from . import io as pio
    from . import metrics as pmetrics

    if infer_norm == "auto":
        infer_norm = "bf16" if jax.default_backend() == "tpu" else "f32"
    norm_dtype = jnp.bfloat16 if infer_norm == "bf16" else None
    persp_model, persp_params, persp_arch = load_model_checkpoint(
        persp_ckpt, norm_dtype=norm_dtype, quantize=persp_int8)
    if view_width is None:
        # run the perspective CNN at its training resolution by default —
        # on the zoo weights this is the difference between 4/6 and 6/6
        # held-out scenes improving over their baseline (see zoo/README.md)
        view_width = persp_arch.get("view_size", 512)
    base_model = base_params = None
    base_w = 512
    if baseline_ckpt:
        base_model, base_params, base_arch = load_model_checkpoint(
            baseline_ckpt, norm_dtype=norm_dtype)
        # fixed-width families (hohonet's column decoder) must run at their
        # training resolution; the fully-conv families accept overrides
        # (e.g. --base-width 256 quarters the baseline CNN's cost — the
        # fused output re-imposes the views' detail either way; accuracy
        # must be proofed per deployment)
        base_w = base_width or base_arch.get("pano_width", 512)
        if base_width and base_arch.get("model") in ("hohonet", "slicenet"):
            raise SystemExit(f"--base-width: {base_arch['model']} has a "
                             f"fixed-width decoder; run it at its training "
                             f"width {base_arch.get('pano_width', 512)}")

    if latency:
        from .parallel.views import build_latency_e2e, make_vp_mesh

        mesh_vp = make_vp_mesh()
        if batch_size != 1:
            log("[run_batch_e2e] --latency runs one panorama per launch; "
                "ignoring --batch-size")
        if jacobi not in ("auto", "pallas"):
            log("[run_batch_e2e] --latency always relaxes with the "
                "width-sharded Jacobi; ignoring --jacobi")
        if profile:
            log("[run_batch_e2e] --latency profiles whole-graph ms only "
                "(the sharded stages fuse; no per-stage split)")
        lat_cache = {}

        def lat_fn_for(baseline_np):
            key = (None if base_model is not None
                   else tuple(baseline_np.shape[:2]))
            if key not in lat_cache:
                lat_cache[key] = build_latency_e2e(
                    persp_model, persp_params, cfg, mesh_vp,
                    view_width=view_width, base_model=base_model,
                    base_params=base_params, base_w=base_w,
                    baseline_shape=key, extract_dtype=extract_dtype,
                    halo=latency_halo)
            return lat_cache[key]
    else:
        jit_full, jit_models, jit_fuse = build_batched_e2e(
            persp_model, persp_params, cfg, view_width=view_width,
            base_model=base_model, base_params=base_params, base_w=base_w,
            jacobi_kind=jacobi, extract_dtype=extract_dtype)

    rgb_files = pio.filter_files(pio.list_images(rgb_folder),
                                 include, exclude, limit, shard)
    os.makedirs(result_folder, exist_ok=True)
    log(f"[run_batch_e2e] {len(rgb_files)} panoramas, on-device models, "
        + (f"view-parallel latency mode over {len(jax.devices())} devices"
           if latency else f"batch {batch_size}")
        + (", profiled stages" if profile else ""))

    stream_on = (stream == "on"
                 or (stream == "auto" and jax.default_backend() == "tpu"))

    def load_streamed(f):
        """Decode keeping the source integer width when streaming."""
        if stream_on:
            r = pio.load_image_int(f)
            if r is not None:
                return r[0]
        return pio.load_image01(f).astype(np.float32)

    def decode(f):
        raw = pio.raw_name(f)
        rgb_np = load_streamed(f)
        if rgb_np.ndim == 2:
            rgb_np = np.stack([rgb_np] * 3, -1)
        rgb_np = rgb_np[..., :3]
        baseline_np = None
        if base_model is None:
            bfile = pio.baseline_filename(baseline_folder, raw,
                                          result_folder)
            baseline_np = load_streamed(bfile)
            if baseline_np.ndim == 3:
                baseline_np = baseline_np[..., 0]
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
    models_times, fuse_times = [], []
    pool = ThreadPoolExecutor(max_workers=2)
    writes = []

    if latency:
        # serial per-panorama loop (the whole mesh works on one request);
        # decode of the next item still overlaps device compute
        times = []
        try:
            nxt = pool.submit(decode, todo[0][1]) if todo else None
            for k, (i, f, raw) in enumerate(todo):
                rgb_np, baseline_np, gt = nxt.result()
                nxt = (pool.submit(decode, todo[k + 1][1])
                       if k + 1 < len(todo) else None)
                fn = lat_fn_for(baseline_np)
                fargs = (jnp.asarray(rgb_np),)
                if base_model is None:
                    fargs += (jnp.asarray(baseline_np),)
                t0 = time.monotonic()
                out_u16, _, emap = fn(*fargs)
                out_np = np.asarray(jax.device_get(out_u16))
                base_np = np.asarray(jax.device_get(emap))
                ms = int((time.monotonic() - t0) * 1000)
                times.append(ms)
                out_file = os.path.join(result_folder, raw + ".png")
                writes.append(pool.submit(pio.save_png16, out_file, out_np))
                if gt is not None:
                    m = pmetrics.paired_metrics(
                        jnp.asarray(gt), jnp.asarray(base_np),
                        jnp.asarray(out_np.astype(np.float32) / 65535.0),
                        align_way=cfg.align_way, cap_depth=cfg.cap_depth,
                        zenith_range=cfg.zenith_range)
                    m.save(os.path.join(result_folder,
                                        raw + ".aligned.txt"))
                    m.print()
                    all_metrics.append(m)
                if profile:
                    log(f"{i}/{len(rgb_files)} {raw}: latency e2e {ms} ms")
            for wjob in writes:
                wjob.result()
        finally:
            pool.shutdown(wait=True)
        if times:
            log(f"[run_batch_e2e] done: {len(times)} panoramas, "
                f"time_e2e_avg:{np.mean(times):.1f} (view-parallel)")
        return all_metrics

    def submit(chunk):
        """chunk: list of (i, raw, rgb_np, baseline_np, gt)."""
        n = len(chunk)
        rgbs = np.stack([c[2] for c in chunk])
        if n < batch_size:  # pad to the compiled batch shape
            rgbs = np.concatenate(
                [rgbs, np.repeat(rgbs[-1:], batch_size - n, 0)])
        args = (jnp.asarray(rgbs),)
        if base_model is None:
            bases = np.stack([c[3] for c in chunk])
            if n < batch_size:
                bases = np.concatenate(
                    [bases, np.repeat(bases[-1:], batch_size - n, 0)])
            args += (jnp.asarray(bases),)
        t0 = time.monotonic()
        models_ms = None
        if profile:
            baselines, pmaps = jit_models(*args)
            float(pmaps[0][0, 0, 0])       # host sync (axon-safe)
            models_ms = int((time.monotonic() - t0) * 1000 / n)
            t0 = time.monotonic()
            out_u16, _ = jit_fuse(baselines, pmaps)
        else:
            out_u16, baselines = jit_full(*args)
        return chunk, out_u16, baselines, t0, models_ms

    def collect(pending):
        chunk, out_u16, baselines, t0, models_ms = pending
        out_np = np.asarray(jax.device_get(out_u16))
        bases_np = np.asarray(jax.device_get(baselines))
        fuse_ms = int((time.monotonic() - t0) * 1000 / len(chunk))
        if models_ms is not None:
            models_times.extend([models_ms] * len(chunk))
        fuse_times.extend([fuse_ms] * len(chunk))
        for j, (i, raw, _, _, gt) in enumerate(chunk):
            out_file = os.path.join(result_folder, raw + ".png")
            writes.append(pool.submit(pio.save_png16, out_file, out_np[j]))
            if gt is not None:
                m = pmetrics.paired_metrics(
                    jnp.asarray(gt), jnp.asarray(bases_np[j]),
                    jnp.asarray(out_np[j].astype(np.float32) / 65535.0),
                    align_way=cfg.align_way, cap_depth=cfg.cap_depth,
                    zenith_range=cfg.zenith_range)
                m.save(os.path.join(result_folder, raw + ".aligned.txt"))
                m.print()
                all_metrics.append(m)
            if profile:
                log(f"{i}/{len(rgb_files)} {raw}: models {models_ms} ms, "
                    f"reg+fusion {fuse_ms} ms")

    pending = None
    batch = []
    cur_shape = None
    try:
        nxt = pool.submit(decode, todo[0][1]) if todo else None
        for k, (i, f, raw) in enumerate(todo):
            rgb_np, baseline_np, gt = nxt.result()
            nxt = (pool.submit(decode, todo[k + 1][1])
                   if k + 1 < len(todo) else None)
            shape = (rgb_np.shape, rgb_np.dtype.str,
                     None if baseline_np is None
                     else (baseline_np.shape, baseline_np.dtype.str))
            if batch and (shape != cur_shape or len(batch) == batch_size):
                prev = submit(batch)
                if pending is not None:
                    collect(pending)
                pending = prev
                batch = []
            cur_shape = shape
            batch.append((i, raw, rgb_np, baseline_np, gt))
        if batch:
            prev = submit(batch)
            if pending is not None:
                collect(pending)
            pending = prev
        if pending is not None:
            collect(pending)
        for wjob in writes:
            wjob.result()
    finally:
        pool.shutdown(wait=True)
    if fuse_times:
        split = (f"time_Models_avg:{np.mean(models_times):.1f} "
                 if models_times else
                 "time_Models_avg:n/a (fused graph; use --profile) ")
        log(f"[run_batch_e2e] done: {len(fuse_times)} panoramas, "
            + split
            + f"time_Fuse_avg:{np.mean(fuse_times):.1f}")
    return all_metrics
