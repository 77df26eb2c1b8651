"""Training driver: ``python -m panodepth.train_cli <model> rgb/ gt/ ckpt/``.

Trains either model family on a panorama dataset laid out with the
reference's folder conventions, data-parallel over all local devices, with
orbax checkpointing and resumable state.  New surface (the reference's CNNs
are external, reference Main.cpp:465-474); kept deliberately small — the
model definitions, losses, and sharded step live in
:mod:`panodepth.models.train`.
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser(prog="panodepth-train")
    p.add_argument("model", choices=["perspective", "panoramic", "hohonet",
                                     "bifuse", "slicenet", "fastpano"])
    p.add_argument("rgb_folder")
    p.add_argument("gt_folder")
    p.add_argument("ckpt_dir")
    p.add_argument("--dataset", default="matterport")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--view-size", type=int, default=256)
    p.add_argument("--pano-width", type=int, default=512)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"])
    p.add_argument("--width-scale", type=float, default=1.0,
                   help="scale model widths (quick experiments)")
    p.add_argument("--variant", default="gn", choices=["gn", "nf"],
                   help="perspective architecture variant: gn = GroupNorm "
                        "(default), nf = normalizer-free (weight-"
                        "standardized convs; no activation-stats HBM "
                        "traffic at inference — see models/perspective.py "
                        "NFPerspectiveNet)")
    p.add_argument("--synth", action="store_true",
                   help="train on procedurally generated scenes rendered "
                        "on-device (rgb/gt folders are ignored; see "
                        "panodepth.synth)")
    p.add_argument("--synth-version", default="v1",
                   choices=["v1", "v2", "mix"],
                   help="scene distribution for --synth (v2 adds L-rooms, "
                        "corridors, cylinders, point lights; mix = 35%% "
                        "v1 / 65%% v2)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init-from", default=None,
                   help="initialize params from an existing checkpoint "
                        "(orbax dir or .params.npz) — e.g. fine-tune at a "
                        "larger --view-size; optimizer state starts fresh")
    p.add_argument("--distill-from", default=None, metavar="CKPT",
                   help="distillation teacher checkpoint (any family with "
                        "the same input kind): the loss adds "
                        "--distill-weight x the depth loss against the "
                        "teacher's stop-gradient prediction on each batch "
                        "(models/train.py make_train_step)")
    p.add_argument("--distill-weight", type=float, default=0.5)
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of three steady-state "
                        "steps into DIR (xprof/tensorboard format; process "
                        "0 only) — same surface as the merge CLI's --trace")
    p.add_argument("--eval-every", type=int, default=0, metavar="N",
                   help="every N steps, score a FIXED held-out batch set "
                        "(drawn once from a disjoint seed) and log "
                        "val_loss — with --ema, the EMA weights are "
                        "scored too (quantifies the smoothing win)")
    p.add_argument("--eval-batches", type=int, default=2,
                   help="number of held-out batches for --eval-every")
    p.add_argument("--metrics-out", default=None, metavar="FILE",
                   help="append one JSON line per logged step / eval "
                        "(structured training observability; process 0 "
                        "only)")
    p.add_argument("--augment", action="store_true",
                   help="geometry-correct train-time augmentation on file "
                        "datasets: horizontal flip + photometric gain, plus "
                        "circular azimuth rolls for panoramic batches "
                        "(--synth scenes are unlimited and skip this)")
    p.add_argument("--corrupt", action="store_true",
                   help="camera-pipeline corruption of the RGB inputs "
                        "(JPEG artifacts + sensor noise + exposure jitter, "
                        "ops/corrupt.py) — hardens the models against the "
                        "reference's real-photo JPEG inputs "
                        "(Main.cpp:320); runs on-device, targets untouched")
    p.add_argument("--corrupt-prob", type=float, default=1.0, metavar="S",
                   help="with --corrupt: scale the per-stage application "
                        "probabilities (p_jpeg/p_noise/p_photo) by S — "
                        "S=0.5 leaves ~half the stream clean, trading "
                        "robustness gain against clean-set regression "
                        "(the r4 full-strength fine-tune cost 4.3%% clean "
                        "v1 RMSE)")
    p.add_argument("--ema", type=float, default=None, metavar="DECAY",
                   help="track an exponential moving average of the params "
                        "(e.g. 0.999) inside the optimizer state; the final "
                        "checkpoint additionally writes "
                        "<model>_final.ema.params.npz — the smoother "
                        "weights usually evaluate better than the raw ones")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted run: restore the FULL "
                        "train state (params + optimizer moments + step) "
                        "from the newest checkpoint in ckpt_dir and pick "
                        "up at the saved step (crash recovery; also "
                        "extends a finished run when --steps is raised)")
    p.add_argument("--debug-nans", action="store_true",
                   help="abort on the first NaN inside any jitted graph")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations in the backward pass "
                        "(jax.checkpoint): ~1 extra forward per step for "
                        "a much smaller activation footprint — use when "
                        "a larger --batch-size/--width-scale OOMs")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host training: jax.distributed coordinator "
                        "address; run one process per host with matching "
                        "--num-processes/--process-id. --batch-size is the "
                        "GLOBAL batch; each host loads its slice, gradients "
                        "psum over ICI/DCN (see parallel/multihost.py)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def _latest_checkpoint(ckpt_path: str):
    """Newest full-state checkpoint dir under ``<ckpt_path>_<tag>``.

    Ranked by save time (mtime), NOT by tag: ranking ``final`` above
    numbered tags would roll a preempted run-extension back to the stale
    ``final`` of the previous run.  The numeric tag breaks mtime ties
    (within one run a later save is a later step).
    """
    import glob

    best = None
    for p in glob.glob(ckpt_path + "_*"):
        tag = p[len(ckpt_path) + 1:]
        if not os.path.isdir(p) or not (tag == "final" or tag.isdigit()):
            continue
        rank = (os.path.getmtime(p),
                float("inf") if tag == "final" else int(tag))
        if best is None or rank > best[0]:
            best = (rank, p)
    return None if best is None else best[1]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from .models import data as pdata
    from .models import train as ptrain
    from .models.panoramic import PanoBaselineNet
    from .models.perspective import PerspectiveDepthNet
    from .parallel import multihost as mh
    from .parallel.mesh import make_mesh

    pidx, pcnt = 0, 1
    if args.coordinator is not None:
        # before ANY device use — jax.distributed owns backend bring-up
        pidx, pcnt = mh.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    proc0 = pidx == 0
    log = print if proc0 else (lambda *a, **k: None)

    n_dev = len(jax.devices())
    if args.batch_size % n_dev:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"device count ({n_dev}): batches shard over the dp mesh axis")
    local_bs = args.batch_size // pcnt

    val_pairs = None
    holdout = False
    if args.synth:
        pairs = None
        log(f"[train] on-device synthetic scenes, {pcnt} process(es), "
            f"{n_dev} device(s)")
    else:
        pairs = pdata.discover_pairs(args.rgb_folder, args.gt_folder,
                                     args.dataset)
        if not pairs:
            raise SystemExit("no (rgb, gt) pairs found")
        # The split must be STICKY across resumes: once a run held out
        # pairs, a later --resume without --eval-every must not train on
        # them (that would contaminate every later eval).  The sidecar
        # records it.
        import json as _json

        holdout = bool(args.eval_every)
        sidecar_f = os.path.join(args.ckpt_dir,
                                 f"{args.model}.config.json")
        if not holdout and os.path.exists(sidecar_f):
            try:
                with open(sidecar_f) as fp:
                    holdout = bool(_json.load(fp).get("eval_holdout"))
            except (OSError, ValueError):
                pass
            if holdout:
                log("[train] maintaining the validation holdout recorded "
                    "by the original run (sidecar eval_holdout)")
        if holdout:
            # a REAL holdout: every 10th pair leaves the training set
            # (before host sharding, so the split is global and
            # identical on every process); the val list is padded by
            # repetition up to one batch when the dataset is tiny
            val_pairs = pairs[::10]
            pairs = [p for i, p in enumerate(pairs) if i % 10]
            if not pairs:
                raise SystemExit("dataset too small to hold out a "
                                 "validation split (--eval-every)")
            log(f"[train] holding out {len(val_pairs)} pairs for "
                f"--eval-every validation")
            while len(val_pairs) < local_bs:
                val_pairs = val_pairs * 2
        if pcnt > 1:
            pairs = mh.process_shard(pairs, pidx, pcnt)
            if not pairs:
                raise SystemExit(f"process {pidx}: no pairs after "
                                 f"sharding over {pcnt} hosts")
        log(f"[train] {len(pairs)} pairs/host, {pcnt} process(es), "
            f"{n_dev} device(s)")

    if args.corrupt:
        sz = (args.view_size if args.model == "perspective"
              else args.pano_width)
        if sz % 16:
            raise SystemExit(f"--corrupt needs the input size to be a "
                             f"multiple of 16 (JPEG 4:2:0 MCU), got {sz}")

    def make_batches(kind, seed, src=None, augment=None, corrupt=None):
        corrupt = args.corrupt if corrupt is None else corrupt
        if args.synth:
            from . import synth

            batches = synth.synth_batches(
                local_bs, kind=kind, view_size=args.view_size,
                pano_width=args.pano_width, seed=seed,
                version=args.synth_version)
        else:
            src = pairs if src is None else src
            augment = args.augment if augment is None else augment
            if kind == "perspective":
                batches = pdata.perspective_batches(
                    src, local_bs, view_size=args.view_size, seed=seed,
                    augment=augment)
            else:
                batches = pdata.pano_batches(src, local_bs,
                                             width=args.pano_width,
                                             seed=seed, augment=augment)
        if corrupt:
            from .ops import corrupt as pcorrupt

            s = args.corrupt_prob
            ccfg = pcorrupt.CorruptConfig()._replace(
                p_jpeg=min(1.0, pcorrupt.CorruptConfig().p_jpeg * s),
                p_noise=min(1.0, pcorrupt.CorruptConfig().p_noise * s),
                p_photo=min(1.0, pcorrupt.CorruptConfig().p_photo * s))
            batches = pcorrupt.corrupt_batches(batches, seed, cfg=ccfg)
        return batches

    s = args.width_scale
    if args.variant != "gn" and args.model not in ("perspective",
                                                   "panoramic"):
        raise SystemExit("--variant nf is a perspective/panoramic option")
    if args.model == "perspective":
        cls = PerspectiveDepthNet
        if args.variant == "nf":
            from .models.perspective import NFPerspectiveNet as cls
        model = cls(
            widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
            decoder_width=max(16, int(128 * s)))
        batch_kind = "perspective"
        sample = jnp.zeros((1, args.view_size, args.view_size, 3))
    elif args.model == "hohonet":
        from .models.hohonet import HorizonDepthNet

        model = HorizonDepthNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            horizon_dim=max(32, int(256 * s)))
        batch_kind = "pano"
        sample = jnp.zeros((1, args.pano_width // 2, args.pano_width, 3))
    elif args.model == "bifuse":
        from .models.bifuse import BiFuseNet

        model = BiFuseNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)))
        batch_kind = "pano"
        sample = jnp.zeros((1, args.pano_width // 2, args.pano_width, 3))
    elif args.model == "slicenet":
        from .models.slicenet import SliceNet

        model = SliceNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            slice_dim=max(32, int(256 * s)))
        batch_kind = "pano"
        sample = jnp.zeros((1, args.pano_width // 2, args.pano_width, 3))
    elif args.model == "fastpano":
        from .models.fastpano import FastPanoNet

        model = FastPanoNet(
            widths=tuple(max(8, int(w * s)) for w in (48, 96, 192, 384)),
            decoder_width=max(16, int(96 * s)))
        batch_kind = "pano"
        sample = jnp.zeros((1, args.pano_width // 2, args.pano_width, 3))
    else:
        cls = PanoBaselineNet
        if args.variant == "nf":
            from .models.panoramic import NFPanoBaselineNet as cls
        model = cls(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)))
        batch_kind = "pano"
        sample = jnp.zeros((1, args.pano_width // 2, args.pano_width, 3))

    ckpt_path = os.path.abspath(os.path.join(args.ckpt_dir, args.model))
    tx = ptrain.make_optimizer(lr=args.lr, steps=args.steps, ema=args.ema)
    state = ptrain.init_state(model, jax.random.PRNGKey(0), sample, tx)
    start_step = 0
    if args.resume:
        if args.init_from:
            raise SystemExit("--resume and --init-from are exclusive: "
                             "resume restores params AND optimizer state")
        latest = _latest_checkpoint(ckpt_path)
        if latest is None:
            log(f"[train] --resume: no checkpoint under {ckpt_path}_*, "
                "starting fresh")
        else:
            # every process restores the same full TrainState (params,
            # AdamW moments, step) from the shared filesystem
            state = ptrain.restore_checkpoint(latest, state)
            start_step = int(state.step)
            log(f"[train] resumed {latest} at step {start_step}")
    if args.init_from:
        if args.init_from.endswith(".npz"):
            params = ptrain.load_params_npz(args.init_from, state.params)
        else:
            # restore params from a full TrainState checkpoint; the params
            # must be shape-compatible (the families are fully
            # convolutional, so --view-size/--pano-width may differ)
            params = ptrain.restore_checkpoint(
                os.path.abspath(args.init_from), state).params
        state = ptrain.TrainState(params=params,
                                  opt_state=state.opt_state,
                                  step=state.step)
        log(f"[train] params initialized from {args.init_from}")
    # each process renders/loads only its slice of the global batch; synth
    # seeds diverge per process so hosts draw disjoint scenes, and a resume
    # offsets the seed so the continued run draws a FRESH deterministic
    # stream instead of replaying the batches already consumed
    batches = make_batches(batch_kind,
                           args.seed + pidx * 9973 + start_step * 131)

    teacher_fn = None
    if args.distill_from:
        from .e2e import load_model_checkpoint

        t_nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
        t_model, t_params, t_arch = load_model_checkpoint(
            args.distill_from, norm_dtype=t_nd)
        t_kind = ("perspective" if t_arch["model"] == "perspective"
                  else "pano")
        if t_kind != batch_kind:
            raise SystemExit(
                f"--distill-from: teacher family {t_arch['model']} takes "
                f"{t_kind} batches but {args.model} trains on {batch_kind}")
        if t_kind == "perspective":
            from .models.perspective import predict_depth01

            teacher_fn = lambda rgb: predict_depth01(t_params, t_model, rgb)
        else:
            teacher_fn = lambda rgb: t_model.apply(t_params, rgb)
        log(f"[train] distilling from {args.distill_from} "
            f"(weight {args.distill_weight})")

    mesh = mh.global_mesh() if pcnt > 1 else make_mesh((n_dev, 1))
    step_fn = ptrain.shard_train_step(
        ptrain.make_train_step(model, tx, remat=args.remat,
                               teacher_fn=teacher_fn,
                               distill_weight=args.distill_weight),
        mesh, "dp")
    data_sharding = NamedSharding(mesh, P("dp"))
    if pcnt > 1:
        state = mh.replicate(mesh, state)
    else:
        state = jax.device_put(state, NamedSharding(mesh, P()))

    if proc0:
        os.makedirs(args.ckpt_dir, exist_ok=True)
        # model-architecture sidecar (argv-derived) written up front so
        # EVERY checkpoint — including intermediates after a crash — is
        # reconstructable
        import json

        arch = dict(model=args.model, width_scale=args.width_scale,
                    view_size=args.view_size, pano_width=args.pano_width,
                    eval_holdout=holdout, variant=args.variant)
        with open(os.path.join(args.ckpt_dir, f"{args.model}.config.json"),
                  "w") as fp:
            json.dump(arch, fp)

    def checkpoint(tag):
        # Orbax saves are COLLECTIVE under jax.distributed (every process
        # participates in its sync barriers; the primary host writes), so
        # all processes must call save together — a proc0-only call
        # deadlocks until the barrier times out.  The plain-file npz write
        # stays proc0-only.
        host = (mh.fetch_replicated(state) if pcnt > 1 else state)
        ptrain.save_checkpoint(f"{ckpt_path}_{tag}", host)
        if tag == "final" and proc0:
            ptrain.save_params_npz(f"{ckpt_path}_final.params.npz",
                                   host.params)
            if args.ema is not None:
                ptrain.save_params_npz(
                    f"{ckpt_path}_final.ema.params.npz",
                    ptrain.ema_params(host.opt_state))

    import json

    mout = open(args.metrics_out, "a") if (proc0 and args.metrics_out) \
        else None

    def emit(rec):
        if mout is not None:
            mout.write(json.dumps(rec) + "\n")
            mout.flush()

    # held-out validation: a FIXED batch set from a seed stream disjoint
    # from every training process's, loaded once and re-scored in place.
    # The seed ALSO diverges per process: each host contributes a
    # distinct slice of the global eval batch (identical seeds would make
    # the "global" batch pcnt copies of the same local rows).
    run_eval = None
    if args.eval_every:
        import itertools

        raw = list(itertools.islice(
            make_batches(batch_kind, args.seed + 999_331 + pidx * 7919,
                         src=val_pairs, augment=False, corrupt=False),
            args.eval_batches))
        if pcnt > 1:
            eval_data = [tuple(mh.global_batch(mesh, np.asarray(b))
                               for b in bt) for bt in raw]
        else:
            eval_data = [tuple(jax.device_put(jnp.asarray(b), data_sharding)
                               for b in bt) for bt in raw]

        def _val_loss(params, batch):
            rgb, depth, mask = batch
            return ptrain.depth_loss(model.apply(params, rgb), depth, mask)

        eval_jit = jax.jit(
            _val_loss,
            in_shardings=(NamedSharding(mesh, P()), (data_sharding,) * 3),
            out_shardings=NamedSharding(mesh, P()))
        _eval_compiled = {}

        def run_eval(params):
            fn = _eval_compiled.get("fn")
            if fn is None:
                if pcnt > 1:
                    # same compile-then-barrier discipline as the train
                    # step: a cold-cache compile on one host must not eat
                    # the collective rendezvous window
                    fn = eval_jit.lower(params, eval_data[0]).compile()
                    mh.barrier("eval-compiled")
                else:
                    fn = eval_jit
                _eval_compiled["fn"] = fn
            return sum(float(fn(params, bt)) for bt in eval_data) / \
                len(eval_data)

    # Preemption grace.  SIGTERM/SIGINT set a local flag; the loop
    # finishes the in-flight step and checkpoints before exiting 0 so a
    # supervisor restart with --resume continues.  Single-host:
    # checkpoint immediately.  Multi-host: signals are NOT synchronized
    # across hosts and every further step and orbax save is a collective,
    # so a process breaking out unilaterally would wedge its peers inside
    # the next gradient psum.  Instead the signaled process announces a
    # STOP STEP through the coordination KV store (first writer wins) and
    # every process keeps stepping through it, then all checkpoint
    # together.  The per-step scalar readback below bounds cross-host
    # dispatch skew to one step, which makes ``caught_step + 2`` a safe
    # stop step: every peer provably polls the key before passing it.
    import signal

    caught = {}

    def _on_signal(signum, frame):
        caught["sig"] = signal.Signals(signum).name

    prev_handlers = {s: signal.signal(s, _on_signal)
                     for s in (signal.SIGTERM, signal.SIGINT)}

    t0 = time.monotonic()
    exec_step = step_fn
    interrupted = False
    stop_at = None
    for step, batch in enumerate(batches, start=start_step):
        if step >= args.steps:
            break
        if pcnt > 1 and stop_at is None:
            v = mh.kv_try_get("panodepth/preempt-stop")
            if v is not None:
                stop_at = int(v)
        if stop_at is not None and step > stop_at:
            interrupted = True
            break
        if pcnt > 1:
            batch = tuple(mh.global_batch(mesh, b) for b in batch)
            if exec_step is step_fn:
                # compile process-locally, then sync hosts, then open the
                # collective channels — compile-time skew across hosts
                # (cold vs warm cache) must not eat into the communicator
                # rendezvous window (multihost.barrier)
                exec_step = step_fn.lower(state, batch).compile()
                mh.barrier("train-step-compiled")
        else:
            batch = tuple(jax.device_put(jnp.asarray(b), data_sharding)
                          for b in batch)
        if args.trace and proc0 and step == start_step + 2:
            # skip the compile step + one warm step, then trace three
            jax.profiler.start_trace(args.trace)
        state, metrics = exec_step(state, batch)
        if pcnt > 1:
            # host-step sync: a host can only start step k+1 after every
            # host's devices finished step k, so cross-host loop skew
            # stays within one step (preemption-drain safety; a scalar
            # readback is negligible against a real training step)
            jax.block_until_ready(metrics["loss"])
        if args.trace and proc0 and step == start_step + 4:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            log(f"[train] profiler trace written to {args.trace}")
        if step % args.log_every == 0:
            loss = float(metrics["loss"])
            gn = float(metrics["grad_norm"])
            rate = ((step + 1 - start_step) * args.batch_size
                    / (time.monotonic() - t0))
            log(f"[train] step {step} loss {loss:.4f} |g| {gn:.3f} "
                f"({rate:.1f} img/s)", flush=True)
            emit(dict(step=step, loss=loss, grad_norm=gn,
                      img_per_sec=round(rate, 2)))
        if run_eval is not None and (step + 1) % args.eval_every == 0:
            rec = dict(step=step, val_loss=run_eval(state.params))
            if args.ema is not None:
                rec["val_loss_ema"] = run_eval(
                    ptrain.ema_params(state.opt_state))
            log(f"[train] step {step} val {rec['val_loss']:.4f}"
                + (f" (ema {rec['val_loss_ema']:.4f})"
                   if args.ema is not None else ""), flush=True)
            emit(rec)
        if caught:
            if pcnt == 1:
                interrupted = True
                checkpoint(str(step))
                log(f"[train] {caught['sig']}: checkpointed at step "
                    f"{step + 1}; restart with --resume to continue",
                    flush=True)
                break
            if stop_at is None:
                mh.kv_set_once("panodepth/preempt-stop", str(step + 2))
                # a racing announcement from another host may have won
                stop_at = int(mh.kv_try_get("panodepth/preempt-stop"))
                print(f"[train] p{pidx}: {caught['sig']}: draining to "
                      f"collectively agreed step {stop_at}", flush=True)
        if step and step % args.ckpt_every == 0:
            checkpoint(str(step))
    for s, h in prev_handlers.items():
        signal.signal(s, h)
    if args.trace and proc0:
        try:  # still running if the loop ended before the stop step
            jax.profiler.stop_trace()
            log(f"[train] profiler trace written to {args.trace} "
                "(short run: fewer steady-state steps than planned)")
        except RuntimeError:
            if args.steps - start_step <= 2:
                log(f"[train] --trace wrote nothing: tracing starts at "
                    f"step {start_step + 2} and this run ended before it "
                    f"(needs at least 3 steps)")
    if not interrupted:
        checkpoint("final")
    elif pcnt > 1:
        # every process executed exactly through stop_at (see the drain
        # protocol above): one collective full-state save, then exit 0
        checkpoint(str(stop_at))
        log(f"[train] preempted: collective checkpoint at step "
            f"{stop_at + 1}; restart every process with --resume",
            flush=True)
    if pcnt > 1:
        # non-zero processes exit instantly after the last step while
        # proc 0 is still serializing the checkpoint; without this they
        # hit jax.distributed's (short) shutdown barrier and die noisily
        mh.barrier("train-done", timeout_ms=1_800_000)
    if mout is not None:
        mout.close()
    if not interrupted:
        log(f"[train] done; checkpoint at {ckpt_path}_final "
            f"(+ params-only {ckpt_path}_final.params.npz)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
