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
    p.add_argument("model", choices=["perspective", "panoramic", "hohonet"])
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
    p.add_argument("--debug-nans", action="store_true",
                   help="abort on the first NaN inside any jitted graph")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations in the backward pass "
                        "(jax.checkpoint): ~1 extra forward per step for "
                        "a much smaller activation footprint — use when "
                        "a larger --batch-size/--width-scale OOMs")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from .models import data as pdata
    from .models import train as ptrain
    from .models.panoramic import PanoBaselineNet
    from .models.perspective import PerspectiveDepthNet
    from .parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if args.batch_size % n_dev:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"device count ({n_dev}): batches shard over the dp mesh axis")

    if args.synth:
        pairs = None
        print(f"[train] on-device synthetic scenes, "
              f"{len(jax.devices())} device(s)")
    else:
        pairs = pdata.discover_pairs(args.rgb_folder, args.gt_folder,
                                     args.dataset)
        if not pairs:
            raise SystemExit("no (rgb, gt) pairs found")
        print(f"[train] {len(pairs)} pairs, {len(jax.devices())} device(s)")

    def make_batches(kind):
        if args.synth:
            from . import synth

            return synth.synth_batches(
                args.batch_size, kind=kind, view_size=args.view_size,
                pano_width=args.pano_width, seed=args.seed,
                version=args.synth_version)
        if kind == "perspective":
            return pdata.perspective_batches(pairs, args.batch_size,
                                             view_size=args.view_size,
                                             seed=args.seed)
        return pdata.pano_batches(pairs, args.batch_size,
                                  width=args.pano_width, seed=args.seed)

    s = args.width_scale
    if args.model == "perspective":
        model = PerspectiveDepthNet(
            widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
            decoder_width=max(16, int(128 * s)))
        batches = make_batches("perspective")
        sample = jnp.zeros((1, args.view_size, args.view_size, 3))
    elif args.model == "hohonet":
        from .models.hohonet import HorizonDepthNet

        model = HorizonDepthNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)),
            horizon_dim=max(32, int(256 * s)))
        batches = make_batches("pano")
        sample = jnp.zeros((1, args.pano_width // 2, args.pano_width, 3))
    else:
        model = PanoBaselineNet(
            widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)))
        batches = make_batches("pano")
        sample = jnp.zeros((1, args.pano_width // 2, args.pano_width, 3))

    tx = ptrain.make_optimizer(lr=args.lr, steps=args.steps)
    state = ptrain.init_state(model, jax.random.PRNGKey(0), sample, tx)
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
        print(f"[train] params initialized from {args.init_from}")
    mesh = make_mesh((len(jax.devices()), 1))
    step_fn = ptrain.shard_train_step(
        ptrain.make_train_step(model, tx, remat=args.remat), mesh, "dp")
    data_sharding = NamedSharding(mesh, P("dp"))
    state = jax.device_put(state, NamedSharding(mesh, P()))

    ckpt_path = os.path.abspath(os.path.join(args.ckpt_dir, args.model))
    os.makedirs(args.ckpt_dir, exist_ok=True)
    # model-architecture sidecar (argv-derived) written up front so EVERY
    # checkpoint — including intermediates after a crash — is reconstructable
    import json

    arch = dict(model=args.model, width_scale=args.width_scale,
                view_size=args.view_size, pano_width=args.pano_width)
    with open(os.path.join(args.ckpt_dir, f"{args.model}.config.json"),
              "w") as fp:
        json.dump(arch, fp)
    t0 = time.monotonic()
    for step, batch in enumerate(batches):
        if step >= args.steps:
            break
        batch = tuple(jax.device_put(jnp.asarray(b), data_sharding)
                      for b in batch)
        state, metrics = step_fn(state, batch)
        if step % args.log_every == 0:
            loss = float(metrics["loss"])
            gn = float(metrics["grad_norm"])
            rate = (step + 1) * args.batch_size / (time.monotonic() - t0)
            print(f"[train] step {step} loss {loss:.4f} |g| {gn:.3f} "
                  f"({rate:.1f} img/s)", flush=True)
        if step and step % args.ckpt_every == 0:
            ptrain.save_checkpoint(f"{ckpt_path}_{step}", state)
    ptrain.save_checkpoint(f"{ckpt_path}_final", state)
    ptrain.save_params_npz(f"{ckpt_path}_final.params.npz", state.params)
    print(f"[train] done; checkpoint at {ckpt_path}_final "
          f"(+ params-only {ckpt_path}_final.params.npz)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
