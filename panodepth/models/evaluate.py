"""Held-out evaluation for the trained model families.

``python -m panodepth.models.evaluate <ckpt> [--count N] [--seed S]``

Renders held-out procedural scenes (disjoint seed space from training) and
scores the checkpoint's predictions against the analytic ground truth with
the pipeline's own metric stack (error_metrics, align_way=1 median
alignment — the reference's scoring mode, Depth.cpp:933-947).  Prints one
JSON line with the aggregate metrics plus the constant-predictor RMSE as a
floor reference.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def evaluate(ckpt_path: str, count: int = 16, seed: int = 77_000,
             align_way: int = 1, batch: int = 4, scene_version="v1",
             corrupt: bool = False, int8: bool = False):
    """``corrupt=True`` degrades the rendered RGB with the FIXED
    mid-severity camera-pipeline corruption (ops/corrupt.eval_corruption:
    exposure + noise + JPEG q40) before prediction — ground truth stays
    exact, so the clean-vs-corrupted metric delta measures input-domain
    robustness directly."""
    import jax
    import jax.numpy as jnp

    from .. import metrics as pmetrics
    from .. import synth
    from ..e2e import load_model_checkpoint
    from ..ops import corrupt as pcorrupt

    model, params, arch = load_model_checkpoint(ckpt_path, quantize=int8)
    kind = arch["model"]
    rng = np.random.RandomState(seed)

    use_v2 = str(scene_version) not in ("1", "v1")
    if kind == "perspective":
        size = arch.get("view_size", 256)

        @jax.jit
        def render(scenes, fovs):
            return jax.vmap(
                lambda s, f: synth.render_view(s, f, size, size, use_v2)
            )(scenes, fovs)
    else:
        pw = arch.get("pano_width", 512)

        @jax.jit
        def render(scenes):
            return jax.vmap(
                lambda s: synth.render_pano(s, pw, pw // 2, use_v2))(scenes)

    predict = jax.jit(model.apply)
    degrade = jax.jit(pcorrupt.eval_corruption) if corrupt else None

    recs = []
    done = 0
    while done < count:
        n = min(batch, count - done)
        scenes = synth.stack_scenes(
            [synth.sample_scene(rng, scene_version) for _ in range(n)])
        scenes = jax.tree.map(jnp.asarray, scenes)
        if kind == "perspective":
            fovs = jnp.asarray(np.stack(
                [synth.sample_view_fov(rng) for _ in range(n)]))
            rgb, dep = render(scenes, fovs)
        else:
            rgb, dep = render(scenes)
        if degrade is not None:
            rgb = degrade(rgb)
        pred = predict(params, rgb)
        for i in range(n):
            m = pmetrics.error_metrics(dep[i], pred[i],
                                       align_way=align_way,
                                       zenith_range=(0.0, np.pi))
            t = np.asarray(dep[i])
            recs.append(dict(
                rmse=float(np.sqrt(float(m["mse"]))),
                mae=float(m["mae"]), mre=float(m["mre"]),
                delta1=float(m["delta1"]),
                rmse_const=float(np.sqrt(np.mean((t - t.mean()) ** 2))),
            ))
        done += n

    agg = {k: float(np.mean([r[k] for r in recs])) for k in recs[0]}
    agg.update(model=kind, ckpt=ckpt_path, count=count, align_way=align_way,
               scenes=str(scene_version), corrupt=corrupt, int8=int8)
    return agg


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="panodepth-evaluate")
    p.add_argument("ckpt")
    p.add_argument("--count", type=int, default=16)
    p.add_argument("--seed", type=int, default=77_000)
    p.add_argument("--align-way", type=int, default=1, choices=[0, 1, 2])
    p.add_argument("--scenes", default="v1", choices=["v1", "v2", "mix"],
                   help="held-out scene distribution (see panodepth.synth)")
    p.add_argument("--corrupt", action="store_true",
                   help="degrade the rendered RGB with fixed mid-severity "
                        "camera-pipeline corruption (exposure + noise + "
                        "JPEG q40) before prediction — measures "
                        "input-domain robustness (gt stays exact)")
    p.add_argument("--int8", action="store_true",
                   help="evaluate the int8 PTQ inference graph "
                        "(models/quantize.py; GN perspective ckpts only)")
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"])
    args = p.parse_args(argv)
    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)
    print(json.dumps(evaluate(args.ckpt, args.count, args.seed,
                              args.align_way, scene_version=args.scenes,
                              corrupt=args.corrupt, int8=args.int8)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
