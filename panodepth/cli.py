"""Command-line entry point preserving the reference's positional CLI.

Reference usage (README.md:50, Main.cpp:692-900)::

    WACV2022 0 rgb/ gt/ baseline/ result/

Here::

    python -m panodepth 0 rgb/ gt/ baseline/ result/ [options]

Command ``0`` runs the full CreateDepthPanoramas batch: stage-A perspective
view extraction + per-panorama registration/fusion/scoring.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="panodepth",
        description="TPU-native high-resolution panorama depth estimation",
    )
    p.add_argument("cmd", choices=["0"], help="0 = CreateDepthPanoramas")
    p.add_argument("rgb_folder")
    p.add_argument("gt_folder")
    p.add_argument("baseline_folder")
    p.add_argument("result_folder")
    p.add_argument("--layout", default="5fold_leres",
                   choices=["5fold_leres", "5fold_midas", "4fold", "3fold"])
    p.add_argument("--out-width", type=int, default=2048)
    p.add_argument("--views-folder", default="test_images")
    p.add_argument("--dataset", default="matterport",
                   choices=["matterport", "stanford2d3d", "suncg", "replica"])
    p.add_argument("--pmap-ext", default=".jpg")
    p.add_argument("--no-extract", action="store_true",
                   help="skip stage-A RGB view extraction")
    p.add_argument("--jacobi", default="auto", choices=["auto", "jnp", "pallas"])
    p.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"],
                   help="force the jax backend (NOTE: the JAX_PLATFORMS env "
                        "var is ignored under some TPU plugins)")
    p.add_argument("--limit", type=int, default=None,
                   help="process at most N panoramas (Main.cpp:372-386)")
    p.add_argument("--include", action="append", default=None,
                   help="only panoramas whose filename contains this "
                        "substring (repeatable; Main.cpp:357-370)")
    p.add_argument("--exclude", action="append", default=None,
                   help="skip panoramas whose filename contains this "
                        "substring (repeatable; Main.cpp:388-407)")
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="fleet sharding: process the round-robin slice "
                        "items[I::N] of the (filtered) todo list — N "
                        "machines each take a disjoint subset with zero "
                        "coordination; skip-if-exists resume still applies "
                        "per item")
    p.add_argument("--profile", action="store_true",
                   help="report the time_Reg / time_Laplacian split via "
                        "stage-separated execution")
    p.add_argument("--batch-size", type=int, default=1,
                   help="merge N panoramas per device launch (streamed)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax profiler trace of the batch into DIR "
                        "(view with tensorboard/xprof)")
    p.add_argument("--persp-ckpt", default=None,
                   help="run the on-TPU perspective depth model from this "
                        "checkpoint instead of reading depth views from disk "
                        "(fully on-device pipeline)")
    p.add_argument("--baseline-ckpt", default=None,
                   help="with --persp-ckpt: produce the panoramic baseline "
                        "with this on-TPU model instead of baseline files")
    p.add_argument("--view-width", type=int, default=None,
                   help="perspective inference width in on-device mode "
                        "(default: the checkpoint's training view_size — "
                        "CNN accuracy drops off its training resolution)")
    p.add_argument("--latency", action="store_true",
                   help="with --persp-ckpt: view-parallel single-request "
                        "mode — each panorama's view fan-out is sharded "
                        "over ALL devices (lowest per-request latency; "
                        "use --batch-size for fleet throughput instead)")
    p.add_argument("--latency-halo", type=int, default=10, metavar="K",
                   help="with --latency: K-wide temporal-blocked halo "
                        "exchanges in the width-sharded Jacobi (K-fold "
                        "fewer ICI collectives, bit-exact)")
    p.add_argument("--stream", default="auto", choices=["auto", "on", "off"],
                   help="transfer integer-source inputs to the device in "
                        "their native width (u8/u16) and normalize there; "
                        "auto = TPU only (1 f32 ulp caveat, see merge_many)")
    p.add_argument("--extract-dtype", default="auto",
                   choices=["auto", "packed", "packed16", "pair16",
                            "pair16d", "bf16", "f32"],
                   help="on-device mode view-extraction gather table: "
                        "packed u32 (fastest exact mode for 8-bit sources, "
                        "quantizes wider ones), packed16 (RGB565 — half the "
                        "gathered bytes again, 5/6/5-bit quantized input), "
                        "pair16 (RGB565 pixel pairs in u32 — half the "
                        "GATHER COUNT, 5/6/5-bit quantized input), "
                        "pair16d (pair16 with Bayer-dithered tables: "
                        "banding -> zero-mean noise), "
                        "bf16, or f32; auto = packed "
                        "on TPU for streamed uint8 inputs, f32 otherwise")
    p.add_argument("--infer-norm", default="auto",
                   choices=["auto", "f32", "bf16"],
                   help="on-device mode GroupNorm compute dtype: bf16 "
                        "halves the norms' HBM traffic (+24%% CNN "
                        "throughput, no measured accuracy change); auto = "
                        "bf16 on TPU, f32 elsewhere")
    p.add_argument("--base-width", type=int, default=None,
                   help="on-device mode: run the panoramic baseline CNN at "
                        "this equirect width instead of its training width "
                        "(fully-conv families only; 256 quarters its cost "
                        "— A/B accuracy per deployment)")
    p.add_argument("--persp-int8", action="store_true",
                   help="on-device mode: run the perspective CNN as the "
                        "int8 post-training-quantized graph (per-channel "
                        "int8 weights + dynamic activation quant on the "
                        "MXU's 2x int8 path; models/quantize.py). GN "
                        "perspective checkpoints only")
    p.add_argument("--p99", default=None,
                   choices=["sort", "topk", "approx"],
                   help="on-device mode: the perspective net's per-image "
                        "99th-percentile normalize (models/perspective."
                        "_percentile99). sort = jnp.percentile (full "
                        "per-image sort), topk = exact rank via lax.top_k, "
                        "approx = lax.approx_max_k (3.6x the sort on v5e; "
                        "the rank statistic may shift a few places within "
                        "the top 1%% — measured accuracy-neutral on the "
                        "12-scene held-out A/B). Default: PANODEPTH_P99 "
                        "env, else approx on TPU / sort elsewhere")
    p.add_argument("--png-level", type=int, default=None, metavar="0-9",
                   help="deflate level for the 16-bit result PNGs (always "
                        "lossless). Default 1: fastest writes; 6+ for "
                        "smallest archival files")
    p.add_argument("--debug-nans", action="store_true",
                   help="abort on the first NaN produced inside any jitted "
                        "graph (jax_debug_nans; SURVEY.md section 5 — the "
                        "functional replacement for the reference's oops! "
                        "prints, Depth.cpp:1600-1601)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if args.png_level is not None:
        import os

        os.environ["PANODEPTH_PNG_LEVEL"] = str(args.png_level)
    from .config import MergeConfig
    from .pipeline import run_batch

    cfg = MergeConfig(layout_name=args.layout, out_width=args.out_width)
    import contextlib

    tracer = contextlib.nullcontext()
    if args.trace:
        import jax

        tracer = jax.profiler.trace(args.trace)
    if args.p99:
        import os

        # read at trace time by models/perspective._percentile99; the env
        # form doubles as the test/bench hook
        os.environ["PANODEPTH_P99"] = args.p99
    # flags that only the on-device model mode honors must refuse, not
    # silently no-op, elsewhere (mirrors the hohonet/slicenet --base-width
    # refusal in run_batch_e2e)
    if not args.persp_ckpt:
        if args.persp_int8:
            raise SystemExit("--persp-int8 applies to the on-device model "
                             "mode only; pass --persp-ckpt")
        if args.base_width:
            raise SystemExit("--base-width applies to the on-device model "
                             "mode only; pass --persp-ckpt + "
                             "--baseline-ckpt")
    elif args.base_width and not args.baseline_ckpt:
        raise SystemExit("--base-width resizes a --baseline-ckpt model's "
                         "input; baseline FILES (--baseline-folder) are "
                         "consumed at their stored size")
    with tracer:
        if args.persp_ckpt:
            from .e2e import run_batch_e2e

            run_batch_e2e(
                args.rgb_folder, args.gt_folder, args.result_folder,
                args.persp_ckpt, cfg, baseline_ckpt=args.baseline_ckpt,
                baseline_folder=args.baseline_folder, dataset=args.dataset,
                view_width=args.view_width, limit=args.limit,
                include=args.include, exclude=args.exclude,
                shard=args.shard,
                profile=args.profile, batch_size=args.batch_size,
                stream=args.stream, jacobi=args.jacobi,
                extract_dtype=args.extract_dtype,
                infer_norm=args.infer_norm,
                persp_int8=args.persp_int8, base_width=args.base_width,
                latency=args.latency, latency_halo=args.latency_halo,
            )
        else:
            run_batch(
                args.rgb_folder, args.gt_folder, args.baseline_folder,
                args.result_folder, cfg,
                views_folder=args.views_folder, dataset=args.dataset,
                extract_rgb_views=not args.no_extract, pmap_ext=args.pmap_ext,
                limit=args.limit, include=args.include, exclude=args.exclude,
                shard=args.shard,
                profile=args.profile, batch_size=args.batch_size,
                stream=args.stream, jacobi=args.jacobi,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
