"""AOT serving artifacts: serialize the compiled device graphs to disk.

The reference ships a batch binary that re-runs its full startup (GL context,
shader compile, Ceres setup) on every invocation (reference Main.cpp:489-685).
The TPU-native equivalent of "deployable binary" is an ahead-of-time exported
XLA program: ``jax.export`` lowers the jitted merge / e2e graph to StableHLO
once, and the serialized artifact can be loaded by a serving process and
called immediately — no Python tracing, no model code, no recompile (the
persistent compilation cache makes the device compile a cache hit too).

Artifacts are shape- and platform-specific by construction (that is what
makes them AOT): export on the platform you serve on.  A ``meta.json``
sidecar records the shapes, dtypes, platform, and config for validation at
load time.

CLI:

    python -m panodepth.serve export-merge OUT.xla --batch 8 \
        --emap-shape 512x1024 --pmap-shape 988x1024 [--out-width 2048]
    python -m panodepth.serve export-e2e OUT.xla --batch 8 \
        --rgb-shape 1024x2048 --persp-ckpt ... --baseline-ckpt ...
    python -m panodepth.serve run OUT.xla            # smoke: random inputs
    python -m panodepth.serve describe OUT.xla       # inspect, no execution
    python -m panodepth.serve daemon OUT.xla --port 8765   # persistent HTTP
                                         # server w/ micro-batching (daemon.py)

Python:

    art = serve.load("merge.xla")
    out_u16, abcd = art(emaps_u16, pmaps_u16)
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from .config import MergeConfig


def _jax():
    import jax

    return jax


class Artifact:
    """A deserialized AOT program + its metadata sidecar."""

    def __init__(self, exported, meta: dict):
        self.exported = exported
        self.meta = meta

    def __call__(self, *args):
        return self.exported.call(*args)

    @property
    def platforms(self) -> Sequence[str]:
        return self.exported.platforms

    def describe(self) -> str:
        m = self.meta
        ins = ", ".join(f"{s}:{d}" for s, d in zip(m["in_shapes"],
                                                   m["in_dtypes"]))
        return (f"{m['kind']} graph for {m.get('platforms')} — inputs "
                f"[{ins}], cfg out_width={m.get('out_width')}")


def _save(path: str, exported, meta: dict) -> None:
    with open(path, "wb") as fp:
        fp.write(exported.serialize())
    meta = dict(meta, platforms=list(exported.platforms))
    with open(path + ".meta.json", "w") as fp:
        json.dump(meta, fp, indent=1)


def load(path: str) -> Artifact:
    """Load an artifact written by one of the exporters below.

    A missing ``.meta.json`` sidecar (e.g. only the ``.xla`` file was
    copied to the serving host) is tolerated: input shapes/dtypes are
    recovered from the exported program's own avals so ``describe`` and
    the ``run`` smoke command still work; only the extra config fields
    (kind, out_width, ...) are unavailable.
    """
    from jax import export as jexport

    with open(path, "rb") as fp:
        exported = jexport.deserialize(fp.read())
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as fp:
            meta = json.load(fp)
    else:
        meta = {
            "kind": "unknown (meta sidecar missing)",
            "in_shapes": [list(a.shape) for a in exported.in_avals],
            "in_dtypes": [str(a.dtype) for a in exported.in_avals],
            "platforms": list(exported.platforms),
        }
    return Artifact(exported, meta)


def _export_jit(fn, example_args, kind: str, extra_meta: dict, path: str):
    jax = _jax()
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    meta = dict(
        kind=kind,
        in_shapes=[list(np.shape(a)) for a in example_args],
        in_dtypes=[str(np.asarray(a).dtype) if not hasattr(a, "dtype")
                   else str(a.dtype) for a in example_args],
        **extra_meta,
    )
    _save(path, exported, meta)
    return exported


def export_merge(path: str, cfg: MergeConfig, batch: int,
                 emap_shape=(512, 1024), pmap_shape=(988, 1024),
                 dtype="uint16", jacobi_kind: str = "auto"):
    """Serialize the batched file-mode merge graph (emaps+pmaps -> u16).

    ``dtype`` "uint16" matches the streamed production transfer path
    (u16 tables through the gathers); "float32" for pre-normalized feeds.
    """
    jax = _jax()
    import jax.numpy as jnp

    from .pipeline import _resolve_jacobi, merge_arrays

    jacobi_fn = _resolve_jacobi(jacobi_kind)
    v = cfg.layout.num_views
    dt = jnp.uint16 if dtype == "uint16" else jnp.float32
    emaps = jnp.zeros((batch,) + tuple(emap_shape), dt)
    pmaps = jnp.zeros((batch, v) + tuple(pmap_shape), dt)
    fn = jax.vmap(lambda e, p: merge_arrays(e, p, cfg, jacobi_fn))
    return _export_jit(fn, (emaps, pmaps), "merge",
                       dict(out_width=cfg.out_width, batch=batch,
                            layout=cfg.layout_name, dtype=dtype), path)


def export_e2e(path: str, cfg: MergeConfig, batch: int, persp_ckpt: str,
               baseline_ckpt: str, rgb_shape=(1024, 2048),
               view_width: Optional[int] = None, persp_int8: bool = False):
    """Serialize the batched on-device e2e graph (uint8 RGB -> u16 pano).

    Model parameters are baked into the artifact as constants — the serving
    process needs no checkpoints, no model code, no flax.  ``persp_int8``
    bakes the int8 PTQ perspective graph instead (models/quantize.py):
    int8 weights quarter the artifact's perspective-param payload and the
    graph is export-safe by construction (conv/round/clip only — none of
    the LAPACK FFI calls that segfault under deserialized jax.export).
    """
    import jax.numpy as jnp

    from .e2e import build_batched_e2e, load_model_checkpoint

    jax = _jax()
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    persp_model, persp_params, persp_arch = load_model_checkpoint(
        persp_ckpt, norm_dtype=nd, quantize=persp_int8)
    base_model, base_params, base_arch = load_model_checkpoint(
        baseline_ckpt, norm_dtype=nd)
    vw = view_width or persp_arch.get("view_size", 512)
    fn, _, _ = build_batched_e2e(
        persp_model, persp_params, cfg, view_width=vw,
        base_model=base_model, base_params=base_params,
        base_w=base_arch.get("pano_width", 512))
    rgbs = jnp.zeros((batch,) + tuple(rgb_shape) + (3,), jnp.uint8)
    return _export_jit(fn, (rgbs,), "e2e",
                       dict(out_width=cfg.out_width, batch=batch,
                            layout=cfg.layout_name, view_width=vw,
                            persp_int8=persp_int8), path)


def _parse_hw(s: str):
    h, w = s.lower().split("x")
    return int(h), int(w)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        "panodepth-serve", description="AOT graph export / serving smoke")
    sub = p.add_subparsers(dest="cmd", required=True)

    pm = sub.add_parser("export-merge")
    pm.add_argument("out")
    pm.add_argument("--batch", type=int, default=8)
    pm.add_argument("--emap-shape", default="512x1024")
    pm.add_argument("--pmap-shape", default="988x1024")
    pm.add_argument("--out-width", type=int, default=2048)
    pm.add_argument("--layout", default="5fold_leres")
    pm.add_argument("--dtype", default="uint16",
                    choices=["uint16", "float32"])
    pm.add_argument("--jacobi", default="auto")

    pe = sub.add_parser("export-e2e")
    pe.add_argument("out")
    pe.add_argument("--batch", type=int, default=8)
    pe.add_argument("--rgb-shape", default="1024x2048")
    pe.add_argument("--out-width", type=int, default=2048)
    pe.add_argument("--layout", default="5fold_leres")
    pe.add_argument("--persp-ckpt", required=True)
    pe.add_argument("--baseline-ckpt", required=True)
    pe.add_argument("--view-width", type=int, default=None)
    pe.add_argument("--persp-int8", action="store_true",
                    help="bake the int8 PTQ perspective graph "
                         "(models/quantize.py) into the artifact")

    pr = sub.add_parser("run")
    pr.add_argument("artifact")

    pd = sub.add_parser(
        "describe", help="print an artifact's kind/shapes/platforms "
        "without executing it")
    pd.add_argument("artifact")

    pn = sub.add_parser(
        "daemon", help="persistent HTTP serving process: load the "
        "artifact once, coalesce requests into device batches "
        "(see panodepth.daemon)")
    pn.add_argument("artifact")
    pn.add_argument("--host", default="127.0.0.1")
    pn.add_argument("--port", type=int, default=8765)
    pn.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="micro-batching window after the first request "
                         "of a batch arrives")
    pn.add_argument("--no-warmup", action="store_true",
                    help="skip the startup inference (first request "
                         "pays the device page-in instead)")

    for q in (pm, pe, pr, pd, pn):
        q.add_argument("--platform", default="auto",
                       choices=["auto", "cpu", "tpu"])
    args = p.parse_args(argv)
    jax = _jax()
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    # the repo-wide persistent compilation cache (CLAUDE.md): without it a
    # serving process pays the full device compile this module exists to
    # avoid.  config.update (not the env var) so it takes effect even
    # though jax is already imported by this point.
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jax_cache"))

    if args.cmd == "export-merge":
        cfg = MergeConfig(out_width=args.out_width, layout_name=args.layout)
        export_merge(args.out, cfg, args.batch,
                     emap_shape=_parse_hw(args.emap_shape),
                     pmap_shape=_parse_hw(args.pmap_shape),
                     dtype=args.dtype, jacobi_kind=args.jacobi)
        print(f"[serve] wrote {args.out} (+.meta.json)")
    elif args.cmd == "export-e2e":
        cfg = MergeConfig(out_width=args.out_width, layout_name=args.layout)
        export_e2e(args.out, cfg, args.batch, args.persp_ckpt,
                   args.baseline_ckpt, rgb_shape=_parse_hw(args.rgb_shape),
                   view_width=args.view_width, persp_int8=args.persp_int8)
        print(f"[serve] wrote {args.out} (+.meta.json)")
    elif args.cmd == "describe":
        print(f"[serve] {load(args.artifact).describe()}")
    elif args.cmd == "daemon":
        from .daemon import run_daemon

        return run_daemon(args.artifact, args.host, args.port,
                          args.max_delay_ms, warmup=not args.no_warmup)
    else:
        import time

        import jax.numpy as jnp

        art = load(args.artifact)
        print(f"[serve] {art.describe()}")
        rng = np.random.RandomState(0)
        ins = []
        for shape, dt in zip(art.meta["in_shapes"], art.meta["in_dtypes"]):
            if dt == "uint8":
                ins.append(jnp.asarray(
                    rng.randint(0, 256, shape).astype(np.uint8)))
            elif dt == "uint16":
                ins.append(jnp.asarray(
                    rng.randint(0, 65536, shape).astype(np.uint16)))
            else:
                ins.append(jnp.asarray(
                    rng.uniform(0.05, 0.95, shape).astype(np.float32)))
        t0 = time.monotonic()
        out = art(*ins)
        first = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(first.astype(jnp.float32)))  # true device fence
        dt_ms = (time.monotonic() - t0) * 1000
        shp = [getattr(o, "shape", None)
               for o in (out if isinstance(out, (tuple, list)) else [out])]
        print(f"[serve] ran ok in {dt_ms:.0f} ms (cold), outputs {shp}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
