"""Single-request (b1) latency decomposition of the on-device e2e graph.

``python scripts/latency_profile.py`` measures, with zoo weights at the
production 2048x1024 shape, the components a batch-1 serving client pays
(VERDICT r5 #2 — the 104 ms ``latency_ms_2048x1024_e2e_single`` was
unexamined):

- ``rtt_ms``          — dispatch + fence of a trivial device op (the
  tunnel/runtime round trip; a co-located host pays microseconds here);
- ``upload_ms``       — host->device transfer of the 6 MB uint8 panorama
  (fenced via an on-device reduce of the uploaded buffer, minus rtt);
- ``graph_ms``        — the fused e2e graph on a device-resident input;
- ``models_ms`` / ``fuse_ms`` — the b1 stage split (same graphs the b24
  split in PERF.md uses);
- ``vp1_graph_ms``    — the view-parallel latency graph
  (parallel/views.py) on ONE device: its first single-chip number;
- ``e2e_single_ms``   — upload + graph + fence, the bench.py metric,
  re-measured for cross-checking.

One JSON line.  The reference's per-pano loop is Main.cpp:489-685.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    """True host sync (axon block_until_ready returns early)."""
    return float(jnp.sum(x.astype(jnp.float32)))


def med_ms(f, reps=10, trials=5):
    f()  # warm
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            f()
        vals.append((time.perf_counter() - t0) / reps)
    return float(np.median(vals)) * 1e3


def main():
    from panodepth.config import MergeConfig
    from panodepth.e2e import build_batched_e2e, load_model_checkpoint

    cfg = MergeConfig(out_width=2048)
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    pm, pp, pa = load_model_checkpoint("zoo/perspective_final.params.npz",
                                       norm_dtype=nd)
    base = os.environ.get("LAT_BASE", "zoo/panoramic_final.params.npz")
    bm, bp, ba = load_model_checkpoint(base, norm_dtype=nd)
    vw = pa.get("view_size", 512)
    bw = ba.get("pano_width", 512)

    rng = np.random.RandomState(1)
    rgb_np = rng.randint(0, 256, (1, 1024, 2048, 3)).astype(np.uint8)

    rec = {"backend": jax.default_backend(), "base": os.path.basename(base)}

    # rtt: trivial jitted op on a tiny device-resident buffer
    tiny = jnp.zeros((8,), jnp.float32)
    add1 = jax.jit(lambda v: v + 1.0)
    fence(add1(tiny))
    rec["rtt_ms"] = round(med_ms(lambda: fence(add1(tiny))), 2)

    # upload: device transfer of the uint8 panorama, fenced by an
    # on-device reduce of the uploaded bytes
    up = jax.jit(lambda v: jnp.sum(v, dtype=jnp.int32))
    fence(up(jnp.asarray(rgb_np)))
    rec["upload_ms"] = round(
        med_ms(lambda: fence(up(jnp.asarray(rgb_np)))) - rec["rtt_ms"], 2)

    full, models, fuse = build_batched_e2e(
        pm, pp, cfg, view_width=vw, base_model=bm, base_params=bp,
        base_w=bw)
    rgb_dev = jnp.asarray(rgb_np)
    fence(up(rgb_dev))
    fence(full(rgb_dev)[0])
    rec["graph_ms"] = round(med_ms(lambda: fence(full(rgb_dev)[0]),
                                   reps=5), 2)

    baselines, pmaps = models(rgb_dev)
    fence(baselines)
    rec["models_ms"] = round(med_ms(lambda: fence(models(rgb_dev)[0]),
                                    reps=5), 2)
    rec["fuse_ms"] = round(
        med_ms(lambda: fence(fuse(baselines, pmaps)[0]), reps=5), 2)

    # the bench.py metric for cross-check: fresh upload + graph per request
    def single():
        fence(full(jnp.asarray(rgb_np))[0])

    single()
    rec["e2e_single_ms"] = round(med_ms(single, reps=5), 2)

    # view-parallel latency graph on ONE device (its first single-chip
    # number; on a v5e-8 the view stages shard 8-way)
    try:
        from panodepth.parallel.views import build_latency_e2e, make_vp_mesh

        lat = build_latency_e2e(pm, pp, cfg, make_vp_mesh(1),
                                view_width=vw, base_model=bm,
                                base_params=bp, base_w=bw)
        rgb1 = rgb_dev[0]
        fence(lat(rgb1)[0])
        rec["vp1_graph_ms"] = round(med_ms(lambda: fence(lat(rgb1)[0]),
                                           reps=5), 2)
    except Exception as e:  # noqa: BLE001 — report, don't die
        rec["vp1_graph_ms"] = f"failed: {type(e).__name__}: {e}"

    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
