"""Benchmark: fused 2048x1024 panorama depth throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured graph is the full per-panorama device pipeline the reference
times as time_Reg + time_Laplacian (reference Main.cpp:667-681): 15-view
cubic registration + 3-level multiresolution Laplacian fusion (200/100/50
Jacobi iterations) to a 2048x1024 u16 panorama, with realistic 1024x988
perspective maps.  ``vs_baseline`` is measured throughput over the
north-star target of 30 panoramas/sec (BASELINE.json; the reference repo
publishes no numbers of its own — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
OUT_WIDTH = int(os.environ.get("BENCH_OUT_WIDTH", "2048"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
NORTH_STAR = 30.0  # panoramas/sec on v5e-8 (BASELINE.json)


def main() -> None:
    from panodepth.config import MergeConfig
    from panodepth.pipeline import merge_arrays

    cfg = MergeConfig(out_width=OUT_WIDTH)
    rng = np.random.RandomState(0)
    v = cfg.layout.num_views
    emaps = jnp.asarray(
        rng.uniform(0.05, 0.9, (BATCH, 512, 1024)).astype(np.float32))
    pmaps = jnp.asarray(
        rng.uniform(0.05, 0.9, (BATCH, v, 988, 1024)).astype(np.float32))

    jacobi_fn = None
    if jax.default_backend() == "tpu":
        from panodepth.kernels.jacobi import pallas_jacobi

        jacobi_fn = pallas_jacobi
    fn = jax.jit(jax.vmap(lambda e, p: merge_arrays(e, p, cfg, jacobi_fn)))

    def sync(out):
        # NOTE: on tunneled backends (axon) block_until_ready returns before
        # remote execution finishes; a host readback is the only true sync.
        # Device execution is in-order, so one readback of the LAST output
        # fences everything enqueued before it.
        return float(jnp.sum(out.astype(jnp.float32)))

    sync(fn(emaps, pmaps)[0])  # compile + warm up
    # pipelined throughput: enqueue all batches, fence once at the end
    # (per-batch host syncs would measure the ~30 ms tunnel roundtrip, which
    # a production stream never pays per item)
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out, _ = fn(emaps, pmaps)
    sync(out)
    per_batch = (time.perf_counter() - t0) / REPS
    panos_per_sec = BATCH / per_batch
    print(json.dumps({
        "metric": f"panoramas_per_sec_{OUT_WIDTH}x{OUT_WIDTH // 2}_fused",
        "value": round(panos_per_sec, 3),
        "unit": "panoramas/sec",
        "vs_baseline": round(panos_per_sec / NORTH_STAR, 3),
    }))


if __name__ == "__main__":
    main()
