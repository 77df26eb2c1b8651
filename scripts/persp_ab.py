"""On-chip A/B of perspective-net variants at the e2e inference shape.

Times the forward pass of the GroupNorm net (bf16 norms — the production
e2e configuration) against the normalizer-free variant at the shapes the
batched e2e graph actually runs (15 views x batch panoramas at 256x256).
Run on the real chip: ``python scripts/persp_ab.py [batch_panos]``.
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

from panodepth.models.perspective import (NFPerspectiveNet,
                                          PerspectiveDepthNet,
                                          predict_depth01)


def sync(x):
    float(jnp.sum(x))  # tunnel-safe fence (CLAUDE.md: block_until_ready lies)


def time_ms(fn, reps=6, trials=5):
    fn()  # compile+warm
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        sync(out)
        vals.append((time.perf_counter() - t0) / reps * 1e3)
    return float(np.median(vals))


def main():
    batch_panos = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = batch_panos * 15
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(n, 256, 256, 3).astype(np.float32))

    res = {"backend": jax.default_backend(), "images": n,
           "batch_panos": batch_panos}
    variants = {
        "gn_f32norm": PerspectiveDepthNet(),
        "gn_bf16norm": PerspectiveDepthNet(norm_dtype=jnp.bfloat16),
        "nf": NFPerspectiveNet(),
    }
    for name, model in variants.items():
        params = jax.jit(model.init)(jax.random.PRNGKey(0), rgb[:1])
        fn = jax.jit(lambda p, x, m=model: predict_depth01(p, m, x))
        ms = time_ms(lambda: fn(params, rgb))
        res[name + "_ms"] = round(ms, 3)
        res[name + "_img_per_s"] = round(n / (ms / 1e3), 1)
    res["nf_speedup_vs_bf16gn"] = round(
        res["gn_bf16norm_ms"] / res["nf_ms"], 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
