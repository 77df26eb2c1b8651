"""On-chip throughput + MFU for any zoo checkpoint's forward pass.

``python scripts/pano_bench.py zoo/bifuse_final.params.npz [batch]``

Times the bf16-norm inference forward at the checkpoint's native input
shape (panoramic families: batch x (pano_width/2) x pano_width x 3;
perspective: batch x view x view x 3), reads the compiled graph's FLOPs
from XLA ``cost_analysis()``, and prints one JSON line with img/s,
TFLOP/s, and MFU vs the v5e bf16 peak (197 TFLOP/s) — the recipe behind
PERF.md's MFU table.  Fills the BiFuse/SliceNet dashes (VERDICT r3 #7).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax

if "--cpu" in sys.argv:  # smoke-test escape: JAX_PLATFORMS is ignored
    sys.argv.remove("--cpu")  # under the axon plugin (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12


def sync(x):
    float(jnp.sum(x.astype(jnp.float32)))  # tunnel-safe fence


def main():
    from panodepth.e2e import load_model_checkpoint

    int8 = "--int8" in sys.argv
    if int8:
        sys.argv.remove("--int8")
    ckpt = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    model, params, arch = load_model_checkpoint(ckpt, norm_dtype=nd,
                                                quantize=int8)
    if arch["model"] == "perspective":
        s = arch.get("view_size", 256)
        shape = (batch, s, s, 3)
    else:
        w = arch.get("pano_width", 512)
        shape = (batch, w // 2, w, 3)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(*shape).astype(np.float32))

    fn = jax.jit(model.apply)
    lowered = fn.lower(params, rgb)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float((ca[0] if isinstance(ca, (list, tuple)) else ca)
                  .get("flops", 0.0))
    sync(fn(params, rgb))  # warm the tunnel-side executable

    reps, trials = 10, 5
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(params, rgb)
        sync(out)
        vals.append((time.perf_counter() - t0) / (reps * batch))
    per = float(np.median(vals))
    tflops = flops / batch / per / 1e12
    print(json.dumps({
        "backend": jax.default_backend(),
        "model": arch["model"], "ckpt": os.path.basename(ckpt),
        "int8": int8,
        "batch": batch, "input": list(shape),
        "fwd_gflops_per_img": round(flops / batch / 1e9, 2),
        "img_per_s": round(1.0 / per, 1),
        "tflops_per_s": round(tflops, 2),
        "mfu_pct_v5e_bf16": round(100.0 * tflops * 1e12 / V5E_BF16_PEAK, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
