"""Stage-split timing of the batched e2e graph at the production shape.

``python scripts/e2e_profile.py [batch] [extract_dtype]`` times, at 2048
b<batch> with zoo weights: (a) the fused full graph, (b) the models stage
alone (baseline CNN + extraction + perspective CNN), (c) the fuse stage
alone (registration + fusion), and (d) the models stage with the
perspective CNN swapped for identity extraction only — isolating
extraction from CNN cost.  One JSON line.  The split guides where the
next e2e millisecond comes from (PERF.md "Where the time goes").
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


def sync(x):
    float(jnp.sum(x.astype(jnp.float32)))


def time_ms(fn, *args, reps=6, trials=5):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out[0] if isinstance(out, (tuple, list)) else out)
        vals.append((time.perf_counter() - t0) / reps)
    return float(np.median(vals)) * 1e3


def main():
    from panodepth.config import MergeConfig
    from panodepth.e2e import build_batched_e2e, load_model_checkpoint

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ed = sys.argv[2] if len(sys.argv) > 2 else "auto"
    # output resolution override (4096 stage splits: VERDICT r5 #5)
    ow = int(os.environ.get("PANODEPTH_PROFILE_WIDTH", "2048"))
    cfg = MergeConfig(out_width=ow)
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    pm, pp, pa = load_model_checkpoint("zoo/perspective_final.params.npz",
                                       norm_dtype=nd)
    bm, bp, ba = load_model_checkpoint("zoo/panoramic_final.params.npz",
                                       norm_dtype=nd)
    full, models, fuse = build_batched_e2e(
        pm, pp, cfg, view_width=pa.get("view_size", 512),
        base_model=bm, base_params=bp, base_w=ba.get("pano_width", 512),
        extract_dtype=ed)
    rng = np.random.RandomState(1)
    rgbs = jnp.asarray(rng.randint(0, 256, (batch, ow // 2, ow, 3))
                       .astype(np.uint8))

    t_full = time_ms(full, rgbs)
    baselines, pmaps = models(rgbs)
    jax.block_until_ready(baselines)
    t_models = time_ms(models, rgbs)
    t_fuse = time_ms(fuse, baselines, pmaps)
    print(json.dumps({
        "backend": jax.default_backend(), "batch": batch, "extract": ed,
        "out_width": ow,
        "base_feed": os.environ.get("PANODEPTH_BASE_FEED", "bilinear"),
        "full_ms_per_pano": round(t_full / batch, 3),
        "models_ms_per_pano": round(t_models / batch, 3),
        "fuse_ms_per_pano": round(t_fuse / batch, 3),
        "stage_overhead_ms": round((t_models + t_fuse - t_full) / batch, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
