"""On-chip e2e throughput A/B across checkpoint pairs.

``python scripts/e2e_ab.py persp1.npz base1.npz [persp2.npz base2.npz ...]``
builds the batched on-device e2e graph (RGB -> both CNNs -> registration ->
fusion) for each (perspective, baseline) checkpoint pair and times it at
the production shape (2048x1024, batch from BENCH_E2E_BATCH, default 24).
Prints one JSON line with ms/pano + panos/s per pair.
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
    float(jnp.sum(x))


def main():
    from panodepth.config import MergeConfig
    from panodepth.e2e import build_batched_e2e, load_model_checkpoint

    pairs = list(zip(sys.argv[1::2], sys.argv[2::2]))
    batch = int(os.environ.get("BENCH_E2E_BATCH", "24"))
    cfg = MergeConfig(out_width=2048)
    rng = np.random.RandomState(1)
    rgbs = jnp.asarray(rng.randint(0, 256, (batch, 1024, 2048, 3))
                       .astype(np.uint8))
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    int8 = bool(int(os.environ.get("BENCH_E2E_INT8", "0")))
    res = {"backend": jax.default_backend(), "batch": batch,
           "extract": os.environ.get("BENCH_E2E_EXTRACT", "auto"),
           "persp_int8": int8}
    for pi, (persp, base) in enumerate(pairs):
        pm, pp, pa = load_model_checkpoint(persp, norm_dtype=nd,
                                           quantize=int8)
        bm, bp, ba = load_model_checkpoint(base, norm_dtype=nd)
        fn, _, _ = build_batched_e2e(
            pm, pp, cfg, view_width=pa.get("view_size", 512),
            base_model=bm, base_params=bp,
            base_w=int(os.environ.get("BENCH_E2E_BASEW", "0"))
            or ba.get("pano_width", 512),
            extract_dtype=os.environ.get("BENCH_E2E_EXTRACT", "auto"))
        sync(fn(rgbs)[0])
        vals = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = None
            for _ in range(4):
                out, _ = fn(rgbs)
            sync(out)
            vals.append((time.perf_counter() - t0) / (4 * batch))
        per = float(np.median(vals))
        tag = f"{pa.get('variant', 'gn')}+{ba.get('variant', 'gn')}_{pi}"
        res[tag + "_ms_per_pano"] = round(per * 1e3, 3)
        res[tag + "_panos_per_s"] = round(1.0 / per, 2)
        res[tag + "_ckpts"] = [os.path.basename(persp),
                               os.path.basename(base)]
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
