"""Where do FastPanoNet's cycles go?  On-chip throughput of three
perf-diagnostic variants at the e2e shape (b24, 256x512, bf16 norms):

- ``circ``     — the shipping graph (wrap-pad concat before every conv);
- ``same``     — zero padding (seam-INCORRECT; isolates the concat cost);
- ``nonorm``   — circ with GroupNorm patched to identity(+relu)
  (numerics-INCORRECT; isolates the normalization cost).

Random params (timing only).  One JSON line.
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
    return float(jnp.sum(x.astype(jnp.float32)))


def measure(model, params, rgb, reps=10, trials=5):
    fn = jax.jit(model.apply)
    sync(fn(params, rgb))
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(params, rgb)
        sync(out)
        vals.append((time.perf_counter() - t0) / (reps * rgb.shape[0]))
    return 1.0 / float(np.median(vals))


def main():
    import flax.linen as nn

    from panodepth.models import norm as pnorm
    from panodepth.models.fastpano import FastPanoNet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(batch, 256, 512, 3).astype(np.float32))
    kw = dict(norm_dtype=jnp.bfloat16)
    rec = {"backend": jax.default_backend(), "batch": batch}

    m = FastPanoNet(**kw)
    params = m.init(jax.random.PRNGKey(0), rgb[:1])
    rec["circ_img_s"] = round(measure(m, params, rgb), 1)
    rec["same_img_s"] = round(
        measure(FastPanoNet(pad="same", **kw), params, rgb), 1)

    orig = pnorm.GroupNorm.__call__

    def ident(self, x):  # identity(+fused relu) stand-in, timing only
        return nn.relu(x) if getattr(self, "fuse_relu", False) else x

    pnorm.GroupNorm.__call__ = ident
    try:
        m3 = FastPanoNet(**kw)
        p3 = m3.init(jax.random.PRNGKey(0), rgb[:1])
        rec["nonorm_img_s"] = round(measure(m3, p3, rgb), 1)
    finally:
        pnorm.GroupNorm.__call__ = orig
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
