"""On-chip kernel validation: run on the real TPU (not under tests/,
whose conftest pins the CPU platform).

Checks every Pallas kernel against its jnp/flax reference on the actual
Mosaic lowering and prints one JSON line per check:

    {"check": ..., "ok": bool, "max_diff": ...}

Usage:  python scripts/tpu_validate.py
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def emit(check: str, ok: bool, max_diff: float, **extra):
    print(json.dumps({"check": check, "ok": bool(ok),
                      "max_diff": float(max_diff), **extra}), flush=True)


def check_jacobi() -> bool:
    from panodepth import fusion
    from panodepth.kernels.jacobi import pallas_jacobi

    rng = np.random.RandomState(0)
    ok_all = True
    for h, w, iters in [(128, 256, 50), (512, 1024, 200)]:
        buf = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(-0.1, 0.1, (h, w)).astype(np.float32))
        cov = jnp.asarray((rng.uniform(0, 1, (h, w)) > 0.3))
        a = fusion.jacobi(buf, tgt, cov, iters, 0.5, 1e-4)
        b = pallas_jacobi(buf, tgt, cov, iters, 0.5, 1e-4)
        d = float(jnp.max(jnp.abs(a - b)))
        ok = d == 0.0  # bit-equal per kernel contract
        ok_all &= ok
        emit(f"pallas_jacobi_{h}x{w}_{iters}it", ok, d)
    return ok_all


def check_groupnorm() -> bool:
    from panodepth.kernels import groupnorm

    rng = np.random.RandomState(1)
    ok_all = True
    # the shapes the three families actually feed it (bf16 inference)
    for shape, groups in [((8, 128, 128, 32), 32), ((8, 64, 64, 64), 32),
                          ((8, 128, 128, 128), 32), ((8, 8, 8, 512), 32),
                          ((4, 32, 512, 16), 16), ((4, 48, 256), 32)]:
        if not groupnorm.supported(shape, groups):
            emit(f"groupnorm_{'x'.join(map(str, shape))}", False, -1.0,
                 note="unsupported shape (gate regression)")
            ok_all = False
            continue
        c = shape[-1]
        x = jnp.asarray(rng.normal(0.3, 1.7, shape).astype(np.float32)
                        ).astype(jnp.bfloat16)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
        bias = jnp.asarray(rng.uniform(-1, 1, c).astype(np.float32))
        got = groupnorm.group_norm(
            x, scale, bias, groups, out_dtype=jnp.bfloat16,
            interpret=jax.default_backend() != "tpu")
        ref = nn.GroupNorm(num_groups=groups, dtype=jnp.bfloat16).apply(
            {"params": {"scale": scale, "bias": bias}}, x)
        g = np.asarray(got, np.float32)
        w = np.asarray(ref, np.float32)
        d = np.abs(g - w)
        tol = 2 ** -7 * np.maximum(1.0, np.abs(w))  # 2 bf16 ulps
        ok = bool((d <= tol).all())
        ok_all &= ok
        emit(f"groupnorm_{'x'.join(map(str, shape))}", ok, float(d.max()))
    return ok_all


def check_packed_sampling() -> bool:
    from panodepth.ops.sampling import (pack_rgb_u32,
                                        sample_equirect_bilinear,
                                        sample_equirect_bilinear_packed)

    rng = np.random.RandomState(2)
    rgb8 = rng.randint(0, 256, (256, 512, 3)).astype(np.uint8)
    rgb = jnp.asarray(rgb8.astype(np.float32) / 255.0)
    azi = jnp.asarray(rng.uniform(0, 2 * np.pi, (64, 64)).astype(np.float32))
    zen = jnp.asarray(rng.uniform(0.1, 3.0, (64, 64)).astype(np.float32))
    a = sample_equirect_bilinear(rgb, azi, zen)
    b = sample_equirect_bilinear_packed(pack_rgb_u32(jnp.asarray(rgb8)),
                                        azi, zen)
    d = float(jnp.max(jnp.abs(a - b)))
    ok = d <= 1e-6
    emit("packed_bilinear_vs_f32_u8src", ok, d)
    return ok


def main() -> int:
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    ok = True
    ok &= check_jacobi()
    ok &= check_groupnorm()
    ok &= check_packed_sampling()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
