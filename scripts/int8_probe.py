"""Microbenchmark: do int8 convs beat bf16 on this TPU at our shapes?

Evidence-gathering for a possible int8 post-training quantization of
PerspectiveDepthNet (the e2e bottleneck, ~42% MFU in bf16 — PERF.md).
v5e's int8 MXU peak is 2x the bf16 peak, but that only materializes if
XLA lowers int8 `conv_general_dilated` onto the MXU at these shapes and
the quantize/dequantize overhead doesn't eat the win.

Times, per shape: (a) bf16 conv, (b) int8 conv with int32 accumulation,
(c) int8 conv + per-channel dequant + bf16 requant of the output (the
realistic PTQ inner step).  One JSON line at the end.

Run on the real chip (axon); CPU works for smoke but the numbers are
meaningless there.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# dominant conv shapes of PerspectiveDepthNet at the e2e condition
# (batch 8 panoramas = 120 view images of 256x256); (N, H, W, Cin, Cout).
SHAPES = [
    (120, 64, 64, 64, 64),      # stage-1 resblocks
    (120, 32, 32, 128, 128),    # stage-2
    (120, 16, 16, 256, 256),    # stage-3
    (120, 8, 8, 512, 512),      # stage-4
    (120, 64, 64, 128, 128),    # decoder fusion @ /4
    (120, 128, 128, 128, 128),  # decoder fusion @ /2 (the FLOPs peak)
]

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (3, 3, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.RandomState(0)
    rows = []
    for (n, h, w, ci, co) in SHAPES:
        x = jnp.asarray(rng.randn(n, h, w, ci), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 128, (n, h, w, ci)), jnp.int8)
        ki = jnp.asarray(rng.randint(-127, 128, (3, 3, ci, co)), jnp.int8)
        scale = jnp.asarray(rng.rand(co) * 1e-3, jnp.float32)

        @jax.jit
        def conv_bf16(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=DN)

        @jax.jit
        def conv_i8(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32)

        @jax.jit
        def conv_i8_deq(x, k, s):
            y = lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            # per-channel dequant + relu + requant to int8 (the PTQ
            # steady-state inner step between conv layers)
            yf = y.astype(jnp.float32) * s
            yf = jnp.maximum(yf, 0.0)
            return jnp.clip(jnp.round(yf * 127.0), -127, 127).astype(jnp.int8)

        try:
            t_bf16 = timeit(conv_bf16, x, k)
            t_i8 = timeit(conv_i8, xi, ki)
            t_i8d = timeit(conv_i8_deq, xi, ki, scale)
            rows.append({
                "shape": [n, h, w, ci, co],
                "bf16_ms": round(t_bf16 * 1e3, 3),
                "int8_ms": round(t_i8 * 1e3, 3),
                "int8_deq_ms": round(t_i8d * 1e3, 3),
                "int8_speedup": round(t_bf16 / t_i8, 3),
                "int8_deq_speedup": round(t_bf16 / t_i8d, 3),
            })
        except Exception as e:  # int8 conv may not lower on some backends
            rows.append({"shape": [n, h, w, ci, co], "error": str(e)[:200]})

    print(json.dumps({"backend": jax.default_backend(), "rows": rows}),
          flush=True)


if __name__ == "__main__":
    main()
