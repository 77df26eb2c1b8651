"""On-chip kernel validation: run on the real TPU (not under tests/,
whose conftest pins the CPU platform).

Checks every Pallas kernel against its jnp/flax reference on the actual
Mosaic lowering and prints one JSON line per check:

    {"check": ..., "ok": bool, "max_diff": ...}

With ``--bench`` it also times each kernel against the XLA path it
replaces (and, when the zoo is present, A/Bs the fused GroupNorm through
the full batched e2e graph), emitting::

    {"bench": ..., "fused_ms": ..., "xla_ms": ..., "speedup": ...}

Usage:  python scripts/tpu_validate.py [--bench]
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
    from panodepth.kernels.jacobi import HALO, pallas_jacobi

    rng = np.random.RandomState(0)
    ok_all = True
    for h, w, iters in [(128, 256, 50), (512, 1024, 200)]:
        buf = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(-0.1, 0.1, (h, w)).astype(np.float32))
        # coverage honors the kernel's contract (covered pixels >= HALO
        # rows inside the image edge — guaranteed in production by the
        # zenith-band clamp, reference Depth.cpp:1558-1562; at the edge
        # the jnp path's vertical roll and the kernel's zero halo differ
        # by design)
        cov_np = rng.uniform(0, 1, (h, w)) > 0.3
        cov_np[:HALO] = False
        cov_np[-HALO:] = False
        cov = jnp.asarray(cov_np)
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
    # (8, 128, 128, 128) exceeds the VMEM gate (double-buffered in+out
    # blocks alone are 16 MB on-chip — aliasing does not share their VMEM
    # windows) and must route to the flax fallback; the gate rejecting it
    # is the correct behavior, so it is pinned as expected-unsupported.
    expected_unsupported = {(8, 128, 128, 128)}
    # the shapes the three families actually feed it (bf16 inference)
    for shape, groups in [((8, 128, 128, 32), 32), ((8, 64, 64, 64), 32),
                          ((8, 128, 128, 128), 32), ((8, 8, 8, 512), 32),
                          ((4, 32, 512, 16), 16), ((4, 48, 256), 32)]:
        if not groupnorm.supported(shape, groups):
            expected = shape in expected_unsupported
            emit(f"groupnorm_{'x'.join(map(str, shape))}", expected, -1.0,
                 note="unsupported shape (expected: VMEM gate)" if expected
                 else "unsupported shape (gate regression)")
            ok_all &= expected
            continue
        if shape in expected_unsupported:
            emit(f"groupnorm_{'x'.join(map(str, shape))}", False, -1.0,
                 note="gate admits a shape measured to OOM on-chip")
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


def check_int8_conv() -> bool:
    """int8 x int8 -> int32 conv (the QConv inner op) is integer-EXACT on
    the device: compare against a numpy patch-einsum oracle bit-for-bit
    (3*3*64 * 127^2 ~ 9.3e6 per tap, far inside int32)."""
    from jax import lax

    rng = np.random.RandomState(5)
    n, h, w, ci, co = 2, 16, 16, 64, 32
    x = rng.randint(-127, 128, (n, h, w, ci)).astype(np.int8)
    k = rng.randint(-127, 128, (3, 3, ci, co)).astype(np.int8)

    y = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    got = np.asarray(jax.device_get(y), np.int64)

    xp = np.pad(x.astype(np.int64), ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((n, h, w, co), np.int64)
    for dy in range(3):
        for dx in range(3):
            want += np.einsum("nhwc,co->nhwo",
                              xp[:, dy:dy + h, dx:dx + w, :],
                              k[dy, dx].astype(np.int64))
    d = float(np.max(np.abs(got - want)))
    ok = d == 0.0
    emit("int8_conv_int32_accum_exact", ok, d)
    return ok


from bench import sync as _sync  # noqa: E402  (repo root is on sys.path)
# the tunnel-safe host-readback fence lives in bench.py — one copy only,
# so a fix to the fence semantics applies to both benches at once


def _time_ms(fn, reps: int = 20, trials: int = 5) -> float:
    """Median per-call milliseconds; enqueue ``reps`` then fence once."""
    import time

    _sync(fn())  # compile + warm
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        _sync(out)
        vals.append((time.perf_counter() - t0) / reps * 1e3)
    return float(np.median(vals))


def bench_groupnorm() -> None:
    """Fused-GN kernel vs the stock flax/XLA lowering, per e2e shape."""
    from panodepth.kernels import groupnorm

    rng = np.random.RandomState(3)
    for shape, groups in [((120, 128, 128, 32), 32), ((120, 64, 64, 64), 32),
                          ((120, 32, 32, 128), 32), ((8, 128, 256, 32), 32)]:
        if not groupnorm.supported(shape, groups):
            print(json.dumps({"bench": f"groupnorm_{'x'.join(map(str, shape))}",
                              "note": "VMEM-gated to the flax path"}),
                  flush=True)
            continue
        c = shape[-1]
        x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)
                        ).astype(jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        fused = jax.jit(lambda x: groupnorm.group_norm(
            x, scale, bias, groups, relu=True))
        gn = nn.GroupNorm(num_groups=groups, dtype=jnp.bfloat16)
        variables = {"params": {"scale": scale, "bias": bias}}
        xla = jax.jit(lambda x: nn.relu(gn.apply(variables, x)))
        f_ms, x_ms = _time_ms(lambda: fused(x)), _time_ms(lambda: xla(x))
        print(json.dumps({"bench": f"groupnorm_{'x'.join(map(str, shape))}",
                          "fused_ms": round(f_ms, 4),
                          "xla_ms": round(x_ms, 4),
                          "speedup": round(x_ms / f_ms, 3)}), flush=True)


def bench_percentile() -> None:
    """predict_depth01's per-image 99th percentile: sort vs top_k.

    jnp.percentile lowers to a full (bitonic) sort per image on TPU;
    lax.top_k of the top 1% is the cheaper exact-rank alternative.  This
    quantifies whether the normalize step is worth optimizing in the e2e
    graph (models/perspective.py predict_depth01).
    """
    x = jnp.asarray(np.random.RandomState(5).rand(120, 65536)
                    .astype(np.float32))
    k = int(0.01 * x.shape[1]) + 1

    sort_fn = jax.jit(lambda x: jnp.percentile(x, 99.0, axis=1))
    topk_fn = jax.jit(lambda x: jax.lax.top_k(x, k)[0][:, -1])
    apprx_fn = jax.jit(lambda x: jax.lax.approx_max_k(x, k)[0][:, -1])
    s_ms = _time_ms(lambda: sort_fn(x))
    t_ms = _time_ms(lambda: topk_fn(x))
    a_ms = _time_ms(lambda: apprx_fn(x))
    print(json.dumps({"bench": "percentile99_120x65536",
                      "sort_ms": round(s_ms, 4),
                      "topk_ms": round(t_ms, 4),
                      "approx_topk_ms": round(a_ms, 4),
                      "speedup_topk": round(s_ms / t_ms, 3),
                      "speedup_approx": round(s_ms / a_ms, 3)}),
          flush=True)


def bench_e2e_groupnorm_ab() -> None:
    """Full batched e2e graph (zoo weights) with the fused GN off vs on."""
    zoo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "zoo")
    persp = os.path.join(zoo, "perspective_final.params.npz")
    base = os.path.join(zoo, "panoramic_final.params.npz")
    if not (os.path.exists(persp) and os.path.exists(base)):
        print(json.dumps({"bench": "e2e_groupnorm_ab",
                          "note": "zoo missing, skipped"}), flush=True)
        return
    from panodepth.config import MergeConfig
    from panodepth.e2e import build_batched_e2e, load_model_checkpoint

    cfg = MergeConfig(out_width=2048)
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    pm, pp, pa = load_model_checkpoint(persp, norm_dtype=nd)
    bm, bp, ba = load_model_checkpoint(base, norm_dtype=nd)
    rgbs = jnp.asarray(np.random.RandomState(4).randint(
        0, 256, (8, 1024, 2048, 3)).astype(np.uint8))
    res = {}
    for label, flag in [("off", "0"), ("on", "1")]:
        os.environ["PANODEPTH_FUSED_GN"] = flag
        fn, _, _ = build_batched_e2e(
            pm, pp, cfg, view_width=pa.get("view_size", 512),
            base_model=bm, base_params=bp, base_w=ba.get("pano_width", 512))
        res[label] = _time_ms(lambda: fn(rgbs)[0], reps=4, trials=5) / 8
    os.environ.pop("PANODEPTH_FUSED_GN", None)
    print(json.dumps({"bench": "e2e_groupnorm_ab_b8",
                      "off_ms_per_pano": round(res["off"], 3),
                      "on_ms_per_pano": round(res["on"], 3),
                      "speedup": round(res["off"] / res["on"], 3)}),
          flush=True)


def bench_e2e_variants() -> None:
    """Full batched e2e graph (zoo weights): the candidate default flips.

    A/Bs the packed-u32 baseline against (a) PANODEPTH_P99=approx (the
    approx_max_k percentile normalize) and (b) extract_dtype='packed16'
    (RGB565 tables, half the gathered bytes) with approx.  Timing only —
    the accuracy side runs through the held-out CLI proof.
    """
    zoo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "zoo")
    persp = os.path.join(zoo, "perspective_final.params.npz")
    base = os.path.join(zoo, "panoramic_final.params.npz")
    if not (os.path.exists(persp) and os.path.exists(base)):
        print(json.dumps({"bench": "e2e_variants",
                          "note": "zoo missing, skipped"}), flush=True)
        return
    from panodepth.config import MergeConfig
    from panodepth.e2e import build_batched_e2e, load_model_checkpoint

    cfg = MergeConfig(out_width=2048)
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    pm, pp, pa = load_model_checkpoint(persp, norm_dtype=nd)
    bm, bp, ba = load_model_checkpoint(base, norm_dtype=nd)
    rgbs = jnp.asarray(np.random.RandomState(4).randint(
        0, 256, (8, 1024, 2048, 3)).astype(np.uint8))
    res = {}
    saved_p99 = os.environ.get("PANODEPTH_P99")  # restore, don't clobber
    try:
        for label, (ex, p99) in [("packed_sort", ("packed", "sort")),
                                 ("packed_approx", ("packed", "approx")),
                                 ("packed16_approx", ("packed16", "approx")),
                                 ("pair16_approx", ("pair16", "approx"))]:
            os.environ["PANODEPTH_P99"] = p99
            fn, _, _ = build_batched_e2e(
                pm, pp, cfg, view_width=pa.get("view_size", 512),
                base_model=bm, base_params=bp,
                base_w=ba.get("pano_width", 512), extract_dtype=ex)
            res[label] = _time_ms(lambda: fn(rgbs)[0], reps=4, trials=5) / 8
    finally:
        if saved_p99 is None:
            os.environ.pop("PANODEPTH_P99", None)
        else:
            os.environ["PANODEPTH_P99"] = saved_p99
    base_ms = res["packed_sort"]
    print(json.dumps({"bench": "e2e_variants_b8", **{
        f"{k}_ms_per_pano": round(v, 3) for k, v in res.items()}, **{
        f"speedup_{k}": round(base_ms / v, 3)
        for k, v in res.items() if k != "packed_sort"}}), flush=True)


def main() -> int:
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    ok = True
    ok &= check_jacobi()
    ok &= check_groupnorm()
    ok &= check_packed_sampling()
    ok &= check_int8_conv()
    if "--bench" in sys.argv[1:] or "--bench-variants" in sys.argv[1:]:
        if jax.default_backend() != "tpu":
            print(json.dumps({"bench": "skipped",
                              "note": "--bench needs the real TPU"}),
                  flush=True)
        elif "--bench-variants" in sys.argv[1:]:
            bench_e2e_variants()  # just the e2e extract/p99 variant A/B
        else:
            bench_groupnorm()
            bench_percentile()
            bench_e2e_groupnorm_ab()
            bench_e2e_variants()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
