"""Per-view depth registration: the TPU-native Ceres replacement.

The reference registers every perspective depth map to the baseline panorama
by fitting ``y = a x^3 + b x^2 + c x + d`` over a 1-degree sample grid with
Ceres autodiff + DENSE_SCHUR (reference ``Depth.cpp:1261-1414``,
``FunctorDepth2Depth3`` at ``Depth.cpp:1122-1138``).  The model is *linear* in
(a, b, c, d), so the nonlinear-least-squares machinery collapses to one
weighted linear least-squares solve per view — here a vmapped ``lstsq`` over
all views at once.

The sample grid depends only on the view layout and zenith band (reference
``Depth.cpp:1290-1335``), so it is precomputed on the host in float64 and
baked into the compiled graph; at runtime registration is two gathers plus a
batched (S, 4) least-squares solve.

Also provided:

* ``fit_cubic_global``      — result-vs-baseline global re-registration
  (``SolveDepthToDepth2``, reference ``Depth.cpp:1158-1259``).
* ``fit_reciprocal``        — Gauss-Newton for the disparity model
  ``y = c/(a x + b) + d`` (the reference declares ``SolveDisparityToDepth``
  at ``Depth.h:293-294`` but never defines it; ``FunctorDisparity2Depth`` at
  ``Depth.cpp:1044-1073`` and ``D2DTransform`` at ``Depth.cpp:214-243`` are
  the surviving pieces).
* ``apply_cubic`` / ``apply_reciprocal`` — the value remaps
  (``Depth2DepthTransform`` / ``D2DTransform``, ``Depth.cpp:214-274``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .config import MergeConfig
from .ops.sampling import (as01_post, sample_equirect_nearest,
                           sample_unit_nearest)

TWO_PI = 2.0 * np.pi
CLAMP_LO = 1e-4
CLAMP_HI = 1.0 - 1e-4


class SampleGrids(NamedTuple):
    """Static per-view registration sample grids, padded to a common shape.

    Shapes are (V, R, C) where R/C are the max (rows+1)/(cols+1) over views;
    ``weight`` zeroes out the padding so padded samples do not influence the
    fit (the reference builds exactly (rows+1)x(cols+1) residuals per view,
    Depth.cpp:1290-1335).
    """

    xy_x: np.ndarray      # gnomonic x in the view, clamped to [0, 1]
    xy_y: np.ndarray
    azimuth: np.ndarray   # spherical coords of each sample
    zenith: np.ndarray
    weight: np.ndarray    # 1.0 for real samples, 0.0 for padding


@functools.lru_cache(maxsize=8)
def build_sample_grids(cfg: MergeConfig) -> SampleGrids:
    ranges = cfg.clamped_ranges()
    windows = geometry.layout_windows(cfg.layout.fovs)
    step = cfg.reg_step_rad
    zr0, zr1 = cfg.zenith_range

    per_view = []
    for v in range(ranges.shape[0]):
        r0, r1, rz0, rz1 = ranges[v]
        cols = int(round(abs(r1 - r0) / step))
        zt = max(zr0, rz0)
        zd = min(zr1, rz1)
        rows = int(round(abs(zd - zt) / step))
        c = np.arange(cols + 1, dtype=np.float64)
        r = np.arange(rows + 1, dtype=np.float64)
        azi = r0 + (r1 - r0) * c / cols
        zen = zt + (zd - zt) * r / rows
        azi_g, zen_g = np.meshgrid(azi, zen)  # (rows+1, cols+1)
        win = jax.tree.map(lambda a: a[v], windows)
        x, y = geometry.spherical_to_xy(win, azi_g, zen_g, xp=np)
        per_view.append((np.clip(x, 0, 1), np.clip(y, 0, 1), azi_g, zen_g))

    R = max(p[0].shape[0] for p in per_view)
    C = max(p[0].shape[1] for p in per_view)
    V = len(per_view)
    out = [np.zeros((V, R, C), np.float64) for _ in range(5)]
    for v, (x, y, a, z) in enumerate(per_view):
        r, c = x.shape
        for buf, val in zip(out, (x, y, a, z)):
            buf[v, :r, :c] = val
        out[4][v, :r, :c] = 1.0
    return SampleGrids(*out)


def _clamp(v):
    return jnp.clip(v, CLAMP_LO, CLAMP_HI)


def _normal_solve4(A):
    """Least-squares solver for an (S, 4) system via equilibrated normal
    equations + a hand-unrolled 4x4 Cholesky, written in pure jnp
    arithmetic — no LAPACK/FFI custom calls, so the graph AOT-exports
    (``panodepth.serve``) and lowers natively on TPU.

    TPU note: the Gram matrix ``A.T @ A`` is ONE batched matmul contraction
    over S (MXU-friendly, vmaps cleanly over views x batch); the previous
    hand-unrolled Householder QR updated the full (S, 4) factor through 4
    sequential outer-product sweeps, whose HBM traffic cost 37% of fused
    merge throughput at batch 16 (257 -> 161 panos/s on the v5e — caught by
    the bench, bisected to the QR commit).  Normal equations square the
    conditioning, so the system is Jacobi-equilibrated to unit diagonal and
    callers run iterative refinement (cheap (S, 4) matvecs); with the
    centered basis in :func:`fit_cubic` the parity suites hold unchanged.

    Returns a ``solve(rhs)`` closure: rhs is ``A.T @ b`` (4,), result the
    LSQ solution (4,), reusing the factorization.
    """
    G = A.T @ A                           # (4, 4) Gram, one contraction
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(G), 1e-38))
    Gs = G * d[:, None] * d[None, :]      # unit-diagonal equilibration

    # hand-unrolled Cholesky Gs = L L^T (guards keep padding-degenerate
    # views finite; downstream clamps absorb the garbage coefficients the
    # reference would also produce for rank-deficient sample sets)
    ssqrt = lambda v: jnp.sqrt(jnp.maximum(v, 1e-38))
    l11 = ssqrt(Gs[0, 0])
    l21, l31, l41 = Gs[1, 0] / l11, Gs[2, 0] / l11, Gs[3, 0] / l11
    l22 = ssqrt(Gs[1, 1] - l21 * l21)
    l32 = (Gs[2, 1] - l31 * l21) / l22
    l42 = (Gs[3, 1] - l41 * l21) / l22
    l33 = ssqrt(Gs[2, 2] - l31 * l31 - l32 * l32)
    l43 = (Gs[3, 2] - l41 * l31 - l42 * l32) / l33
    l44 = ssqrt(Gs[3, 3] - l41 * l41 - l42 * l42 - l43 * l43)

    def solve(rhs):
        b = rhs * d
        # forward substitution L y = b
        y0 = b[0] / l11
        y1 = (b[1] - l21 * y0) / l22
        y2 = (b[2] - l31 * y0 - l32 * y1) / l33
        y3 = (b[3] - l41 * y0 - l42 * y1 - l43 * y2) / l44
        # back substitution L^T x = y
        x3 = y3 / l44
        x2 = (y2 - l43 * x3) / l33
        x1 = (y1 - l32 * x2 - l42 * x3) / l22
        x0 = (y0 - l21 * x1 - l31 * x2 - l41 * x3) / l11
        return jnp.stack([x0, x1, x2, x3]) * d

    return solve


def _chol_solve_factory(G):
    """Equilibrated Cholesky solve for a small SPD system of *static* size,
    Python-unrolled into pure jnp arithmetic — no LAPACK/FFI custom calls.

    The generic sibling of :func:`_normal_solve4` (which stays hand-tuned
    for the hot 4x4 cubic path): deserialized LAPACK FFI custom calls
    (qr/solve_triangular/solve) SEGFAULT cross-process under ``jax.export``
    on this jaxlib (CLAUDE.md env gotchas), so every solver in the public
    registration family must lower to plain arithmetic.  n is a Python int
    at trace time (degree+1 <= 5 here), so full unrolling is free.

    Returns ``solve(rhs)`` reusing the factorization.
    """
    n = G.shape[0]
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(G), 1e-38))
    Gs = G * d[:, None] * d[None, :]      # unit-diagonal equilibration
    ssqrt = lambda v: jnp.sqrt(jnp.maximum(v, 1e-38))
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = Gs[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = ssqrt(s) if i == j else s / L[j][j]

    def solve(rhs):
        b = rhs * d
        y = [None] * n
        for i in range(n):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return jnp.stack(x) * d

    return solve


def fit_cubic(x, y, weight):
    """Weighted LSQ fit of y ~ a x^3 + b x^2 + c x + d.  Returns (4,) abcd.

    Equivalent to the converged Ceres solve of FunctorDepth2Depth3 residuals
    ``w * (a X^3 + b X^2 + c X + d - Y)`` (reference Depth.cpp:1122-1138,
    1374-1375): the problem is linear so the GN/LM iteration lands on the
    normal-equations solution.  Ceres works in float64; to match it from
    f32 the fit runs in a *standardized* basis t = (x - mean) / std over
    the weighted samples — real depth data often spans a narrow slice of
    [0, 1], where a Vandermonde centered at a fixed 0.5 is nearly collinear
    (t³ ≈ const·t) and the Gram matrix's squared conditioning turns f32
    solves to garbage.  Standardization makes the moment matrix
    near-orthogonal regardless of the data's location/spread; two rounds
    of iterative refinement recover the remaining f32 error, and the
    coefficients are expanded back to powers of x exactly.
    """
    x = x.reshape(-1)
    y = y.reshape(-1)
    w = weight.reshape(-1)
    wsum = jnp.maximum(jnp.sum(w), 1e-38)
    s = jnp.sum(w * x) / wsum
    var = jnp.sum(w * (x - s) ** 2) / wsum
    sig = jnp.maximum(jnp.sqrt(var), 1e-6)
    t = (x - s) / sig
    V = jnp.stack([t * t * t, t * t, t, jnp.ones_like(t)], axis=-1)
    Vw = V * w[:, None]
    yw = y * w
    # equilibrated normal equations + two rounds of iterative refinement
    # (each refinement is two (S, 4) matvecs — cheap, and recovers the
    # f32 precision the squared conditioning costs; see _normal_solve4)
    solve = _normal_solve4(Vw)
    beta = solve(Vw.T @ yw)
    for _ in range(2):
        beta = beta + solve(Vw.T @ (yw - Vw @ beta))
    # expand a*t^3 + b*t^2 + c*t + d, t = (x - s)/sig, to powers of x:
    # first scale to the (x - s) basis, then shift by s
    a = beta[0] / (sig * sig * sig)
    b = beta[1] / (sig * sig)
    c = beta[2] / sig
    d = beta[3]
    return jnp.stack([
        a,
        b - 3 * a * s,
        c - 2 * b * s + 3 * a * s * s,
        d - c * s + b * s * s - a * s * s * s,
    ])


def grid_sample_indices(g: "SampleGrids", emap_shape, pmap_shape,
                        view=None):
    """Quantize the f64 sample grids to i32 nearest indices.

    THE single quantization rule (truncating cast after f64 scaling,
    clipped to bounds — reference Value()/ValueAtCoord nearest semantics)
    shared by :func:`register_views` and the view-parallel latency path
    (:mod:`panodepth.parallel.views`): a parity fix here reaches both.
    ``view`` selects one view's pmap grid (heterogeneous shapes);
    ``None`` quantizes all views at once.
    """
    he, we = emap_shape
    hp, wp = pmap_shape
    xy_x = g.xy_x if view is None else g.xy_x[view]
    xy_y = g.xy_y if view is None else g.xy_y[view]
    exi = np.clip((g.azimuth / TWO_PI * (we - 1)).astype(np.int32), 0, we - 1)
    eyi = np.clip((g.zenith / np.pi * (he - 1)).astype(np.int32), 0, he - 1)
    pxi = np.clip((xy_x * (wp - 1)).astype(np.int32), 0, wp - 1)
    pyi = np.clip((xy_y * (hp - 1)).astype(np.int32), 0, hp - 1)
    return exi, eyi, pxi, pyi


def register_views(emap, pmaps, cfg: MergeConfig):
    """Fit abcd for every view against the baseline emap.

    ``emap``  — (He, We[, C]) baseline equirect depth, values 0~1.
    ``pmaps`` — (V, Hp, Wp) stack of perspective depth maps, values 0~1,
    or a list of V per-view maps with heterogeneous shapes.
    Returns (V, 4) coefficients.

    Mirrors the one-active-view-at-a-time loop of reference
    Depth.cpp:789-810: each view is fit independently (vmapped here).

    The sample coordinates are static, so the nearest-neighbor gather
    *indices* are precomputed on the host in float64 at trace time (the
    image shapes are static under jit) — this keeps the registration free of
    f32 index-boundary flips and reduces the runtime work to two gathers
    plus the batched fit.
    """
    g = build_sample_grids(cfg)
    emap2d = emap if emap.ndim == 2 else emap[..., 0]
    he, we = emap2d.shape

    if isinstance(pmaps, (list, tuple)):
        # heterogeneous per-view shapes (on-device e2e path)
        cols = []
        for v, pm in enumerate(pmaps):
            exi, eyi, pxi, pyi = grid_sample_indices(
                g, (he, we), pm.shape[-2:], view=v)
            cols.append(as01_post(pm[pyi, pxi]))
        d0 = _clamp(jnp.stack(cols))
    else:
        nv, hp, wp = pmaps.shape
        exi, eyi, pxi, pyi = grid_sample_indices(g, (he, we), (hp, wp))
        vidx = np.arange(nv, dtype=np.int32)[:, None, None]
        d0 = _clamp(as01_post(pmaps[vidx, pyi, pxi]))
    d1 = _clamp(as01_post(emap2d[eyi, exi]))
    w = jnp.asarray(g.weight, jnp.float32)
    return jax.vmap(fit_cubic)(d0.astype(jnp.float32),
                               d1.astype(jnp.float32), w)


def fit_cubic_global(result01, emap, zenith_range):
    """Global result-emap -> baseline-emap cubic re-registration.

    ``result01`` is the fused panorama as 0~1 floats (H, W).  Samples every
    pixel in rows [floor(H*zr0/pi), ceil(H*zr1/pi)] inclusive, pairing the
    result value with the baseline's nearest sample at the pixel's spherical
    coord.  Mirrors reference SolveDepthToDepth2 (Depth.cpp:1158-1259).
    """
    emap2d = emap if emap.ndim == 2 else emap[..., 0]
    he, we = emap2d.shape
    h, w = result01.shape
    y0 = int(np.floor(h * zenith_range[0] / np.pi))
    y1 = int(np.ceil(h * zenith_range[1] / np.pi))
    # static pixel coords -> f64 host-side gather indices (see register_views)
    ys, xs = np.meshgrid(np.arange(y0, y1 + 1, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    azi = xs / (w - 1) * TWO_PI
    zen = ys / (h - 1) * np.pi
    exi = np.clip((azi / TWO_PI * (we - 1)).astype(np.int32), 0, we - 1)
    eyi = np.clip((zen / np.pi * (he - 1)).astype(np.int32), 0, he - 1)
    d0 = _clamp(result01[y0 : y1 + 1, :])
    d1 = _clamp(emap2d[eyi, exi])
    return fit_cubic(d0, d1, jnp.ones_like(d0))


def apply_cubic(img, abcd):
    """Depth2DepthTransform: clamp x to [1e-4, 1-1e-4], cubic remap, clamp [0,1].

    Mirrors reference Depth.cpp:245-274.
    """
    x = _clamp(img)
    a, b, c, d = abcd[..., 0], abcd[..., 1], abcd[..., 2], abcd[..., 3]
    y = ((a * x + b) * x + c) * x + d
    return jnp.clip(y, 0.0, 1.0)


def apply_reciprocal(img, abcd):
    """D2DTransform: y = c / (a x + b) + d with the same clamps.

    Mirrors reference Depth.cpp:214-243.
    """
    x = _clamp(img)
    a, b, c, d = abcd[..., 0], abcd[..., 1], abcd[..., 2], abcd[..., 3]
    y = c / (a * x + b) + d
    return jnp.clip(y, 0.0, 1.0)


def fit_poly(x, y, weight, degree: int = 3):
    """Weighted LSQ fit of y ~ sum_k c_k x^k, highest power first.

    Generalizes :func:`fit_cubic` to the reference's whole functor family:
    degree 1 = FunctorDepth2Depth/1 (Depth.cpp:1076-1121), 2 =
    FunctorDepth2Depth2 (Depth.cpp:1091-1106), 3 = FunctorDepth2Depth3 (the
    active model), 4 = FunctorDepth2Depth4 (Depth.cpp:1139-1156).  Returns
    (degree+1,) coefficients compatible with ``jnp.polyval``.
    """
    if degree == 3:
        return fit_cubic(x, y, weight)
    x = x.reshape(-1)
    y = y.reshape(-1)
    w = weight.reshape(-1)
    # standardized basis t = (x - s)/sig as in fit_cubic: the Gram matrix's
    # squared conditioning is what makes raw normal equations fragile, and
    # standardization keeps it near-orthogonal for narrow data slices
    wsum = jnp.maximum(jnp.sum(w), 1e-38)
    s = jnp.sum(w * x) / wsum
    var = jnp.sum(w * (x - s) ** 2) / wsum
    sig = jnp.maximum(jnp.sqrt(var), 1e-6)
    t = (x - s) / sig
    V = jnp.stack([t ** k for k in range(degree, -1, -1)], axis=-1)
    Vw = V * w[:, None]
    yw = y * w
    # equilibrated normal equations + iterative refinement, export-safe
    # (pure-jnp Cholesky; LAPACK qr/solve_triangular segfault cross-process
    # under jax.export on this jaxlib — see _chol_solve_factory)
    solve = _chol_solve_factory(Vw.T @ Vw)
    beta = solve(Vw.T @ yw)
    for _ in range(2):
        beta = beta + solve(Vw.T @ (yw - Vw @ beta))
    # expand sum_k b_k ((x - s)/sig)^(d-k) back to powers of x: first the
    # 1/sig^p scale into the (x - s) basis, then the binomial shift by s
    out = jnp.zeros(degree + 1, beta.dtype)
    from math import comb

    for k in range(degree + 1):  # term b_k * sig^-(d-k) * (x - s)^(d - k)
        p = degree - k
        bk = beta[k] / sig ** p
        for j in range(p + 1):  # binomial expansion into x^j
            coeff = comb(p, j) * ((-s) ** (p - j))
            out = out.at[degree - j].add(bk * coeff)
    return out


def apply_poly(img, coeffs):
    """Pointwise polynomial remap with the reference's clamps."""
    x = _clamp(img)
    return jnp.clip(jnp.polyval(coeffs, x), 0.0, 1.0)


def fit_reciprocal(x, y, weight, init=(1.0, 1.0, 1.0, 1.0), iters=50):
    """Levenberg-Marquardt fit of y ~ c / (a x + b) + d (disparity -> depth).

    The model has a gauge freedom (scaling a, b, c together), so plain
    Gauss-Newton diverges; LM damping keeps the steps finite, exactly as
    Ceres' default trust-region strategy would.  Fixed iteration count with
    accept/reject (compiler-friendly).  Covers the reference's
    declared-but-undefined SolveDisparityToDepth path (Depth.h:293-294).
    """
    x = x.reshape(-1)
    y = y.reshape(-1)
    w = weight.reshape(-1)

    def residual(p):
        a, b, c, d = p
        return w * (c / (a * x + b) + d - y)

    def cost(p):
        r = residual(p)
        return jnp.sum(r * r)

    def step(carry, _):
        p, lam = carry
        r = residual(p)
        J = jax.jacfwd(residual)(p)
        JTJ = J.T @ J
        damped = JTJ + lam * jnp.diag(jnp.diagonal(JTJ)) + 1e-12 * jnp.eye(4)
        # damped JTJ is SPD: pure-jnp Cholesky keeps the graph export-safe
        # (jnp.linalg.solve is a LAPACK FFI call that segfaults when a
        # deserialized jax.export artifact runs cross-process)
        delta = _chol_solve_factory(damped)(J.T @ r)
        p_new = p - delta
        better = cost(p_new) < cost(p)
        p = jnp.where(better, p_new, p)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (p, lam), None

    p0 = jnp.asarray(init, jnp.float32)
    (p, _), _ = jax.lax.scan(step, (p0, jnp.float32(1e-3)), None, length=iters)
    return p
