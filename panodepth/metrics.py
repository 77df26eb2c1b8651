"""Depth metrics and alignment, matching the reference's evaluation semantics.

Ports ``ErrorData`` / ``ErrorEmap`` (reference ``Depth.cpp:1980-2458``) and
``MedianScaling`` (``Depth.cpp:637-701``) to pure array math, preserving the
reference's quirks:

* the zenith band rows come from the *global* ``g_zenith_range``
  (``Depth.cpp:1983, 2222``) — our callers pass ``config.ZENITH_RANGE`` by
  default to match; the bounds are ``int(zr / pi * H)`` with both endpoint
  rows included;
* gt pixels are matched by ``X = int(x * gt_w / given_w)`` nearest lookup;
* pixels whose gt value is below 1e-4 are skipped entirely;
* depth is capped at 10 m in Matterport units: ``depth_max = 10 / (65535 /
  4000)`` in the 0~1 encoding (``Depth.cpp:2001-2002``), applied to *both*
  maps before alignment and scoring;
* ``align_way=1``: scale the given map by gt_median/given_median, where each
  median is the element at index ``n // 2`` of the sorted valid values
  (``Depth.cpp:2009-2081``);
* ``align_way=2``: closed-form least squares ``pred*s + o`` credited to
  360monodepth's metrics.py (``Depth.cpp:2082-2139``);
* MSElog compares ``log10`` and only counts pixels where both values exceed
  1e-4 *after* alignment; its denominator is tracked separately;
* delta thresholds count *failures* (ratio >= 1.25^k) only where both values
  are positive — non-positive predictions are silently counted as successes,
  exactly like the reference (``Depth.cpp:2188-2201``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import ZENITH_RANGE

# 0~1 value -> Matterport meters is * 65535 / 4000 (Depth.cpp:2001).
TO_MATTERPORT = 65535.0 / 4000.0
DEPTH_MAX = 10.0 / TO_MATTERPORT  # 10 m cap, back in the 0~1 encoding


@dataclasses.dataclass
class Metrics:
    """Paired given-vs-result metrics (reference Depth.h:161-259)."""

    mse_given: float = 0.0
    mse_result: float = 0.0
    mae_given: float = 0.0
    mae_result: float = 0.0
    mre_given: float = 0.0
    mre_result: float = 0.0
    mselog_given: float = 0.0
    mselog_result: float = 0.0
    delta1_given: float = 0.0
    delta1_result: float = 0.0
    delta2_given: float = 0.0
    delta2_result: float = 0.0
    delta3_given: float = 0.0
    delta3_result: float = 0.0

    _PAIRS = ("mse", "mae", "mre", "mselog", "delta1", "delta2", "delta3")

    def save(self, filename: str) -> None:
        """Write the per-image metrics file (.aligned.txt format).

        Byte-compatible with reference Metrics::Save (Depth.h:197-243),
        including the quirk that the delta3 diff line is gated on
        delta1_given being nonzero.
        """
        lines = []
        for name in self._PAIRS:
            g = getattr(self, f"{name}_given")
            r = getattr(self, f"{name}_result")
            lines.append(f"{name}_given: {g:f}\n{name}_result: {r:f}\n")
            gate = self.delta1_given if name == "delta3" else g
            if gate != 0:
                diff = (r - g) / g if g != 0 else math.inf
                lines.append(f"{name} diff: {diff:f}\n")
        with open(filename, "w") as fp:
            fp.write("".join(lines))

    def print(self) -> str:
        """Console summary in the reference Metrics::Print shape."""
        s = (
            f"RMSE {math.sqrt(self.mse_given)}->{math.sqrt(self.mse_result)}"
            f" MAE {self.mae_given}->{self.mae_result}"
            f" MRE {self.mre_given}->{self.mre_result}"
            f" RMSElog {math.sqrt(self.mselog_given)}->{math.sqrt(self.mselog_result)}"
            f" deltas:{self.delta1_given}->{self.delta1_result}"
            f" , {self.delta2_given}->{self.delta2_result}"
            f" , {self.delta3_given}->{self.delta3_result}"
        )
        print(s)
        return s


def _band_rows(height: int, zenith_range) -> tuple[int, int]:
    return (
        int(zenith_range[0] / np.pi * height),
        int(zenith_range[1] / np.pi * height),
    )


def _gather_gt(gt, given_shape):
    """gt value for every given pixel: X = int(x * gt_w / given_w)."""
    gh, gw = gt.shape[:2]
    h, w = given_shape
    xs = (jnp.arange(w, dtype=jnp.float32) * (gw / w)).astype(jnp.int32)
    ys = (jnp.arange(h, dtype=jnp.float32) * (gh / h)).astype(jnp.int32)
    g = gt if gt.ndim == 2 else gt[..., 0]
    return g[jnp.clip(ys, 0, gh - 1)[:, None], jnp.clip(xs, 0, gw - 1)[None, :]]


def _masked_median(vals, valid):
    """Element at index n_valid // 2 of the ascending-sorted valid values."""
    n = jnp.sum(valid)
    flat = jnp.where(valid, vals, jnp.inf).reshape(-1)
    return jnp.sort(flat)[n // 2]


def error_metrics(gt, given, align_way: int = 1, cap_depth: bool = True,
                  zenith_range=ZENITH_RANGE):
    """MSE/MAE/MRE/MSElog/delta1-3 of ``given`` vs ``gt``, jit-friendly.

    ``gt``/``given`` are 0~1 float equirect maps (any channel count; channel
    0 is used).  Returns a dict of scalars plus the alignment parameters.
    Mirrors reference ErrorEmap (Depth.cpp:2217-2458); feeding a u16 result
    buffer divided by 65535 reproduces ErrorData (Depth.cpp:1980-2216).
    """
    given = (given if given.ndim == 2 else given[..., 0]).astype(jnp.float32)
    h, w = given.shape
    h0, h1 = _band_rows(h, zenith_range)

    val0 = _gather_gt(jnp.asarray(gt, jnp.float32), (h, w))
    val1 = given
    yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    in_band = (yg >= h0) & (yg <= h1)
    valid = in_band & (val0 >= 1e-4)

    if cap_depth:
        val0 = jnp.minimum(val0, DEPTH_MAX)
        val1 = jnp.minimum(val1, DEPTH_MAX)

    median_factor = jnp.float32(1.0)
    least_square = jnp.zeros(2, jnp.float32)
    if align_way == 1:
        gt_med = _masked_median(val0, valid)
        given_med = _masked_median(val1, valid)
        median_factor = gt_med / given_med
        val1 = val1 * median_factor
    elif align_way == 2:
        v0 = jnp.where(valid, val0, 0.0)
        v1 = jnp.where(valid, val1, 0.0)
        a00 = jnp.sum(v1 * v1)
        a01 = jnp.sum(v1)
        a11 = jnp.sum(valid.astype(jnp.float32))
        b0 = jnp.sum(v0 * v1)
        b1 = jnp.sum(v0)
        det = a00 * a11 - a01 * a01
        s = (a11 * b0 - a01 * b1) / det
        o = (-a01 * b0 + a00 * b1) / det
        least_square = jnp.stack([s, o])
        val1 = val1 * s + o

    diff = val0 - val1
    n = jnp.sum(valid).astype(jnp.float32)
    msum = lambda x: jnp.sum(jnp.where(valid, x, 0.0))
    mse = msum(diff * diff) / n
    mae = msum(jnp.abs(diff)) / n
    mre = msum(jnp.abs(diff) / val0) / n

    log_ok = valid & (val0 > 1e-4) & (val1 > 1e-4)
    lv0 = jnp.log10(jnp.where(log_ok, val0, 1.0))
    lv1 = jnp.log10(jnp.where(log_ok, val1, 1.0))
    mselog = jnp.sum(jnp.where(log_ok, (lv0 - lv1) ** 2, 0.0)) / jnp.sum(log_ok)

    pos = valid & (val0 > 0) & (val1 > 0)
    r0 = jnp.where(pos, val0 / jnp.where(pos, val1, 1.0), 0.0)
    r1 = jnp.where(pos, val1 / jnp.where(pos, val0, 1.0), 0.0)
    ratio = jnp.maximum(r0, r1)
    deltas = {}
    for k in (1, 2, 3):
        fails = jnp.sum(jnp.where(pos & (ratio >= 1.25 ** k), 1.0, 0.0))
        deltas[f"delta{k}"] = (n - fails) / n

    return dict(
        mse=mse, mae=mae, mre=mre, mselog=mselog, **deltas,
        median_shift_factor=median_factor, least_square=least_square,
    )


def median_scaling(emap0, emap1):
    """Scale emap0's in-range values by emap1_median / emap0_median.

    Valid pixels are those in [1e-4, 1-1e-4); out-of-range pixels pass
    through unscaled.  Mirrors reference MedianScaling (Depth.cpp:637-701).
    Returns (scaled_emap0, emap0_median, emap1_median).
    """
    e0 = emap0 if emap0.ndim == 2 else emap0[..., 0]
    e1 = emap1 if emap1.ndim == 2 else emap1[..., 0]
    valid0 = (e0 >= 1e-4) & (e0 < 1 - 1e-4)
    valid1 = (e1 >= 1e-4) & (e1 < 1 - 1e-4)
    m0 = _masked_median(e0, valid0)
    m1 = _masked_median(e1, valid1)
    scaled = jnp.where(valid0, e0 * (m1 / m0), e0)
    if emap0.ndim == 3:
        scaled = emap0.at[..., 0].set(scaled)
    return scaled, m0, m1


def error_compare(gt_filename: str, baseline_filename: str,
                  disp_depth_compare: bool = False, align_way: int = 1,
                  cap_depth: bool = True, shifted_filename: str = None):
    """File-level comparison (ErrorCompare, reference Depth.cpp:2460-2634).

    With ``disp_depth_compare`` (the mono360 path): the baseline is treated
    as disparity, least-squares aligned to the gt's disparity, inverted to
    depth, clipped to 10, scored against the gt depth, and (optionally)
    saved minmax-normalized as an 8-bit PNG.  Without it: plain ErrorEmap on
    the two files.  The baseline file loads with mono360 PFM semantics.
    """
    import jax.numpy as jnp

    from . import io as pio
    from .ops.maps import disp_depth_conversion, minmax_normalize_valid

    gt = jnp.asarray(pio.load_image01(gt_filename))
    baseline = jnp.asarray(pio.load_image01(baseline_filename, mono360=True))

    if disp_depth_compare:
        gt_disp = disp_depth_conversion(gt)
        pre = error_metrics(gt_disp, baseline, align_way=2, cap_depth=False)
        s, o = pre["least_square"][0], pre["least_square"][1]
        base = baseline if baseline.ndim == 2 else baseline[..., 0]
        base = disp_depth_conversion(base * s + o)
        base = jnp.clip(base, 0.0, 10.0)
        res = error_metrics(gt, base, align_way=align_way,
                            cap_depth=cap_depth)
        if shifted_filename:
            out = minmax_normalize_valid(base)
            pio.save_png8(shifted_filename,
                          np.maximum(np.asarray(out), 0.0))
        return res
    res = error_metrics(gt, baseline, align_way=align_way,
                        cap_depth=cap_depth)
    if shifted_filename:
        base = baseline if baseline.ndim == 2 else baseline[..., 0]
        pio.save_png8(shifted_filename, np.maximum(np.asarray(base), 0.0))
    return res


# 5x5 LoG kernel of ErrorLaplacian (reference Depth.cpp:2904-2906), [x][y]
_LOG5 = np.zeros((5, 5), np.float64)
for _x, _y, _w in [(2, 0, -1), (1, 1, -1), (2, 1, -2), (3, 1, -1),
                   (0, 2, -1), (1, 2, -2), (2, 2, 16), (3, 2, -2), (4, 2, -1),
                   (1, 3, -1), (2, 3, -2), (3, 3, -1), (2, 4, -1)]:
    _LOG5[_y, _x] = _w


def error_laplacian(gt, baseline):
    """Gradient-space metrics (ErrorLaplacian, reference Depth.cpp:2636-2953).

    Returns dict with laplacian_mse / laplacian_mae / sobel_x_mae /
    sobel_y_mae / laplacian5x5_mae between the gt and baseline maps (0~1
    floats, possibly different sizes; gt is matched by C-cast index
    scaling).  Reference quirks preserved: the Sobel validity check omits
    the (1,0)/(2,0) gt cells, and the 5x5 bound check tests the center
    column (X2), not the rightmost.
    """
    g = np.asarray(gt if gt.ndim == 2 else gt[..., 0], np.float64)
    b = np.asarray(baseline if baseline.ndim == 2 else baseline[..., 0],
                   np.float64)
    gh, gw = g.shape
    h, w = b.shape
    rx, ry = gw / w, gh / h

    def gt_at(dx, dy, x, y):
        X = ((x + dx) * rx).astype(np.int64)
        Y = ((y + dy) * ry).astype(np.int64)
        return g[np.clip(Y, 0, gh - 1), np.clip(X, 0, gw - 1)], X, Y

    x, y = np.meshgrid(np.arange(1, w - 1), np.arange(1, h - 1))

    gv = {}
    X1p, Y1p = None, None
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            gv[(dx, dy)], X, Y = gt_at(dx, dy, x, y)
            if dx == 1 and dy == 1:
                X1p, Y1p = X, Y
    _, X0m, Y0m = gt_at(-1, -1, x, y)
    inb = (X0m >= 0) & (X1p <= gw - 1) & (Y0m >= 0) & (Y1p <= gh - 1)

    lap_valid = inb & (gv[(0, 0)] >= 1e-4) & (gv[(-1, 0)] >= 1e-4) & \
        (gv[(1, 0)] >= 1e-4) & (gv[(0, -1)] >= 1e-4) & (gv[(0, 1)] >= 1e-4)
    g_lap = gv[(0, 0)] - (gv[(-1, 0)] + gv[(1, 0)] + gv[(0, -1)]
                          + gv[(0, 1)]) / 4
    b_lap = b[y, x] - (b[y, x - 1] + b[y, x + 1] + b[y - 1, x]
                       + b[y + 1, x]) / 4
    d = np.where(lap_valid, g_lap - b_lap, 0.0)
    n_lap = lap_valid.sum()
    lap_mse = (d ** 2).sum() / n_lap
    lap_mae = np.abs(d).sum() / n_lap

    # Sobel validity: the reference checks (0,0),(0,1),(0,2),(1,1),(2,1),
    # (1,2),(2,2) in [x][y] indexing — i.e. (dx,dy) below — NOT (1,0),(2,0)
    sob_valid = inb
    for dx, dy in [(-1, -1), (-1, 0), (-1, 1), (0, 0), (1, 0), (0, 1),
                   (1, 1)]:
        sob_valid = sob_valid & (gv[(dx, dy)] >= 1e-4)
    g_sx = gv[(-1, -1)] - gv[(1, -1)] + 2 * gv[(-1, 0)] - 2 * gv[(1, 0)] \
        + gv[(-1, 1)] - gv[(1, 1)]
    g_sy = gv[(-1, -1)] + 2 * gv[(0, -1)] + gv[(1, -1)] - gv[(-1, 1)] \
        - 2 * gv[(0, 1)] - gv[(1, 1)]
    b_sx = b[y - 1, x - 1] - b[y - 1, x + 1] + 2 * b[y, x - 1] \
        - 2 * b[y, x + 1] + b[y + 1, x - 1] - b[y + 1, x + 1]
    b_sy = b[y - 1, x - 1] + 2 * b[y - 1, x] + b[y - 1, x + 1] \
        - b[y + 1, x - 1] - 2 * b[y + 1, x] - b[y + 1, x + 1]
    n_sob = sob_valid.sum()
    sx_mae = np.abs(np.where(sob_valid, g_sx - b_sx, 0.0)).sum() / n_sob
    sy_mae = np.abs(np.where(sob_valid, g_sy - b_sy, 0.0)).sum() / n_sob

    # 5x5 LoG
    x5, y5 = np.meshgrid(np.arange(2, w - 2), np.arange(2, h - 2))
    g5 = {}
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            g5[(dx, dy)], X, Y = gt_at(dx, dy, x5, y5)
    _, X0, Y0 = gt_at(-2, -2, x5, y5)
    _, X2, Y2 = gt_at(0, 0, x5, y5)
    inb5 = (X0 >= 0) & (X2 <= gw - 1) & (Y0 >= 0) & (Y2 <= gh - 1)
    valid5 = inb5
    for k in g5:
        valid5 = valid5 & (g5[k] >= 1e-4)
    g_log = sum(_LOG5[dy + 2, dx + 2] * g5[(dx, dy)]
                for dx in range(-2, 3) for dy in range(-2, 3))
    b_log = sum(_LOG5[dy + 2, dx + 2] * b[y5 + dy, x5 + dx]
                for dx in range(-2, 3) for dy in range(-2, 3))
    n5 = valid5.sum()
    log_mae = np.abs(np.where(valid5, g_log - b_log, 0.0)).sum() / n5

    return dict(laplacian_mse=lap_mse, laplacian_mae=lap_mae,
                sobel_x_mae=sx_mae, sobel_y_mae=sy_mae,
                laplacian5x5_mae=log_mae)


def paired_metrics(gt, baseline, result01, align_way=1, cap_depth=True,
                   zenith_range=ZENITH_RANGE) -> Metrics:
    """Fill a Metrics record: baseline ('given') and fused result vs gt.

    Mirrors the scoring block of MergeDepthMaps (Depth.cpp:933-947).
    ``result01`` must already be quantization-rounded (u16/65535) to match
    the reference's evaluate-after-quantize behavior (Depth.cpp:944).
    """
    g = error_metrics(gt, baseline, align_way, cap_depth, zenith_range)
    r = error_metrics(gt, result01, align_way, cap_depth, zenith_range)
    m = Metrics()
    for name in Metrics._PAIRS:
        setattr(m, f"{name}_given", float(g[name]))
        setattr(m, f"{name}_result", float(r[name]))
    return m
