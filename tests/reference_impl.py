"""Literal, loop-based port of the reference C++ semantics (test oracle).

This module re-states the algorithms of /root/reference/Depth.cpp in slow,
obviously-faithful Python: per-pixel loops, dict-backed Laplacian windows,
C-style int-cast sampling.  It exists ONLY to validate the fast TPU
implementations in ``panodepth`` on tiny synthetic inputs.  Citations point
at the reference lines each block mirrors.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

TWO_PI = 2.0 * math.pi


def cround(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def spherical_to_world(azi, zen):
    return np.array(
        [math.sin(zen) * math.cos(azi), math.sin(zen) * math.sin(azi),
         math.cos(zen)], np.float64)


def world_to_spherical(p):
    azi = math.atan2(p[1], p[0]) % TWO_PI
    zen = math.atan2(math.hypot(p[0], p[1]), p[2])
    return azi, zen


class RefPerspectiveMap:
    """PerspectiveMap (Depth.cpp:45-274) with data as a (H, W) float array."""

    def __init__(self, data: np.ndarray, fov, ranges):
        self.data = np.asarray(data, np.float32)
        self.height, self.width = self.data.shape
        self.ranges = list(ranges)
        self.set_window(*fov)

    def set_window(self, a0, a1, z0, z1):  # Depth.cpp:120-155
        self.middle = spherical_to_world((a0 + a1) / 2, (z0 + z1) / 2)
        up = np.array([0.0, 0.0, 1.0])
        left_dir = np.cross(up, self.middle)
        left_dir /= np.linalg.norm(left_dir)
        up_dir = np.cross(left_dir, self.middle)
        up_dir /= np.linalg.norm(up_dir)
        lm = self.middle + left_dir * math.tan(abs(a1 - a0) / 2)
        rm = self.middle - left_dir * math.tan(abs(a1 - a0) / 2)
        um = self.middle - up_dir * math.tan(abs(z0 - z1) / 2)
        dm = self.middle + up_dir * math.tan(abs(z0 - z1) / 2)
        self.corner0 = lm + um - self.middle
        self.hedge = rm - lm
        self.vedge = dm - um

    def spherical_to_2d(self, azi, zen):  # Depth.cpp:168-182
        d = spherical_to_world(azi, zen)
        t = np.dot(self.middle, self.middle) / np.dot(d, self.middle)
        pos = d * t
        e = pos - self.corner0
        x = np.dot(e, self.hedge) / np.dot(self.hedge, self.hedge)
        y = np.dot(e, self.vedge) / np.dot(self.vedge, self.vedge)
        return x, y

    def value(self, x, y):  # Depth.cpp:111-118 (C int cast, no clip)
        X = int(x * (self.width - 1))
        Y = int(y * (self.height - 1))
        return float(self.data[min(max(Y, 0), self.height - 1),
                               min(max(X, 0), self.width - 1)])


def emap_value_at_coord(emap: np.ndarray, azi: float, zen: float) -> float:
    """EquirectangularMap::ValueAtCoord (Depth.cpp:551-556)."""
    h, w = emap.shape[:2]
    x = int(azi / TWO_PI * (w - 1))
    y = int(zen / math.pi * (h - 1))
    v = emap[min(max(y, 0), h - 1), min(max(x, 0), w - 1)]
    return float(v if np.ndim(v) == 0 else v[0])


def clamp01eps(v: float) -> float:
    return min(max(v, 1e-4), 1.0 - 1e-4)


def ref_solve_depth_to_depth(emap, pmap: RefPerspectiveMap, zenith_range,
                             step=math.radians(1.0)):
    """SolveDepthToDepth sample build + converged cubic fit.

    Sample construction mirrors Depth.cpp:1290-1364; the Ceres solve of the
    linear-in-parameters cubic is replaced by float64 lstsq (its fixed
    point).  Returns (abcd, xs, ys) with the raw sample pairs.
    """
    r0, r1, rz0, rz1 = pmap.ranges
    cols = cround(abs(r1 - r0) / step)
    zt = max(zenith_range[0], rz0)
    zd = min(zenith_range[1], rz1)
    rows = cround(abs(zd - zt) / step)
    xs, ys = [], []
    for r in range(rows + 1):
        for c in range(cols + 1):
            azi = r0 + (r1 - r0) * c / cols
            zen = zt + (zd - zt) * r / rows
            x, y = pmap.spherical_to_2d(azi, zen)
            x = min(max(x, 0.0), 1.0)
            y = min(max(y, 0.0), 1.0)
            xs.append(clamp01eps(pmap.value(x, y)))
            ys.append(clamp01eps(emap_value_at_coord(emap, azi, zen)))
    X = np.asarray(xs, np.float64)
    Y = np.asarray(ys, np.float64)
    V = np.stack([X ** 3, X ** 2, X, np.ones_like(X)], axis=-1)
    abcd, *_ = np.linalg.lstsq(V, Y, rcond=None)
    return abcd, X, Y


def ref_depth2depth_transform(data, abcd):
    """Depth2DepthTransform (Depth.cpp:245-274)."""
    a, b, c, d = (float(v) for v in abcd)
    x = np.clip(data, 1e-4, 1 - 1e-4).astype(np.float32)
    return np.clip(a * x ** 3 + b * x ** 2 + c * x + d, 0.0, 1.0)


def ref_solve_depth_all(emap, pmaps: List[RefPerspectiveMap], out_width,
                        out_height, zenith_range, schedule=(200, 100, 50),
                        step_size=0.5, reg=1e-4):
    """SolveDepthAll (Depth.cpp:1416-1771), dict-backed, loop-by-loop."""
    max_level = len(schedule)
    buffer_prev = None
    data = np.zeros((out_height, out_width), np.uint16)
    for level in range(max_level):
        width = out_width // 2 ** (max_level - 1 - level)
        height = out_height // 2 ** (max_level - 1 - level)
        height0 = int(math.floor(height * zenith_range[0] / math.pi))
        height1 = int(math.ceil(height * zenith_range[1] / math.pi))
        buf = np.zeros((height, width), np.float32)
        if level == 0:  # Depth.cpp:1441-1465
            for y in range(height):
                for x in range(width):
                    if y < height0 or y > height1:
                        buf[y, x] = 0
                    else:
                        azi = x / (width - 1) * TWO_PI
                        zen = y / (height - 1) * math.pi
                        buf[y, x] = emap_value_at_coord(emap, azi, zen)
        else:  # Depth.cpp:1466-1485
            for y in range(height):
                for x in range(width):
                    buf[y, x] = buffer_prev[y // 2, x // 2]

        # mask build (Depth.cpp:1487-1624)
        windows: List[Dict] = [dict(mask={}, lap=0.0)
                               for _ in range(width * height)]
        for p, pmap in enumerate(pmaps):
            r = pmap.ranges
            x0 = cround(r[0] / TWO_PI * (width - 1))
            x1 = cround(r[1] / TWO_PI * (width - 1))
            y0 = cround(r[2] / math.pi * (height - 1))
            y1 = cround(r[3] / math.pi * (height - 1))
            xs = 1 if x1 >= x0 else -1
            x0 = min(max(x0, 0), width - 1)
            x1 = min(max(x1, 0), width - 1)
            y0 = max(y0, height0 + 1)
            y1 = min(y1, height1 - 1)
            X = x0
            while True:  # walks [x0, x1) stepping xs (Depth.cpp:1566-1623)
                for Y in range(y0, y1 + 1):
                    mask = {
                        (X, Y): 1.0,
                        (X - xs, Y): -0.25, (X + xs, Y): -0.25,
                        (X, Y - 1): -0.25, (X, Y + 1): -0.25,
                    }
                    lap = 0.0
                    for (xx, yy), wgt in mask.items():
                        azi = xx / (width - 1) * TWO_PI
                        zen = yy / (height - 1) * math.pi
                        sx, sy = pmap.spherical_to_2d(azi, zen)
                        lap += pmap.value(min(max(sx, 0), 1),
                                          min(max(sy, 0), 1)) * wgt
                    win = windows[Y * width + X]
                    for k, wgt in mask.items():
                        win["mask"][k] = win["mask"].get(k, 0.0) + wgt
                    win["lap"] += lap
                X += xs
                if X == x1:
                    break

        # renormalize (Depth.cpp:1626-1647)
        for ii in range(width * height):
            Y, X = ii // width, ii % width
            if Y <= height0 or Y >= height1:
                continue
            win = windows[ii]
            cw = win["mask"].get((X, Y), 0.0)
            if cw != 0.0 and cw != 1.0:
                scale = 1.0 / cw
                for k in win["mask"]:
                    win["mask"][k] *= scale
                win["lap"] *= scale

        # Jacobi iterations (Depth.cpp:1649-1717)
        iters = schedule[level]
        for _ in range(iters):
            new = buf.copy()
            for ii in range(width * (height1 - height0 + 1)):
                Y = ii // width + height0
                X = ii % width
                win = windows[Y * width + X]
                lap_cur = 0.0
                for (xx, yy), wgt in win["mask"].items():
                    # the C++ reads buffer[yy*width+xx] with a FLAT index;
                    # xx outside [0,width) wraps into the adjacent row
                    # (benign out-of-bounds, Depth.cpp:1696-1701) — emulate
                    flat = yy * width + xx
                    flat = min(max(flat, 0), width * height - 1)
                    lap_cur += buf.flat[flat] * wgt
                tgt = buf[Y, X] + (win["lap"] - lap_cur) * step_size
                val = tgt * (1 - reg) + buf[Y, X] * reg
                new[Y, X] = min(max(val, 0.0), 1.0)
            buf = new

        if level == max_level - 1:  # Depth.cpp:1720-1736
            data = (np.clip(buf, 0.0, 1.0) * 65535.0).astype(np.uint16)
        buffer_prev = buf
    return data


def ref_error_emap(gt, given, align_way=1, cap_depth=True,
                   zenith_range=(math.radians(26), math.radians(154))):
    """ErrorEmap (Depth.cpp:2217-2458), literal loops."""
    gh, gw = gt.shape[:2]
    h, w = given.shape[:2]
    height0 = int(zenith_range[0] / math.pi * h)
    height1 = int(zenith_range[1] / math.pi * h)
    ratio_x, ratio_y = gw / w, gh / h
    depth_max = 10.0 / (65535.0 / 4000.0)

    def pairs():
        for y in range(h):
            if y < height0 or y > height1:
                continue
            for x in range(w):
                X, Y = int(x * ratio_x), int(y * ratio_y)
                v0, v1 = float(gt[Y, X]), float(given[y, x])
                if v0 < 1e-4:
                    continue
                if cap_depth:
                    v0, v1 = min(v0, depth_max), min(v1, depth_max)
                yield v0, v1

    factor, ls = 1.0, (1.0, 0.0)
    if align_way == 1:
        g0 = sorted(v0 for v0, _ in pairs())
        g1 = sorted(v1 for _, v1 in pairs())
        factor = g0[len(g0) // 2] / g1[len(g1) // 2]
    elif align_way == 2:
        a00 = a01 = a11 = b0 = b1 = 0.0
        for v0, v1 in pairs():
            a00 += v1 * v1
            a01 += v1
            a11 += 1
            b0 += v0 * v1
            b1 += v0
        det = a00 * a11 - a01 * a01
        ls = ((a11 * b0 - a01 * b1) / det, (-a01 * b0 + a00 * b1) / det)

    mse = mae = mre = mselog = 0.0
    n = nlog = d1f = d2f = d3f = 0
    for v0, v1 in pairs():
        if align_way == 1:
            v1 *= factor
        elif align_way == 2:
            v1 = v1 * ls[0] + ls[1]
        mse += (v0 - v1) ** 2
        mae += abs(v0 - v1)
        mre += abs(v0 - v1) / v0
        if v0 > 1e-4 and v1 > 1e-4:
            mselog += (math.log10(v0) - math.log10(v1)) ** 2
            nlog += 1
        if v0 > 0 and v1 > 0:
            rmax = max(v0 / v1, v1 / v0)
            d1f += rmax >= 1.25
            d2f += rmax >= 1.25 ** 2
            d3f += rmax >= 1.25 ** 3
        n += 1
    return dict(
        mse=mse / n, mae=mae / n, mre=mre / n, mselog=mselog / nlog,
        delta1=(n - d1f) / n, delta2=(n - d2f) / n, delta3=(n - d3f) / n,
        median_shift_factor=factor, least_square=ls,
    )


def ref_error_laplacian(gt, baseline):
    """ErrorLaplacian (Depth.cpp:2636-2953), literal loops."""
    g = gt if gt.ndim == 2 else gt[..., 0]
    b = baseline if baseline.ndim == 2 else baseline[..., 0]
    gh, gw = g.shape
    h, w = b.shape
    rx, ry = gw / w, gh / h
    lap_mse = lap_mae = sx_mae = sy_mae = log_mae = 0.0
    n_lap = n_sob = n5 = 0
    for x in range(1, w - 1):
        for y in range(1, h - 1):
            X = int(x * rx); X0 = int((x - 1) * rx); X1 = int((x + 1) * rx)
            Y = int(y * ry); Y0 = int((y - 1) * ry); Y1 = int((y + 1) * ry)
            if X0 < 0 or X1 > gw - 1 or Y0 < 0 or Y1 > gh - 1:
                continue
            val = [[float(g[yy, xx]) for yy in (Y0, Y, Y1)]
                   for xx in (X0, X, X1)]  # val[x][y]
            if not (val[1][1] < 1e-4 or val[0][1] < 1e-4 or val[2][1] < 1e-4
                    or val[1][0] < 1e-4 or val[1][2] < 1e-4):
                g_lap = val[1][1] - (val[0][1] + val[2][1] + val[1][0]
                                     + val[1][2]) / 4
                b_lap = float(b[y, x]) - (float(b[y, x - 1]) + float(b[y, x + 1])
                                          + float(b[y - 1, x]) + float(b[y + 1, x])) / 4
                lap_mse += (g_lap - b_lap) ** 2
                lap_mae += abs(g_lap - b_lap)
                n_lap += 1
            # NOTE: reference's validity check omits val[1][0]/val[2][0]
            if not (val[0][0] < 1e-4 or val[0][1] < 1e-4 or val[0][2] < 1e-4
                    or val[1][1] < 1e-4 or val[2][1] < 1e-4
                    or val[1][2] < 1e-4 or val[2][2] < 1e-4):
                g_sx = val[0][0] - val[2][0] + 2 * val[0][1] - 2 * val[2][1] \
                    + val[0][2] - val[2][2]
                g_sy = val[0][0] + 2 * val[1][0] + val[2][0] - val[0][2] \
                    - 2 * val[1][2] - val[2][2]
                B = [[float(b[y + dy, x + dx]) for dy in (-1, 0, 1)]
                     for dx in (-1, 0, 1)]
                b_sx = B[0][0] - B[2][0] + 2 * B[0][1] - 2 * B[2][1] \
                    + B[0][2] - B[2][2]
                b_sy = B[0][0] + 2 * B[1][0] + B[2][0] - B[0][2] \
                    - 2 * B[1][2] - B[2][2]
                sx_mae += abs(g_sx - b_sx)
                sy_mae += abs(g_sy - b_sy)
                n_sob += 1
    for x in range(2, w - 2):
        for y in range(2, h - 2):
            Xs = [int((x + d) * rx) for d in (-2, -1, 0, 1, 2)]
            Ys = [int((y + d) * ry) for d in (-2, -1, 0, 1, 2)]
            if Xs[0] < 0 or Xs[2] > gw - 1 or Ys[0] < 0 or Ys[2] > gh - 1:
                continue
            val = [[float(g[Ys[j], Xs[i]]) for j in range(5)]
                   for i in range(5)]  # val[x][y]
            if any(val[i][j] < 1e-4 for i in range(5) for j in range(5)):
                continue
            def log5(V):
                return (-V[2][0] - V[1][1] - 2 * V[2][1] - V[3][1]
                        - V[0][2] - 2 * V[1][2] + 16 * V[2][2] - 2 * V[3][2]
                        - V[4][2] - V[1][3] - 2 * V[2][3] - V[3][3] - V[2][4])
            B = [[float(b[y + j - 2, x + i - 2]) for j in range(5)]
                 for i in range(5)]
            log_mae += abs(log5(val) - log5(B))
            n5 += 1
    return dict(laplacian_mse=lap_mse / n_lap, laplacian_mae=lap_mae / n_lap,
                sobel_x_mae=sx_mae / n_sob, sobel_y_mae=sy_mae / n_sob,
                laplacian5x5_mae=log_mae / n5)
