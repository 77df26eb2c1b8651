"""Equirectangular-map utilities (EquirectangularMap member-function parity).

Ports the value-map operations of the reference's image containers that are
not covered elsewhere:

* :func:`disp_depth_conversion`   — ``DispDepthConversion``
  (reference Depth.cpp:587-610): in-place reciprocal, values with
  ``|v| < 1e-5`` kept;
* :func:`copy_invalid_pixels`     — ``CopyInvalidPixels``
  (Depth.cpp:703-725): propagate a reference map's masked (black/white)
  pixels;
* :func:`avg_valid`               — ``Avg`` (Depth.cpp:563-585): mean of
  positive values;
* :func:`minmax_normalize_valid`  — the valid-pixel minmax remap used by
  ErrorCompare's disparity path (Depth.cpp:2535-2566);
* :func:`disparity_to_depth`      — the trivial conversion helper
  (Depth.cpp:727-736).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _chan0(img):
    return img if img.ndim == 2 else img[..., 0]


def disp_depth_conversion(img):
    """Reciprocal disparity<->depth conversion; |v| < 1e-5 passes through."""
    v = _chan0(img)
    out = jnp.where(jnp.abs(v) < 1e-5, v, 1.0 / v)
    return out if img.ndim == 2 else img.at[..., 0].set(out)


def copy_invalid_pixels(img, ref):
    """Overwrite pixels whose nearest ``ref`` sample is masked (v < 1e-4 or
    v >= 1-1e-4) with that sample (mask propagation)."""
    v = _chan0(img)
    r = _chan0(ref)
    h, w = v.shape
    rh, rw = r.shape
    xs = (np.arange(w) * (rw / w)).astype(np.int64)
    ys = (np.arange(h) * (rh / h)).astype(np.int64)
    rv = r[np.clip(ys, 0, rh - 1)[:, None], np.clip(xs, 0, rw - 1)[None, :]]
    invalid = (rv < 1e-4) | (rv >= 1 - 1e-4)
    out = jnp.where(invalid, rv, v)
    return out if img.ndim == 2 else img.at[..., 0].set(out)


def avg_valid(img):
    """Mean over values > 0 (Avg); 0 if none."""
    v = _chan0(img)
    m = v > 0
    n = jnp.sum(m)
    return jnp.where(n == 0, 0.0, jnp.sum(jnp.where(m, v, 0.0)) / n)


def minmax_normalize_valid(img, eps: float = 1e-4):
    """Minmax-remap values with |v| >= eps to 0~1; near-zero kept as-is."""
    v = _chan0(img)
    m = jnp.abs(v) >= eps
    lo = jnp.min(jnp.where(m, v, jnp.inf))
    hi = jnp.max(jnp.where(m, v, -jnp.inf))
    out = jnp.where(m, (v - lo) / (hi - lo), v)
    return out if img.ndim == 2 else img.at[..., 0].set(out)


def disparity_to_depth(disparity, disparity_min: float = 0.005):
    """min/d convention: d == disparity_min -> 1, d == 1 -> disparity_min."""
    d = jnp.maximum(disparity, disparity_min)
    return disparity_min / d
