"""Pallas TPU kernel: fused multi-iteration Jacobi relaxation.

The jnp fallback (:func:`panodepth.fusion.jacobi`) round-trips the buffer
through HBM every iteration (~24 MB of traffic per finest-level iteration at
2048x1024).  This kernel keeps the buffer resident in VMEM:

* levels that fit in VMEM run ALL their iterations in a single grid cell —
  one HBM read + one write for the whole schedule;
* the finest level is split into row bands with a K-deep halo (temporal
  blocking): each band runs K iterations in VMEM, the valid region shrinking
  one row per iteration, so K iterations cost one HBM round trip instead
  of K.

x-axis wraparound (azimuth seam) uses in-register rolls over the full-width
rows; y-halo rows are zero-padded — legal because covered pixels sit
strictly inside the zenith band, >= K rows from the image edge (reference
Depth.cpp:1558-1562 clamps them there).

Numerics are identical to the jnp path (same op order per iteration), so the
fusion parity tests hold for either backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-level iteration counts are 200/100/50 (Depth.cpp:1654-1675): K=10
# iterations per banded pass divides all of them; the halo is 16 rows
# (>= K, and 8-row aligned as Mosaic's VMEM tiling requires).  Very wide
# rows drop to (k=5, halo=8) and arbitrary iteration counts get a
# remainder pass — see _band_config / _pallas_jacobi_impl.
K_PER_PASS = 10
HALO = 16
# budget for the single-block path: 3 arrays resident + temporaries
_SINGLE_BLOCK_BYTES = 4 * 1024 * 1024


def _step(B, tgt, cov, step, one_minus_reg, reg):
    from ..fusion import lap4_refwrap

    upd = B + (tgt - lap4_refwrap(B)) * step
    upd = upd * one_minus_reg + B * reg
    upd = jnp.clip(upd, 0.0, 1.0)
    return jnp.where(cov > 0, upd, B)


def _single_block_kernel(iterations, step, reg, b_ref, t_ref, c_ref, o_ref):
    tgt = t_ref[:]
    cov = c_ref[:]

    def body(_, B):
        return _step(B, tgt, cov, step, 1.0 - reg, reg)

    o_ref[:] = jax.lax.fori_loop(0, iterations, body, b_ref[:])


def _banded_kernel(k, step, reg, band, halo, b_ref, t_ref, c_ref, o_ref):
    """One K-iteration pass over a (1, band + 2*halo, W) slab block."""
    tgt = t_ref[0]
    cov = c_ref[0]

    def body(_, B):
        return _step(B, tgt, cov, step, 1.0 - reg, reg)

    B = jax.lax.fori_loop(0, k, body, b_ref[0])
    o_ref[0] = B[halo : halo + band, :]


def _vmem_bytes(h, w):
    return 3 * h * w * 4


def _band_config(w):
    """(k, halo, band) for the banded path at row width ``w``, or None
    when even an 8-row band with the smallest halo exceeds the VMEM
    budget (caller must fall back to the jnp path).  Selection metric:
    slab rows processed per image row per iteration, (slab/band)/k."""
    slab_budget_rows = (10 * 1024 * 1024) // (8 * w * 4)
    best = None
    for k, halo in ((K_PER_PASS, HALO), (5, 8)):
        band = min(128, (slab_budget_rows - 2 * halo) // 8 * 8)
        if band < 8:
            continue
        cost = (band + 2 * halo) / band / k
        if best is None or cost < best[0]:
            best = (cost, k, halo, band)
    return None if best is None else best[1:]


@functools.partial(jax.jit, static_argnames=("iterations", "step", "reg",
                                             "interpret"))
def _pallas_jacobi_impl(buf, target, covf, iterations, step, reg, interpret):
    h, w = buf.shape
    if _vmem_bytes(h, w) <= _SINGLE_BLOCK_BYTES:
        kern = functools.partial(_single_block_kernel, iterations, step, reg)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(buf, target, covf)

    # banded path: K iterations per pass over halo-extended row slabs.
    # Overlapping slabs are materialized by plain XLA slices (vmap-friendly,
    # unlike ANY-space manual DMA); the kernel sees standard VMEM blocks.
    # The band adapts to the row width so the ~8 live slab temporaries of
    # the iteration body stay within the 16 MB VMEM scoped limit (with
    # headroom) even under batch vmap.  (k, halo) adapt too: for very wide
    # rows the 10/16 config leaves almost no band inside the budget, so
    # 5/8 (2x the HBM passes, far less halo overhead) wins; and when even
    # an 8-row band cannot fit, the HBM-roundtrip jnp path is the only
    # correct option.  The selection metric is slab-rows processed per
    # image row per iteration = (slab/band)/k.
    cfg = _band_config(w)
    if cfg is None:
        from .. import fusion

        return fusion.jacobi(buf, target, covf > 0, iterations, step, reg)
    k, halo, band = cfg
    # Enforce (not just document) the edge-distance precondition: covered
    # pixels must sit >= halo rows inside the top/bottom edge or the zero
    # halo diverges from the jnp path's vertical roll.  Coverage is a
    # traced value, so the check is the static conservative proxy the
    # contract rests on — the production zenith clamp keeps covered rows
    # >= h*26/180 from the edge (reference Depth.cpp:22, band 26..154deg).
    # Levels too short to guarantee that take the jnp path instead of
    # silently diverging (they're small, so the detour is cheap).
    if h * 26 < halo * 180:
        from .. import fusion

        return fusion.jacobi(buf, target, covf > 0, iterations, step, reg)
    n_bands = pl.cdiv(h, band)
    pad_h = n_bands * band
    slab = band + 2 * halo

    def slabs(img):
        p = jnp.pad(img, ((halo, halo + pad_h - h), (0, 0)))
        return jnp.stack([p[i * band : i * band + slab] for i in range(n_bands)])

    def make_call(kk):
        kern = functools.partial(_banded_kernel, kk, step, reg, band, halo)
        return pl.pallas_call(
            kern,
            grid=(n_bands,),
            out_shape=jax.ShapeDtypeStruct((n_bands, band, w), jnp.float32),
            in_specs=[pl.BlockSpec((1, slab, w), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, band, w), lambda i: (i, 0, 0)),
            interpret=interpret,
        )

    ts, cs = slabs(target), slabs(covf)
    b = buf
    passes, rem = divmod(iterations, k)
    call = make_call(k)
    for _ in range(passes):
        b = call(slabs(b), ts, cs).reshape(pad_h, w)[:h]
    if rem:  # remainder pass (rem < k <= halo, so the halo still covers it)
        b = make_call(rem)(slabs(b), ts, cs).reshape(pad_h, w)[:h]
    return b


def pallas_jacobi(buf, target, covered, iterations, step, reg,
                  interpret=None):
    """Drop-in replacement for :func:`panodepth.fusion.jacobi`.

    PRECONDITION: every ``covered`` pixel must sit >= HALO rows inside the
    image's top/bottom edge.  Inside that contract the output is bit-equal
    to the jnp path; at the edge the jnp path's vertical roll and this
    kernel's zero halo diverge.  Production coverage always satisfies it:
    the zenith-band clamp (reference Depth.cpp:1558-1562, band
    [26deg, 154deg]) keeps covered rows >= h*26/180 from the edge at every
    pyramid level the banded path handles.

    On non-TPU backends this falls back to the jnp implementation unless
    ``interpret=True`` is forced (used by the kernel unit tests).
    """
    if interpret is None and jax.default_backend() != "tpu":
        from .. import fusion

        return fusion.jacobi(buf, target, covered, iterations, step, reg)
    covf = covered.astype(jnp.float32)
    return _pallas_jacobi_impl(buf.astype(jnp.float32),
                               target.astype(jnp.float32), covf,
                               int(iterations), float(step), float(reg),
                               bool(interpret))
