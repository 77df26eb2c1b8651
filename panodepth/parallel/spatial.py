"""Spatially-sharded Jacobi relaxation with explicit ICI halo exchange.

For panoramas too large for one device (or to cut latency at fixed size),
the equirect *width* is sharded over a mesh axis and each relaxation
iteration exchanges one-column halos with the ring neighbors via
``jax.lax.ppermute`` — the honest "context parallel" analog for this
workload (SURVEY.md section 5).  Unlike the jit+sharding path (which lets
XLA partition the rolls), this is an explicit ``shard_map`` program: the
collective schedule is visible and controllable.

The azimuth seam keeps the reference's flat-index semantics
(:func:`panodepth.fusion.lap4_refwrap`): the halo columns crossing the seam
(shard 0's left edge, last shard's right edge) are row-shifted by one, which
we apply *before* sending — the flat-index wrap is a uniform row roll for
any crossing block, so the shifted representation preserves both intra-halo
adjacency and the halo/owned boundary semantics exactly.

``halo=k`` temporal blocking exchanges k-wide halos and runs k iterations
locally between exchanges (k-fold fewer collectives, bit-exact interior:
the stale-edge corruption front advances one column per iteration and is
discarded with the halo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def jacobi_local(B, tgt, cov, iterations, step, reg, axis: str, n: int,
                 halo: int = 1):
    """Per-shard body of the width-sharded Jacobi relaxation.

    Runs INSIDE an existing ``shard_map`` context whose mesh has ``axis``
    of size ``n``: ``B``/``tgt``/``cov`` are this device's width shard
    (H, W/n), ``cov`` as f32.  Exchanges ring halos with ``ppermute`` and
    returns the relaxed local shard.  Exposed separately so other manual
    programs (e.g. the view-parallel latency pipeline in
    :mod:`panodepth.parallel.views`) can fuse it into their own shard_map.
    """
    one_minus_reg = 1.0 - reg
    k = max(1, int(halo))
    w_local = B.shape[1]
    if k > w_local:
        k = w_local
    # static block sizes: [k, k, ..., remainder]
    blocks = [k] * (iterations // k)
    if iterations % k:
        blocks.append(iterations % k)

    fwd = [(i, (i + 1) % n) for i in range(n)]   # send right
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send left
    idx = jax.lax.axis_index(axis)

    def exchange(X, width):
        """width-column halos from both ring neighbors, with the seam
        row-shift applied before sending: the reference's flat-index
        wrap maps any x<0 tap to (row-1, W+x) and any x>=W tap to
        (row+1, x-W) (fusion.lap4_refwrap), a uniform +-1 row roll of
        the whole crossing block — so intra-block adjacency and the
        halo/owned boundary both keep exact reference semantics."""
        send_r = X[:, -width:]
        send_r = jnp.where(idx == n - 1,
                           jnp.roll(send_r, 1, axis=0), send_r)
        left_halo = jax.lax.ppermute(send_r, axis, fwd)
        send_l = X[:, :width]
        send_l = jnp.where(idx == 0,
                           jnp.roll(send_l, -1, axis=0), send_l)
        right_halo = jax.lax.ppermute(send_l, axis, bwd)
        return jnp.concatenate([left_halo, X, right_halo], axis=1)

    # targets/coverage are iteration-invariant: exchange their halos
    # ONCE for the whole schedule (buf halos go per block)
    tgt_e = exchange(tgt, k)
    cov_e = exchange(cov, k)

    def step_ext(Bk, tgt_k, cov_k):
        """One Jacobi update over an extended-width buffer; op order
        mirrors fusion.jacobi exactly (bit-equality)."""
        pad = jnp.pad(Bk, ((0, 0), (1, 1)), mode="edge")
        lap = Bk - 0.25 * (
            pad[:, :-2] + pad[:, 2:]
            + jnp.roll(Bk, 1, axis=0) + jnp.roll(Bk, -1, axis=0)
        )
        upd = Bk + (tgt_k - lap) * step
        upd = upd * one_minus_reg + Bk * reg
        upd = jnp.clip(upd, 0.0, 1.0)
        return jnp.where(cov_k > 0, upd, Bk)

    if k == 1:
        # the same update as the blocked path (exchange, one step_ext,
        # discard the 1-wide halo), rolled into a single fori_loop so
        # the graph isn't repeated `iterations` times — bit-equal to
        # the block schedule; the update formula lives only in step_ext
        def body1(_, Bk):
            return step_ext(exchange(Bk, 1), tgt_e, cov_e)[:, 1:-1]

        return jax.lax.fori_loop(0, iterations, body1, B)

    for bs in blocks:  # few blocks: iterations/halo graph repetitions
        ext = exchange(B, k)
        body = lambda _, Bk: step_ext(Bk, tgt_e, cov_e)
        ext = jax.lax.fori_loop(0, bs, body, ext)
        B = ext[:, k:-k]
    return B


def jacobi_spatial(buf, target, covered, iterations, step, reg, mesh: Mesh,
                   axis: str = "sp", halo: int = 1):
    """Width-sharded Jacobi, numerics identical to ``fusion.jacobi``.

    ``buf``/``target``/``covered`` are (H, W) with W divisible by the mesh
    axis size.  Returns the relaxed (H, W) buffer.

    ``halo`` is the temporal-blocking depth: a ``halo``-column exchange
    buys ``halo`` locally-fused iterations (the corruption front from the
    stale halo edge advances one column per iteration, so the owned
    interior stays *bit-exact*), cutting ppermute count — the dominant
    ICI latency term — by ``halo``x at the cost of ``2*halo`` redundant
    stencil columns per shard per iteration.  ``halo=1`` is the naive
    exchange-every-iteration schedule.
    """
    n = mesh.shape[axis]
    covf = covered.astype(jnp.float32)

    def local(B, tgt, cov):
        return jacobi_local(B, tgt, cov, iterations, step, reg, axis, n,
                            halo=halo)

    spec = P(None, axis)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    return fn(buf, target, covf)


def fuse_spatial(emap, pmaps, plan, mesh: Mesh, axis: str = "sp",
                 abcd=None, halo: int = 1):
    """Full multiresolution fusion with the width-sharded relaxation.

    ``halo`` > 1 enables temporal blocking (see :func:`jacobi_spatial`):
    the 200/100/50 schedules at ``halo=10`` run 20/10/5 halo exchanges per
    level instead of 200/100/50 — the ICI-latency amortization knob for
    real multi-chip runs (bit-exact either way)."""
    from ..fusion import fuse

    relax = functools.partial(jacobi_spatial, mesh=mesh, axis=axis,
                              halo=halo)
    return fuse(emap, pmaps, plan, jacobi_fn=relax, abcd=abcd)
