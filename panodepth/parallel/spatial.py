"""Spatially-sharded Jacobi relaxation with explicit ICI halo exchange.

For panoramas too large for one device (or to cut latency at fixed size),
the equirect *width* is sharded over a mesh axis and each relaxation
iteration exchanges one-column halos with the ring neighbors via
``jax.lax.ppermute`` — the honest "context parallel" analog for this
workload (SURVEY.md section 5).  Unlike the jit+sharding path (which lets
XLA partition the rolls), this is an explicit ``shard_map`` program: the
collective schedule is visible and controllable.

The azimuth seam keeps the reference's flat-index semantics
(:func:`panodepth.fusion.lap4_refwrap`): the halo column crossing the seam
(shard 0's left edge, last shard's right edge) is row-shifted by one, which
we apply *before* sending, so each iteration needs exactly one
ppermute-pair per direction.
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


def jacobi_spatial(buf, target, covered, iterations, step, reg, mesh: Mesh,
                   axis: str = "sp"):
    """Width-sharded Jacobi, numerics identical to ``fusion.jacobi``.

    ``buf``/``target``/``covered`` are (H, W) with W divisible by the mesh
    axis size.  Returns the relaxed (H, W) buffer.
    """
    n = mesh.shape[axis]
    one_minus_reg = 1.0 - reg
    covf = covered.astype(jnp.float32)

    fwd = [(i, (i + 1) % n) for i in range(n)]   # send right
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send left

    def local(B, tgt, cov):
        idx = jax.lax.axis_index(axis)

        def body(_, Bk):
            # halo to send right: my last column; crossing the global seam
            # (from shard n-1 to shard 0) it must arrive shifted DOWN one
            # row less... the reference's x=-1 tap reads (row-1, W-1), so
            # shard 0's left halo is the last shard's last column rolled +1
            send_r = Bk[:, -1:]
            send_r_seam = jnp.roll(send_r, 1, axis=0)
            send_r = jnp.where(idx == n - 1, send_r_seam, send_r)
            left_halo = jax.lax.ppermute(send_r, axis, fwd)

            # halo to send left: my first column; crossing the seam (from
            # shard 0 to shard n-1) the x=W tap reads (row+1, 0)
            send_l = Bk[:, :1]
            send_l_seam = jnp.roll(send_l, -1, axis=0)
            send_l = jnp.where(idx == 0, send_l_seam, send_l)
            right_halo = jax.lax.ppermute(send_l, axis, bwd)

            ext = jnp.concatenate([left_halo, Bk, right_halo], axis=1)
            lap = Bk - 0.25 * (
                ext[:, :-2] + ext[:, 2:]
                + jnp.roll(Bk, 1, axis=0) + jnp.roll(Bk, -1, axis=0)
            )
            upd = Bk + (tgt - lap) * step
            upd = upd * one_minus_reg + Bk * reg
            upd = jnp.clip(upd, 0.0, 1.0)
            return jnp.where(cov > 0, upd, Bk)

        return jax.lax.fori_loop(0, iterations, body, B)

    spec = P(None, axis)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    return fn(buf, target, covf)


def fuse_spatial(emap, pmaps, plan, mesh: Mesh, axis: str = "sp",
                 abcd=None):
    """Full multiresolution fusion with the width-sharded relaxation."""
    from ..fusion import fuse

    relax = functools.partial(jacobi_spatial, mesh=mesh, axis=axis)
    return fuse(emap, pmaps, plan, jacobi_fn=relax, abcd=abcd)
