"""Device-mesh parallelism for the merge pipeline.

The reference's entire parallelism inventory is OpenMP-on-one-CPU plus one
GL context (SURVEY.md section 2.3).  Here the batch of panoramas is the
data-parallel axis over a ``jax.sharding.Mesh``; the per-panorama compute is
already fully vectorized, so XLA needs no collectives on the forward path —
metric reductions ride ICI via ordinary jnp reductions under jit.

Two axes are exposed:

* ``dp`` — panoramas (pure data parallel);
* ``sp`` — equirect *width* inside each panorama (spatial sharding of the
  fusion stencils; XLA turns the x-axis rolls into neighbor
  collective-permutes over ICI — the honest "context-parallel" analog for
  this workload, usable when a single panorama exceeds one device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MergeConfig
from ..pipeline import merge_arrays


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """(dp, sp) mesh over the available devices (defaults to (n, 1))."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    return Mesh(np.asarray(devices).reshape(shape), ("dp", "sp"))


def batched_merge(cfg: MergeConfig, mesh: Mesh, jacobi_fn=None):
    """jit of merge over a batch of panoramas, batch-sharded on ``dp`` and
    width-sharded on ``sp``.

    Takes ``emaps`` (B, He, We) and ``pmaps`` (B, V, Hp, Wp); returns
    (B, H, W) u16 outputs and (B, V, 4) coefficients.  B must be divisible
    by the ``dp`` axis size; W by the ``sp`` size.
    """

    def fn(emaps, pmaps):
        return jax.vmap(lambda e, p: merge_arrays(e, p, cfg, jacobi_fn))(
            emaps, pmaps)

    in_s = (NamedSharding(mesh, P("dp", None, "sp")),
            NamedSharding(mesh, P("dp", None, None, None)))
    out_s = (NamedSharding(mesh, P("dp", None, "sp")),
             NamedSharding(mesh, P("dp", None, None)))
    return jax.jit(fn, in_shardings=in_s, out_shardings=out_s)
