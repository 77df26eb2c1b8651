"""One process of a 2-process jax.distributed CPU run.

Spawned by ``tests/test_multihost.py`` (NOT collected by pytest).  Trains
a tiny PerspectiveDepthNet for two steps on a deterministic global batch
sliced dp-major across processes, then dumps per-step losses and the
final host-fetched params so the parent can compare processes against
each other and against a single-process oracle.
"""

import os
import sys


def main() -> int:
    port, pid, nproc, outdir = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    # 2 local devices per process — must be set before backend init
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from panodepth.models import train as ptrain
    from panodepth.models.perspective import PerspectiveDepthNet
    from panodepth.parallel import multihost as mh

    pidx, pcnt = mh.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert pcnt == nproc and pidx == pid
    mesh = mh.global_mesh()
    n_global = len(jax.devices())
    per = 4 // pcnt  # rows of the 4-item global batch owned per process

    model = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    tx = ptrain.make_optimizer(lr=1e-3)
    state = ptrain.init_state(model, jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)), tx)
    state = mh.replicate(mesh, state)
    step_fn = ptrain.shard_train_step(
        ptrain.make_train_step(model, tx), mesh, "dp")

    losses = []
    exec_step = None
    for step in range(2):
        rng = np.random.RandomState(1000 + step)
        rgb = rng.rand(4, 32, 32, 3).astype(np.float32)
        depth = rng.rand(4, 32, 32).astype(np.float32)
        mask = np.ones((4, 32, 32), bool)
        lo = pidx * per
        batch = tuple(mh.global_batch(mesh, a[lo:lo + per])
                      for a in (rgb, depth, mask))
        if exec_step is None:
            # compile locally, THEN sync, THEN open the collectives —
            # see multihost.barrier
            exec_step = step_fn.lower(state, batch).compile()
            mh.barrier("mh-worker-compiled")
        state, m = exec_step(state, batch)
        losses.append(float(m["loss"]))

    flat = jax.tree_util.tree_leaves(mh.fetch_replicated(state.params))
    np.savez(os.path.join(outdir, f"proc{pidx}.npz"),
             losses=np.asarray(losses), n_global=n_global, *flat)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
