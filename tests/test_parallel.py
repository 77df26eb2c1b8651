"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panodepth.config import MergeConfig
from panodepth.parallel.mesh import batched_merge, make_mesh
from panodepth.pipeline import merge_arrays

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _inputs(cfg, batch, seed=0):
    rng = np.random.RandomState(seed)
    emaps = rng.uniform(0.05, 0.9,
                        (batch, cfg.out_height // 2, cfg.out_width // 2)
                        ).astype(np.float32)
    pmaps = rng.uniform(0.05, 0.9,
                        (batch, cfg.layout.num_views, 62, 64)
                        ).astype(np.float32)
    return jnp.asarray(emaps), jnp.asarray(pmaps)


def test_dp_sp_merge_matches_single_device():
    cfg = MergeConfig(layout_name="test2", out_width=128)
    mesh = make_mesh((4, 2))
    emaps, pmaps = _inputs(cfg, 4)
    fn = batched_merge(cfg, mesh)
    out_sharded, abcd_sharded = fn(emaps, pmaps)

    ref = jax.jit(jax.vmap(lambda e, p: merge_arrays(e, p, cfg)))
    out_ref, abcd_ref = ref(emaps, pmaps)
    # sharded partitioning reassociates f32 ops -> allow 1 u16 ulp
    diff = np.abs(np.asarray(out_sharded).astype(np.int64)
                  - np.asarray(out_ref).astype(np.int64))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01
    np.testing.assert_allclose(np.asarray(abcd_sharded),
                               np.asarray(abcd_ref), rtol=2e-4, atol=2e-4)


def test_pure_dp_mesh():
    cfg = MergeConfig(layout_name="test2", out_width=64)
    mesh = make_mesh((8, 1))
    emaps, pmaps = _inputs(cfg, 8)
    out, abcd = batched_merge(cfg, mesh)(emaps, pmaps)
    assert out.shape == (8, 32, 64)
    assert np.isfinite(np.asarray(abcd)).all()


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, abcd = jax.jit(fn)(*args)
    assert out.shape == (512, 1024) and out.dtype == jnp.uint16
