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


def test_dp_sharded_e2e_matches_single_device():
    """The full on-device e2e graph (CNNs + registration + fusion)
    dp-sharded over the mesh must match the unsharded batched graph."""
    import math

    from panodepth.config import ViewLayout, register_layout
    from panodepth.e2e import build_batched_e2e
    from panodepth.models.panoramic import PanoBaselineNet
    from panodepth.models.perspective import PerspectiveDepthNet

    d2r = math.pi / 180.0
    register_layout(ViewLayout(
        "test_e2e_par",
        fovs=np.array([(25 * d2r, 175 * d2r, 30 * d2r, 150 * d2r),
                       (185 * d2r, 355 * d2r, 30 * d2r, 150 * d2r)]),
        ranges=np.array([(170 * d2r, 30 * d2r, 40 * d2r, 140 * d2r),
                         (350 * d2r, 190 * d2r, 40 * d2r, 140 * d2r)]),
    ))
    cfg = MergeConfig(layout_name="test_e2e_par", out_width=64)
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    base = PanoBaselineNet(widths=(8, 16, 16, 32))
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    bp = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))
    rgbs = jnp.asarray(np.random.RandomState(5).rand(8, 64, 128, 3)
                       .astype(np.float32))

    kw = dict(view_width=32, base_model=base, base_params=bp, base_w=64)
    _, models_s, fuse_s = build_batched_e2e(persp, pp, cfg,
                                            mesh=make_mesh((8, 1)), **kw)
    _, models_1, fuse_1 = build_batched_e2e(persp, pp, cfg, **kw)
    # stage 1 — CNNs: the models are batch-independent (GroupNorm, no
    # cross-sample ops), but XLA picks different conv schedules for the
    # per-device batch of 1 vs 8, and the f32 reassociation noise amplifies
    # through stacked GroupNorm divisions (~0.5% worst-case at random init)
    base_s, pmaps_s = models_s(rgbs)
    base_1, pmaps_1 = models_1(rgbs)
    np.testing.assert_allclose(np.asarray(base_s), np.asarray(base_1),
                               rtol=2e-2, atol=8e-3)
    for a, b in zip(pmaps_s, pmaps_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=8e-3)
    # stage 2 — registration+fusion on IDENTICAL inputs: at most 1 u16 ulp
    # between the dp-sharded and single-device graphs
    out_s, _ = fuse_s(base_1, pmaps_1)
    out_1, _ = fuse_1(base_1, pmaps_1)
    diff = np.abs(np.asarray(out_s).astype(np.int64)
                  - np.asarray(out_1).astype(np.int64))
    assert diff.max() <= 1


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, abcd = jax.jit(fn)(*args)
    assert out.shape == (512, 1024) and out.dtype == jnp.uint16


def test_jacobi_spatial_matches_reference_stencil():
    """Width-sharded Jacobi (explicit ppermute halos) must equal the
    single-device stencil bit-for-bit, including the seam row-shift."""
    from jax.sharding import Mesh
    from panodepth import fusion
    from panodepth.parallel.spatial import jacobi_spatial

    rng = np.random.RandomState(3)
    h, w = 64, 128
    buf = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 0.01, (h, w)).astype(np.float32))
    cov = jnp.zeros((h, w), bool).at[10:54, :].set(True)  # covers the seam
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("dp", "sp"))
    ref = np.asarray(jax.jit(
        lambda b, t, c: fusion.jacobi(b, t, c, 30, 0.5, 1e-4))(buf, tgt, cov))
    shd = np.asarray(jax.jit(
        lambda b, t, c: jacobi_spatial(b, t, c, 30, 0.5, 1e-4, mesh))(
        buf, tgt, cov))
    np.testing.assert_array_equal(ref, shd)


def test_fuse_spatial_matches(tiny_cfg, tiny_scene):
    from jax.sharding import Mesh
    from panodepth import fusion
    from panodepth.parallel.spatial import fuse_spatial

    plan = fusion.build_fusion_plan(tiny_cfg)
    emap = jnp.asarray(tiny_scene["emap"])
    pmaps = jnp.asarray(tiny_scene["pmaps"])
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("dp", "sp"))
    out_ref, _ = fusion.fuse(emap, pmaps, plan)
    out_shd, _ = fuse_spatial(emap, pmaps, plan, mesh)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_shd))


def test_jacobi_spatial_temporal_blocking_bit_exact():
    """halo=k exchanges k-wide halos and fuses k iterations locally; the
    owned interior must stay bit-identical to the per-iteration schedule
    (and to the single-device stencil), including the seam row-shift and
    a non-dividing remainder block."""
    from jax.sharding import Mesh
    from panodepth import fusion
    from panodepth.parallel.spatial import jacobi_spatial

    rng = np.random.RandomState(4)
    h, w = 64, 128
    buf = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 0.01, (h, w)).astype(np.float32))
    cov = jnp.zeros((h, w), bool).at[6:58, :].set(True)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("dp", "sp"))
    ref = np.asarray(jax.jit(
        lambda b, t, c: fusion.jacobi(b, t, c, 30, 0.5, 1e-4))(buf, tgt, cov))
    for halo in (2, 5, 7, 30, 100):  # 7: remainder block; 100: clamps to 32
        shd = np.asarray(jax.jit(
            lambda b, t, c: jacobi_spatial(b, t, c, 30, 0.5, 1e-4, mesh,
                                           halo=halo))(buf, tgt, cov))
        np.testing.assert_array_equal(ref, shd, err_msg=f"halo={halo}")


def test_fuse_spatial_halo_matches(tiny_cfg, tiny_scene):
    from jax.sharding import Mesh
    from panodepth import fusion
    from panodepth.parallel.spatial import fuse_spatial

    plan = fusion.build_fusion_plan(tiny_cfg)
    emap = jnp.asarray(tiny_scene["emap"])
    pmaps = jnp.asarray(tiny_scene["pmaps"])
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("dp", "sp"))
    out_ref, _ = fusion.fuse(emap, pmaps, plan)
    out_shd, _ = fuse_spatial(emap, pmaps, plan, mesh, halo=10)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_shd))
