"""View-parallel latency mode (panodepth.parallel.views) on the 8-dev mesh.

The strict comparisons use deterministic *stub* CNNs: the real nets at
random init are chaotic amplifiers (a 1e-5 extraction reassociation
wiggle between the two graph shapes turns into O(0.1) depth diffs), so
exact parity through them is not well-defined.  The stub keeps the
pipeline end-to-end (extraction -> "CNN" -> registration -> fusion) but
makes the model a smooth deterministic map, so the sharded machinery can
be held to u16-ulp tolerances.  A separate test runs the real flax
models and pins internal consistency (the latency graph's own outputs
must agree with the single-device register_views/fuse applied to its own
intermediates — bit-exact fusion, tight registration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panodepth import registration
from panodepth.config import MergeConfig
from panodepth.e2e import build_batched_e2e
from panodepth.fusion import build_fusion_plan, fuse
from panodepth.parallel.views import build_latency_e2e, make_vp_mesh

from conftest import make_equirect


class StubPersp:
    """Deterministic smooth stand-in for the perspective depth net."""

    def apply(self, params, x):
        g = jnp.mean(x, -1)
        return 0.2 + 0.6 * g + 0.1 * jnp.cos(3.0 * g)


class StubBase:
    """Deterministic smooth stand-in for the panoramic baseline net."""

    def apply(self, params, x):
        return 0.3 + 0.5 * jnp.mean(x, -1)


CFG = MergeConfig(out_width=128)
PARAMS = {"w": jnp.zeros(())}


def _rgb():
    rng = np.random.RandomState(2)
    base = make_equirect(128, 64)
    return jnp.asarray(
        np.clip(np.stack([base] * 3, -1) + rng.rand(64, 128, 3) * 0.1, 0, 1),
        jnp.float32)


def _batched_ref(rgb):
    _, jm, jf = build_batched_e2e(StubPersp(), PARAMS, CFG, view_width=32,
                                  base_model=StubBase(), base_params=PARAMS,
                                  base_w=64)
    bl, pmaps = jm(rgb[None])
    out, abcd = jf(bl, pmaps)
    return np.asarray(out[0]), np.asarray(abcd[0])


@pytest.mark.parametrize("halo", [1, 10])
def test_latency_matches_batched_and_own_fuse(halo):
    """15 views over 8 devices: <=1 u16 ulp vs the dp-batched graph, and
    BIT-EXACT vs the single-device fuse on its own intermediates (pins the
    sharded targets + psum_scatter + width-sharded Jacobi + assembly)."""
    rgb = _rgb()
    out_ref, _ = _batched_ref(rgb)
    mesh = make_vp_mesh(8)
    fn = build_latency_e2e(StubPersp(), PARAMS, CFG, mesh, view_width=32,
                           base_model=StubBase(), base_params=PARAMS,
                           base_w=64, halo=halo, debug=True)
    out, abcd, emap, pmaps, _ = fn(rgb)
    out = np.asarray(out)
    du16 = np.abs(out.astype(np.int64) - out_ref.astype(np.int64))
    # cross-graph float reassociation (~1e-5 on the CNN inputs) feeds the
    # conditioned cubic fit, so a few quantization steps of wiggle remain
    assert du16.max() <= 8, f"latency vs batched u16 diff {du16.max()}"
    assert (du16 > 1).mean() < 1e-3

    pml = [jnp.asarray(np.asarray(pmaps)[v])
           for v in range(CFG.layout.num_views)]
    plan = build_fusion_plan(CFG)
    out_own, _ = jax.jit(
        lambda e, ab: fuse(e, pml, plan, abcd=ab))(jnp.asarray(emap),
                                                   jnp.asarray(abcd))
    assert (out == np.asarray(out_own)).all(), \
        "sharded fusion is not bit-exact vs single-device fuse"


def test_latency_real_models_internal_consistency():
    """The real flax nets through the latency graph: finite outputs, and
    the sharded registration/fusion reproduce the single-device ops on the
    graph's own pmaps (registration tight, fusion bit-exact)."""
    from panodepth.models.panoramic import PanoBaselineNet
    from panodepth.models.perspective import PerspectiveDepthNet

    pm = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                             widths=(8, 16, 16, 32), decoder_width=16)
    pp = pm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    bm = PanoBaselineNet(widths=(8, 16, 16, 32))
    bp = bm.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))
    rgb = _rgb()
    mesh = make_vp_mesh(8)
    fn = build_latency_e2e(pm, pp, CFG, mesh, view_width=32, base_model=bm,
                           base_params=bp, base_w=64, debug=True)
    out, abcd, emap, pmaps, _ = fn(rgb)
    out = np.asarray(out)
    assert out.shape == (CFG.out_height, CFG.out_width)
    assert np.isfinite(np.asarray(abcd)).all()

    pml = [jnp.asarray(np.asarray(pmaps)[v])
           for v in range(CFG.layout.num_views)]
    abcd2 = registration.register_views(jnp.asarray(emap), pml, CFG)
    assert np.allclose(np.asarray(abcd), np.asarray(abcd2), atol=1e-4), \
        "sharded registration diverged from register_views"
    plan = build_fusion_plan(CFG)
    out_own, _ = jax.jit(
        lambda e, ab: fuse(e, pml, plan, abcd=ab))(jnp.asarray(emap),
                                                   jnp.asarray(abcd))
    assert (out == np.asarray(out_own)).all()


def test_latency_given_baseline():
    """No baseline model: fn(rgb, baseline) with a precomputed emap."""
    rgb = _rgb()
    baseline = jnp.asarray(make_equirect(64, 32), jnp.float32)

    _, jm, jf = build_batched_e2e(StubPersp(), PARAMS, CFG, view_width=32)
    bl, pmaps = jm(rgb[None], baseline[None])
    out_ref, _ = jf(bl, pmaps)
    out_ref = np.asarray(out_ref[0])

    mesh = make_vp_mesh(8)
    fn = build_latency_e2e(StubPersp(), PARAMS, CFG, mesh, view_width=32,
                           baseline_shape=(32, 64), debug=True)
    out, abcd, emap, pmaps, _ = fn(rgb, baseline)
    out = np.asarray(out)
    du16 = np.abs(out.astype(np.int64) - out_ref.astype(np.int64))
    assert du16.max() <= 8  # same tolerance rationale as above
    assert abcd.shape == (CFG.layout.num_views, 4)
    # the hard pin: bit-exact vs the single-device fuse on own intermediates
    pml = [jnp.asarray(np.asarray(pmaps)[v])
           for v in range(CFG.layout.num_views)]
    plan = build_fusion_plan(CFG)
    out_own, _ = jax.jit(
        lambda e, ab: fuse(e, pml, plan, abcd=ab))(jnp.asarray(emap),
                                                   jnp.asarray(abcd))
    assert (out == np.asarray(out_own)).all()


def test_run_batch_e2e_latency_driver(tmp_path):
    """--latency through the file driver: results + metrics + resume.

    Output values are not compared to the batched driver here — at random
    init the real CNN chaotically amplifies sub-ulp graph differences (see
    module docstring); the graph-level tests above pin correctness."""
    import json
    import math

    from panodepth import io as pio
    from panodepth.config import ViewLayout, register_layout
    from panodepth.e2e import run_batch_e2e
    from panodepth.models import train as ptrain
    from panodepth.models.perspective import PerspectiveDepthNet

    d2r = math.pi / 180.0
    register_layout(ViewLayout(
        "test_latency_drv",
        fovs=np.array([(25 * d2r, 175 * d2r, 30 * d2r, 150 * d2r),
                       (185 * d2r, 335 * d2r, 30 * d2r, 150 * d2r)]),
        ranges=np.array([(170 * d2r, 30 * d2r, 40 * d2r, 140 * d2r),
                         (330 * d2r, 190 * d2r, 40 * d2r, 140 * d2r)]),
    ))
    cfg = MergeConfig(layout_name="test_latency_drv", out_width=64)

    s = 0.125
    model = PerspectiveDepthNet(
        widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
        decoder_width=max(16, int(128 * s)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ck = tmp_path / "ck"
    ck.mkdir()
    persp_ckpt = str(ck / "perspective_final.params.npz")
    ptrain.save_params_npz(persp_ckpt, params)
    (ck / "perspective.config.json").write_text(json.dumps(
        dict(model="perspective", width_scale=s, view_size=64,
             pano_width=64)))

    rng = np.random.RandomState(7)
    for d in ("rgb", "gt", "bl"):
        (tmp_path / d).mkdir()
    for i in range(2):
        pio.save_jpg(str(tmp_path / "rgb" / f"p{i}.jpg"),
                     rng.rand(32, 64, 3).astype(np.float32))
        pio.save_png16(str(tmp_path / "gt" / f"p{i}.png"),
                       (rng.rand(32, 64) * 60000).astype(np.uint16))
        pio.save_png16(str(tmp_path / "bl" / f"p{i}.depth.png"),
                       (rng.rand(32, 64) * 60000 + 2000).astype(np.uint16))

    res = tmp_path / "res_hohonet_lat"
    mets = run_batch_e2e(
        str(tmp_path / "rgb"), str(tmp_path / "gt"), str(res), persp_ckpt,
        cfg=cfg, baseline_folder=str(tmp_path / "bl"), view_width=64,
        latency=True, latency_halo=4, log=lambda *a: None)
    assert len(mets) == 2
    for i in range(2):
        out = pio.load_image01(str(res / f"p{i}.png"))
        assert out.shape == (cfg.out_height, cfg.out_width)
        assert (res / f"p{i}.aligned.txt").exists()
    # rerun: everything skips (resume semantics preserved in latency mode)
    mets2 = run_batch_e2e(
        str(tmp_path / "rgb"), str(tmp_path / "gt"), str(res), persp_ckpt,
        cfg=cfg, baseline_folder=str(tmp_path / "bl"), view_width=64,
        latency=True, log=lambda *a: None)
    assert mets2 == []


def test_latency_rejects_mixed_shape_layouts():
    """Mixed-aspect layouts must fail loudly (use the dp graph instead)."""
    import math

    from panodepth.config import ViewLayout, register_layout

    d2r = math.pi / 180.0
    register_layout(ViewLayout(
        "test_latency_mixed",
        fovs=np.array([(25 * d2r, 175 * d2r, 30 * d2r, 150 * d2r),
                       (185 * d2r, 305 * d2r, 30 * d2r, 150 * d2r)]),
        ranges=np.array([(170 * d2r, 30 * d2r, 40 * d2r, 140 * d2r),
                         (300 * d2r, 190 * d2r, 40 * d2r, 140 * d2r)]),
    ))
    cfg = MergeConfig(layout_name="test_latency_mixed", out_width=128)
    with pytest.raises(ValueError, match="one view shape"):
        build_latency_e2e(StubPersp(), PARAMS, cfg, make_vp_mesh(8),
                          view_width=32, baseline_shape=(32, 64))


def test_latency_packed16_matches_batched():
    """extract_dtype='packed16' through the latency graph vs the same mode
    through the dp-batched graph: both quantize the gather table
    identically, so the stub-CNN parity tolerance is unchanged."""
    rgb = _rgb()
    _, jm, jf = build_batched_e2e(StubPersp(), PARAMS, CFG, view_width=32,
                                  base_model=StubBase(), base_params=PARAMS,
                                  base_w=64, extract_dtype="packed16")
    bl, pmaps = jm(rgb[None])
    out_ref = np.asarray(jf(bl, pmaps)[0][0])
    mesh = make_vp_mesh(8)
    fn = build_latency_e2e(StubPersp(), PARAMS, CFG, mesh, view_width=32,
                           base_model=StubBase(), base_params=PARAMS,
                           base_w=64, extract_dtype="packed16")
    out = np.asarray(fn(rgb)[0])
    du16 = np.abs(out.astype(np.int64) - out_ref.astype(np.int64))
    assert du16.max() <= 8, f"latency vs batched u16 diff {du16.max()}"
    # 5/6/5 quantization plateaus make rounding ties likelier than f32,
    # so more pixels sit 2-8 ulps apart across graph shapes (measured
    # 0.44% here vs 0.1% for f32); the max-ulp bound is the real pin
    assert (du16 > 1).mean() < 2e-2


def test_latency_pair16_matches_packed16():
    """extract_dtype='pair16' through the latency graph is bit-identical
    to packed16 through the same graph (same RGB565 quantization and f32
    arithmetic; only the gather pattern differs)."""
    rgb = _rgb()
    mesh = make_vp_mesh(8)
    outs = {}
    for mode in ("packed16", "pair16"):
        fn = build_latency_e2e(StubPersp(), PARAMS, CFG, mesh,
                               view_width=32, base_model=StubBase(),
                               base_params=PARAMS, base_w=64,
                               extract_dtype=mode)
        outs[mode] = np.asarray(fn(rgb)[0])
    np.testing.assert_array_equal(outs["pair16"], outs["packed16"])
