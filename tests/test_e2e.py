"""End-to-end on-device pipeline test (RGB -> fused depth, one graph)."""

import jax
import jax.numpy as jnp
import numpy as np

import math

from panodepth.config import MergeConfig, ViewLayout, register_layout
from panodepth.e2e import full_pipeline
from panodepth.models.panoramic import PanoBaselineNet
from panodepth.models.perspective import PerspectiveDepthNet

from conftest import make_equirect

D2R = math.pi / 180.0

# stage A requires window FOVs < 180 deg (gnomonic hemisphere); the shared
# "test2" layout's second view is wider, so e2e uses its own sane layout
register_layout(ViewLayout(
    "test_e2e",
    fovs=np.array([(25 * D2R, 175 * D2R, 30 * D2R, 150 * D2R),
                   (185 * D2R, 355 * D2R, 30 * D2R, 150 * D2R)]),
    ranges=np.array([(170 * D2R, 30 * D2R, 40 * D2R, 140 * D2R),
                     (350 * D2R, 190 * D2R, 40 * D2R, 140 * D2R)]),
))
E2E_CFG = MergeConfig(layout_name="test_e2e", out_width=64)


def test_full_pipeline_runs():
    tiny_cfg = E2E_CFG
    rgb = jnp.asarray(np.stack([make_equirect(64, 32)] * 3, -1))
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    base = PanoBaselineNet(widths=(8, 16, 16, 32))
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    bp = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))

    out, abcd, baseline, pmaps = jax.jit(
        lambda r: full_pipeline(r, persp, pp, base, bp, cfg=tiny_cfg,
                                view_width=64, base_w=64)
    )(rgb)
    assert out.shape == (tiny_cfg.out_height, tiny_cfg.out_width)
    assert out.dtype == jnp.uint16
    assert baseline.shape == (32, 64)

    # uint8 input is normalized to the same 0~1 floats the CNNs trained
    # on (it silently flowed through raw 0..255 before)
    rgb_u8 = (np.asarray(rgb) * 255).astype(np.uint8)
    out_u8, _, _, _ = jax.jit(
        lambda r: full_pipeline(r, persp, pp, base, bp, cfg=tiny_cfg,
                                view_width=64, base_w=64)
    )(jnp.asarray(rgb_u8))
    out_f, _, _, _ = jax.jit(
        lambda r: full_pipeline(r, persp, pp, base, bp, cfg=tiny_cfg,
                                view_width=64, base_w=64)
    )(jnp.asarray(rgb_u8.astype(np.float32) / 255.0))
    d = np.abs(out_u8.astype(np.int32) - out_f.astype(np.int32))
    assert d.max() <= 2, d.max()  # 1-ulp division noise through fusion
    assert np.isfinite(np.asarray(abcd)).all()
    assert len(pmaps) == tiny_cfg.layout.num_views  # per-view list


def test_run_batch_e2e_batched_matches_single(tmp_path):
    """--batch-size N in on-device mode: same files as per-item runs.

    Three panoramas through the full file-level driver at batch 1 and
    batch 2 (the odd count exercises pad-to-batch-shape); u16 outputs may
    differ by at most 1 step (XLA picks different conv schedules per batch
    shape)."""
    import json

    from panodepth import io as pio
    from panodepth.e2e import run_batch_e2e
    from panodepth.models import train as ptrain

    # checkpoint laid out exactly as train_cli writes it (npz + sidecar),
    # so load_model_checkpoint rebuilds this same tiny model
    s = 0.125
    model = PerspectiveDepthNet(
        widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
        decoder_width=max(16, int(128 * s)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt_dir = tmp_path / "ck"
    ckpt_dir.mkdir()
    persp_ckpt = str(ckpt_dir / "perspective_final.params.npz")
    ptrain.save_params_npz(persp_ckpt, params)
    (ckpt_dir / "perspective.config.json").write_text(json.dumps(
        dict(model="perspective", width_scale=s, view_size=64,
             pano_width=64)))

    rng = np.random.RandomState(7)
    for d in ("rgb", "gt", "bl"):
        (tmp_path / d).mkdir()
    for i in range(3):
        pio.save_jpg(str(tmp_path / "rgb" / f"p{i}.jpg"),
                     rng.rand(32, 64, 3).astype(np.float32))
        pio.save_png16(str(tmp_path / "gt" / f"p{i}.png"),
                       (rng.rand(32, 64) * 60000).astype(np.uint16))
        # result folders are named *hohonet* so the baseline convention
        # resolves to the 16-bit <raw>.depth.png form (io.py:163-181)
        pio.save_png16(str(tmp_path / "bl" / f"p{i}.depth.png"),
                       (rng.rand(32, 64) * 60000 + 2000).astype(np.uint16))

    outs = {}
    mets = {}
    # (2, "on") additionally streams the uint8 JPEG rgb and uint16 PNG
    # baseline to the device raw, normalizing there (1 f32 ulp caveat)
    for bs, stream in ((1, "off"), (2, "off"), (2, "on")):
        res = tmp_path / f"res_hohonet_b{bs}{stream}"
        mets[bs, stream] = run_batch_e2e(
            str(tmp_path / "rgb"), str(tmp_path / "gt"), str(res),
            persp_ckpt, cfg=E2E_CFG, baseline_folder=str(tmp_path / "bl"),
            view_width=64, batch_size=bs, stream=stream,
            log=lambda *a: None)
        outs[bs, stream] = [np.asarray(
            np.round(pio.load_image01(str(res / f"p{i}.png")) * 65535.0)
        ).astype(np.int32) for i in range(3)]
    assert all(len(m) == 3 for m in mets.values())
    for key in ((2, "off"), (2, "on")):
        for a, b in zip(outs[1, "off"], outs[key]):
            assert np.abs(a - b).max() <= 1
        for m1, m2 in zip(mets[1, "off"], mets[key]):
            np.testing.assert_allclose(m1.mse_result, m2.mse_result,
                                       rtol=1e-4, atol=1e-7)


def test_run_batch_e2e_baseline_ckpt(tmp_path):
    """Two-checkpoint mode: the panoramic baseline comes from an on-device
    model (--baseline-ckpt) instead of files; outputs + metrics appear.

    view_width is left unset — the driver must default it to the
    perspective sidecar's training view_size (64 here), pinning the
    auto-resolution behavior the zoo proof depends on."""
    import json

    from panodepth import io as pio
    from panodepth.e2e import run_batch_e2e
    from panodepth.models import train as ptrain
    from panodepth.models.panoramic import PanoBaselineNet

    s = 0.125
    ck = tmp_path / "ck"
    ck.mkdir()
    persp = PerspectiveDepthNet(
        widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
        decoder_width=max(16, int(128 * s)))
    pparams = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ptrain.save_params_npz(str(ck / "perspective_final.params.npz"), pparams)
    (ck / "perspective.config.json").write_text(json.dumps(
        dict(model="perspective", width_scale=s, view_size=64,
             pano_width=64)))
    base = PanoBaselineNet(
        widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)))
    bparams = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))
    ptrain.save_params_npz(str(ck / "panoramic_final.params.npz"), bparams)
    (ck / "panoramic.config.json").write_text(json.dumps(
        dict(model="panoramic", width_scale=s, view_size=64,
             pano_width=64)))

    rng = np.random.RandomState(11)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "gt").mkdir()
    for i in range(2):
        pio.save_jpg(str(tmp_path / "rgb" / f"p{i}.jpg"),
                     rng.rand(32, 64, 3).astype(np.float32))
        pio.save_png16(str(tmp_path / "gt" / f"p{i}.png"),
                       (rng.rand(32, 64) * 60000).astype(np.uint16))
    res = tmp_path / "res"
    mets = run_batch_e2e(
        str(tmp_path / "rgb"), str(tmp_path / "gt"), str(res),
        str(ck / "perspective_final.params.npz"), cfg=E2E_CFG,
        baseline_ckpt=str(ck / "panoramic_final.params.npz"),
        batch_size=2, log=lambda *a: None)
    assert len(mets) == 2
    for i in range(2):
        out = pio.load_image01(str(res / f"p{i}.png"))
        assert out.shape == (E2E_CFG.out_height, E2E_CFG.out_width)
        assert np.isfinite(out).all()


def test_full_pipeline_precomputed_baseline(tiny_scene):
    tiny_cfg = E2E_CFG
    rgb = jnp.asarray(np.stack([make_equirect(64, 32)] * 3, -1))
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out, abcd, baseline, _ = jax.jit(
        lambda r, b: full_pipeline(r, persp, pp, baseline=b, cfg=tiny_cfg,
                                   view_width=64)
    )(rgb, jnp.asarray(tiny_scene["emap"]))
    assert out.shape == (tiny_cfg.out_height, tiny_cfg.out_width)
    np.testing.assert_array_equal(np.asarray(baseline),
                                  tiny_scene["emap"])


def test_batched_e2e_packed_extraction_matches_f32():
    """extract_dtype='packed' (the TPU default) vs 'f32' through the full
    batched graph: u16 outputs agree within 2 steps on a u8-exact input.
    The only arithmetic difference is the baseline resize precision (bf16
    under packed) and f32 interpolation rounding in the packed sampler."""
    from panodepth.e2e import build_batched_e2e

    tiny_cfg = E2E_CFG
    rng = np.random.RandomState(3)
    rgb_u8 = rng.randint(0, 256, (2, 32, 64, 3)).astype(np.uint8)
    rgbs = jnp.asarray(rgb_u8.astype(np.float32) / 255.0)
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    base = PanoBaselineNet(widths=(8, 16, 16, 32))
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    bp = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))

    outs = {}
    for mode in ("f32", "packed"):
        full, _, _ = build_batched_e2e(
            persp, pp, tiny_cfg, view_width=64, base_model=base,
            base_params=bp, base_w=64, extract_dtype=mode)
        out_u16, _ = full(rgbs)
        outs[mode] = np.asarray(out_u16).astype(np.int32)
    # uint8 streamed input must also hit the pack-direct path
    full, _, _ = build_batched_e2e(
        persp, pp, tiny_cfg, view_width=64, base_model=base,
        base_params=bp, base_w=64, extract_dtype="packed")
    out_u8_in, _ = full(jnp.asarray(rgb_u8))
    np.testing.assert_array_equal(np.asarray(out_u8_in), outs["packed"])
    assert np.abs(outs["f32"] - outs["packed"]).max() <= 2


def test_resolve_extract_dtype_auto_policy():
    """'auto' engages a quantizing table only for uint8 sources on TPU
    (pair16 since its r5 12/12 accuracy proof, docs/logs_r5/).  Wider
    sources (16-bit PNG, PFM floats) must never be silently quantized;
    explicit modes pass through."""
    from panodepth.e2e import _resolve_extract_dtype as r

    assert r("auto", jnp.uint8, on_tpu=True) == "pair16"
    for wide in (jnp.uint16, jnp.float32):
        assert r("auto", wide, on_tpu=True) == "f32"
    for d in (jnp.uint8, jnp.uint16, jnp.float32):
        assert r("auto", d, on_tpu=False) == "f32"
        for explicit in ("packed", "pair16", "bf16", "f32"):
            assert r(explicit, d, on_tpu=True) == explicit


def test_filter_files_shared_semantics():
    """The include/exclude/limit filter shared by run_batch and
    run_batch_e2e (Main.cpp:357-407 runtime form)."""
    from panodepth.io import filter_files

    files = [f"/d/pano_{n}.jpg" for n in ("a1", "a2", "b1", "b2")]
    assert filter_files(files) == files
    assert filter_files(files, include=["_a"]) == files[:2]
    assert filter_files(files, include=["a1", "b1"]) == [files[0], files[2]]
    assert filter_files(files, exclude=["_b"]) == files[:2]
    assert filter_files(files, include=["_a"], exclude=["2"]) == [files[0]]
    assert filter_files(files, limit=3) == files[:3]
    assert filter_files(files, include=["_b"], limit=1) == [files[2]]


def test_load_model_checkpoint_new_families(tmp_path):
    """The arch-sidecar loader rebuilds bifuse/slicenet checkpoints with
    the same widths train_cli derived from width_scale (e2e.py:157-172),
    so `--baseline-ckpt` accepts all five zoo families."""
    import json

    from panodepth.e2e import load_model_checkpoint
    from panodepth.models import train as ptrain
    from panodepth.models.bifuse import BiFuseNet
    from panodepth.models.slicenet import SliceNet

    s = 0.25
    widths = tuple(max(8, int(w * s)) for w in (32, 64, 128, 256))
    fams = {
        "bifuse": BiFuseNet(widths=widths),
        "slicenet": SliceNet(widths=widths, slice_dim=max(32, int(256 * s))),
    }
    for name, model in fams.items():
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
        ptrain.save_params_npz(str(tmp_path / f"{name}_final.params.npz"),
                               params)
        with open(tmp_path / f"{name}.config.json", "w") as fp:
            json.dump({"model": name, "width_scale": s, "view_size": 256,
                       "pano_width": 64}, fp)
        model2, params2, arch = load_model_checkpoint(
            str(tmp_path / f"{name}_final.params.npz"))
        assert arch["model"] == name
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            assert a.shape == b.shape
        out = jax.jit(model2.apply)(params2, jnp.zeros((1, 32, 64, 3)))
        assert out.shape == (1, 32, 64)


def test_batched_e2e_packed16_runs_and_is_close():
    """extract_dtype='packed16' (RGB565 opt-in) through the full batched
    graph: compiles, and the u16 output stays within a small band of the
    f32 path (5/6/5 input quantization perturbs the CNN mildly)."""
    from panodepth.e2e import build_batched_e2e

    rng = np.random.RandomState(4)
    rgb_u8 = rng.randint(0, 256, (2, 32, 64, 3)).astype(np.uint8)
    rgbs = jnp.asarray(rgb_u8.astype(np.float32) / 255.0)
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    base = PanoBaselineNet(widths=(8, 16, 16, 32))
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    bp = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))

    outs = {}
    for mode in ("f32", "packed16"):
        full, _, _ = build_batched_e2e(
            persp, pp, E2E_CFG, view_width=64, base_model=base,
            base_params=bp, base_w=64, extract_dtype=mode)
        out_u16, _ = full(rgbs)
        outs[mode] = np.asarray(out_u16).astype(np.int64)
    # uint8 streamed input hits the pack-direct path and agrees exactly
    full, _, _ = build_batched_e2e(
        persp, pp, E2E_CFG, view_width=64, base_model=base,
        base_params=bp, base_w=64, extract_dtype="packed16")
    out_u8_in, _ = full(jnp.asarray(rgb_u8))
    np.testing.assert_array_equal(np.asarray(out_u8_in), outs["packed16"])
    # untrained tiny nets amplify input deltas; just bound the drift
    assert np.abs(outs["f32"] - outs["packed16"]).mean() < 2000.0

    # pair16 (pixel-pair u32 table, half the gather count) feeds the CNNs
    # bit-identical RGB to packed16, so the full graph agrees exactly
    full, _, _ = build_batched_e2e(
        persp, pp, E2E_CFG, view_width=64, base_model=base,
        base_params=bp, base_w=64, extract_dtype="pair16")
    out_pair, _ = full(rgbs)
    np.testing.assert_array_equal(np.asarray(out_pair), outs["packed16"])

    # pair16d (Bayer-dithered tables) runs the same graph shape; its
    # outputs differ from pair16 only through the +-1-step dither
    full, _, _ = build_batched_e2e(
        persp, pp, E2E_CFG, view_width=64, base_model=base,
        base_params=bp, base_w=64, extract_dtype="pair16d")
    out_paird, _ = full(rgbs)
    assert out_paird.shape == out_pair.shape
    assert np.abs(np.asarray(out_paird).astype(np.int64)
                  - outs["packed16"]).mean() < 2000.0


def test_batched_e2e_new_baseline_families():
    """BiFuseNet / SliceNet as the on-device panoramic baseline through
    the full batched graph (the CLI's --baseline-ckpt contract: input
    (B, base_w//2, base_w, 3), output (B, base_w//2, base_w) in 0~1)."""
    from panodepth.e2e import build_batched_e2e
    from panodepth.models.bifuse import BiFuseNet
    from panodepth.models.slicenet import SliceNet

    rng = np.random.RandomState(6)
    rgbs = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    for base in (BiFuseNet(widths=(8, 16, 16, 32)),
                 SliceNet(widths=(8, 16, 16, 32), slice_dim=32,
                          rnn_layers=1)):
        bp = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))
        full, _, _ = build_batched_e2e(
            persp, pp, E2E_CFG, view_width=64, base_model=base,
            base_params=bp, base_w=64)
        out_u16, baselines = full(rgbs)
        assert out_u16.shape == (1, E2E_CFG.out_height, E2E_CFG.out_width)
        assert out_u16.dtype == jnp.uint16
        assert np.isfinite(np.asarray(baselines)).all()


def test_run_batch_e2e_persp_int8(tmp_path):
    """--persp-int8 drives the int8 PTQ perspective graph through the full
    file-level e2e driver; outputs stay close to the f32 run (the GN
    re-normalization bounds PTQ noise) and metrics are finite."""
    import json

    from panodepth import io as pio
    from panodepth.e2e import run_batch_e2e
    from panodepth.models import train as ptrain

    s = 0.125
    model = PerspectiveDepthNet(
        widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
        decoder_width=max(16, int(128 * s)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt_dir = tmp_path / "ck"
    ckpt_dir.mkdir()
    persp_ckpt = str(ckpt_dir / "perspective_final.params.npz")
    ptrain.save_params_npz(persp_ckpt, params)
    (ckpt_dir / "perspective.config.json").write_text(json.dumps(
        dict(model="perspective", width_scale=s, view_size=64,
             pano_width=64)))

    rng = np.random.RandomState(11)
    for d in ("rgb", "gt", "bl"):
        (tmp_path / d).mkdir()
    for i in range(2):
        pio.save_jpg(str(tmp_path / "rgb" / f"p{i}.jpg"),
                     rng.rand(32, 64, 3).astype(np.float32))
        pio.save_png16(str(tmp_path / "gt" / f"p{i}.png"),
                       (rng.rand(32, 64) * 60000).astype(np.uint16))
        pio.save_png16(str(tmp_path / "bl" / f"p{i}.depth.png"),
                       (rng.rand(32, 64) * 60000 + 2000).astype(np.uint16))

    outs = {}
    for tag, int8 in (("f32", False), ("int8", True)):
        res = tmp_path / f"res_hohonet_{tag}"
        mets = run_batch_e2e(
            str(tmp_path / "rgb"), str(tmp_path / "gt"), str(res),
            persp_ckpt, cfg=E2E_CFG, baseline_folder=str(tmp_path / "bl"),
            view_width=64, batch_size=1, persp_int8=int8,
            log=lambda *a: None)
        assert len(mets) == 2
        assert all(np.isfinite(m.mse_result) for m in mets)
        outs[tag] = [np.asarray(pio.load_image01(str(res / f"p{i}.png")))
                     for i in range(2)]
    for a, b in zip(outs["f32"], outs["int8"]):
        # same scenes through both graphs: registration + fusion damp the
        # CNN-side PTQ noise; require close agreement in the 0~1 encoding
        assert np.sqrt(np.mean((a - b) ** 2)) < 0.02


def test_box_base_feed_exact_and_gated(monkeypatch):
    """PANODEPTH_BASE_FEED=box: the baseline CNN input is the exact
    integer-factor box mean of the streamed uint8 panorama (bf16-rounded);
    non-u8 or non-divisible inputs silently keep the bilinear feed."""
    from panodepth.e2e import build_batched_e2e

    rng = np.random.RandomState(5)
    rgb_u8 = rng.randint(0, 256, (1, 64, 128, 3)).astype(np.uint8)
    persp = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    pp = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    class SpyBase:
        """Baseline 'model' that leaks its input feed's red channel as the
        baseline map, so the jitted stage exposes the feed for checking."""

        def apply(self, params, rb):
            return rb[..., 0].astype(jnp.float32)

    monkeypatch.setenv("PANODEPTH_BASE_FEED", "box")
    _, models, _ = build_batched_e2e(
        persp, pp, E2E_CFG, view_width=64, base_model=SpyBase(),
        base_params={}, base_w=64)
    rb_r = np.asarray(models(jnp.asarray(rgb_u8))[0], np.float32)
    want = (rgb_u8[..., 0].reshape(1, 32, 2, 64, 2).astype(np.float64)
            .mean((2, 4)) / 255.0)
    np.testing.assert_allclose(rb_r, want, atol=1.0 / 255.0)  # bf16 cast

    # f32 input: the box path must NOT engage (stays bilinear)
    rb_f = np.asarray(
        models(jnp.asarray(rgb_u8.astype(np.float32) / 255.0))[0],
        np.float32)
    assert rb_f.shape == rb_r.shape
    assert not np.allclose(rb_f, want, atol=1e-4)
