"""End-to-end pipeline tests: files in -> fused 16-bit panorama + metrics out."""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from panodepth import io as pio
from panodepth import pipeline
from panodepth.config import MergeConfig

from conftest import make_equirect, smooth_depth


@pytest.fixture(scope="module")
def scene_files(tmp_path_factory):
    """Synthetic dataset on disk: rgb/, gt/, baseline/, views/."""
    from panodepth import geometry

    root = tmp_path_factory.mktemp("scene")
    cfg = MergeConfig(layout_name="test2", out_width=128)
    layout = cfg.layout
    for d in ("rgb", "gt", "baseline", "result", "views"):
        os.makedirs(root / d, exist_ok=True)

    name = "pano_0001"

    # true scene = smooth field + mild detail; the baseline additionally
    # carries a mid-frequency *artifact* (a bad panoramic CNN) that fusion
    # should erase in view-covered regions by re-imposing the clean views'
    # Laplacians (the paper's use case)
    def detail_depth(azi, zen):
        return np.clip(
            smooth_depth(azi, zen)
            + 0.03 * np.sin(5 * azi) * np.sin(4 * zen), 0, 1
        ).astype(np.float32)

    def artifact_depth(azi, zen):
        return np.clip(
            smooth_depth(azi, zen) * 0.9 + 0.03
            + 0.08 * np.sin(6 * azi) * np.sin(5 * zen), 0, 1
        ).astype(np.float32)

    # gt: 16-bit png of the true field
    gt = make_equirect(256, 128, detail_depth)
    pio.save_png16(str(root / "gt" / f"{name}.png"), pio.to_uint16(gt))
    # baseline: distorted + artifact-ridden, 16-bit png
    base = make_equirect(128, 64, artifact_depth)
    pio.save_png16(str(root / "baseline" / f"{name}.jpg.png"),
                   pio.to_uint16(base))
    # run_batch's default (bifuse) convention expects <raw>.jpg
    pio.save_jpg(str(root / "baseline" / f"{name}.jpg"), base)
    # rgb panorama (8-bit), content irrelevant to stage C
    rgb = np.stack([make_equirect(64, 32)] * 3, -1)
    pio.save_jpg(str(root / "rgb" / f"{name}.jpg"), rgb)
    # perspective depth views, 16-bit png
    pmap_files = []
    for v in range(layout.num_views):
        win = geometry.make_window(*layout.fovs[v], xp=np)
        w, h = 160, 120
        xg, yg = np.meshgrid(np.arange(w) / (w - 1), np.arange(h) / (h - 1))
        azi, zen = geometry.xy_to_spherical(win, xg, yg, xp=np)
        true = detail_depth(azi, zen)
        pm = np.clip(true * (0.8 + 0.05 * v) + 0.05, 0, 1)
        f = str(root / "views" / f"{name}.{layout.view_tag(v)}.png")
        pio.save_png16(f, pio.to_uint16(pm))
        pmap_files.append(f)
    return dict(root=root, cfg=cfg, name=name, pmap_files=pmap_files,
                gt=gt, base=base)


def test_merge_depth_maps_end_to_end(scene_files):
    root = scene_files["root"]
    cfg = scene_files["cfg"]
    out_file = str(root / "result" / "pano_0001.png")
    res = pipeline.merge_depth_maps(
        str(root / "baseline" / "pano_0001.jpg.png"),
        scene_files["pmap_files"], out_file, cfg,
        gt_filename=str(root / "gt" / "pano_0001.png"),
    )
    assert os.path.exists(out_file)
    out = pio.load_image01(out_file)
    assert out.shape == (64, 128)
    assert res.metrics is not None
    # fused result must beat the distorted baseline on RMSE
    assert res.metrics.mse_result < res.metrics.mse_given
    assert 0 < res.metrics.delta1_given <= 1
    # masked variants written
    assert os.path.exists(out_file + ".res.png")
    assert os.path.exists(out_file + ".giv.png")


def test_png16_roundtrip_exact(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randint(0, 65536, (16, 32)).astype(np.uint16)
    f = str(tmp_path / "x.png")
    pio.save_png16(f, data)
    back = np.asarray(pio.load_image01(f) * 65535.0 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(back, data)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.rand(8, 12).astype(np.float32) * 5
    f = str(tmp_path / "x.pfm")
    pio.save_pfm(f, img)
    back = pio.load_pfm(f)
    np.testing.assert_array_equal(back, img)
    # Load() semantics: cap at 0, divide by 10
    loaded = pio.load_image01(f)
    np.testing.assert_allclose(loaded, np.minimum(np.maximum(img, 0) / 10, 10),
                               atol=1e-7)


def test_filename_conventions():
    from panodepth.config import five_fold_leres

    assert pio.baseline_filename("b/", "x", "out_slicenet/") == \
        os.path.join("b/", "x.jpg.slicenet.png")
    assert pio.baseline_filename("b/", "x", "unifuse_res/") == \
        os.path.join("b/", "x.unifuse.jpg")
    assert pio.baseline_filename("b/", "x", "hohonet/") == \
        os.path.join("b/", "x.depth.png")
    assert pio.baseline_filename("b/", "x", "plain/") == \
        os.path.join("b/", "x.jpg")
    assert pio.gt_filename("g/", "area_rgb_1") == \
        os.path.join("g/", "area_depth_1.png")
    assert pio.gt_filename("g/", "scene_rgb", "replica") == \
        os.path.join("g/", "scene_depth.pfm")
    layout = five_fold_leres()
    fns = pio.pmap_filenames("v/", "img", layout)
    assert fns[0] == os.path.join("v/", "img.-3_75_18_94.jpg")
    assert len(fns) == 15


def test_run_batch_resume(scene_files, capsys):
    """Second run must skip the already-produced panorama."""
    root = scene_files["root"]
    cfg = scene_files["cfg"]
    logs = []
    # pmaps live in views/ as .png
    pipeline.run_batch(
        str(root / "rgb"), str(root / "gt"), str(root / "baseline"),
        str(root / "result2") + os.sep, cfg,
        views_folder=str(root / "views"), extract_rgb_views=False,
        pmap_ext=".png", log=logs.append,
    )
    assert os.path.exists(str(root / "result2") + os.sep + "pano_0001.png")
    logs2 = []
    pipeline.run_batch(
        str(root / "rgb"), str(root / "gt"), str(root / "baseline"),
        str(root / "result2") + os.sep, cfg,
        views_folder=str(root / "views"), extract_rgb_views=False,
        pmap_ext=".png", log=logs2.append,
    )
    assert any("skip" in l for l in logs2)


def test_run_batch_batched_matches_single(scene_files):
    """batch_size>1 streamed path must produce the same outputs."""
    import shutil

    root = scene_files["root"]
    cfg = scene_files["cfg"]
    r1 = str(root / "result_single") + os.sep
    r2 = str(root / "result_batched") + os.sep
    for r in (r1, r2):
        shutil.rmtree(r, ignore_errors=True)
    kw = dict(views_folder=str(root / "views"), extract_rgb_views=False,
              pmap_ext=".png", log=lambda *a: None)
    pipeline.run_batch(str(root / "rgb"), str(root / "gt"),
                       str(root / "baseline"), r1, cfg, **kw)
    pipeline.run_batch(str(root / "rgb"), str(root / "gt"),
                       str(root / "baseline"), r2, cfg, batch_size=4, **kw)
    a = pio.load_image01(r1 + "pano_0001.png")
    b = pio.load_image01(r2 + "pano_0001.png")
    np.testing.assert_array_equal(a, b)
    assert os.path.exists(r2 + "manifest.json")


@pytest.mark.parametrize("layout", ["4fold", "3fold", "5fold_midas"])
def test_all_layouts_merge(layout, scene_files):
    """Every shipped view layout must compile and run through the merge."""
    import jax
    import jax.numpy as jnp
    from panodepth import geometry
    from panodepth.config import LAYOUTS
    from panodepth.pipeline import merge_arrays

    cfg = MergeConfig(layout_name=layout, out_width=64)
    lt = LAYOUTS[layout]()
    rng = np.random.RandomState(0)
    emap = jnp.asarray(rng.uniform(0.1, 0.9, (32, 64)).astype(np.float32))
    pmaps = jnp.asarray(
        rng.uniform(0.1, 0.9, (lt.num_views, 48, 64)).astype(np.float32))
    out, abcd = jax.jit(lambda e, p: merge_arrays(e, p, cfg))(emap, pmaps)
    assert out.shape == (32, 64) and out.dtype == jnp.uint16
    assert np.isfinite(np.asarray(abcd)).all()


def test_run_batch_batched_profile_split(scene_files):
    """--profile with batch_size>1 must report a real reg/fusion split."""
    import json
    import shutil

    root = scene_files["root"]
    cfg = scene_files["cfg"]
    r1 = str(root / "result_single") + os.sep
    rp = str(root / "result_batched_prof") + os.sep
    shutil.rmtree(rp, ignore_errors=True)
    kw = dict(views_folder=str(root / "views"), extract_rgb_views=False,
              pmap_ext=".png", log=lambda *a: None)
    pipeline.run_batch(str(root / "rgb"), str(root / "gt"),
                       str(root / "baseline"), rp, cfg, batch_size=4,
                       profile=True, **kw)
    a = pio.load_image01(r1 + "pano_0001.png")
    b = pio.load_image01(rp + "pano_0001.png")
    np.testing.assert_array_equal(a, b)
    with open(rp + "manifest.json") as fp:
        man = json.load(fp)
    # the staged path measures registration for real (not the old silent 0)
    assert len(man["time_reg_ms"]) == 1
    assert man["time_reg_ms"][0] >= 0
    assert len(man["time_fusion_ms"]) == 1


def test_extract_stage_a_batched(scene_files, tmp_path):
    """Batched stage A writes every view file and matches extract_views."""
    import jax

    from panodepth.ops.projection import extract_views

    root = scene_files["root"]
    cfg = MergeConfig(out_width=128)  # production 15-view layout
    layout = cfg.layout
    vdir = str(tmp_path / "views_a")
    rgb_files = pio.list_images(str(root / "rgb"))
    n = pipeline.extract_stage_a(rgb_files, vdir, cfg, width=96,
                                 batch_size=4)
    assert n == len(rgb_files)
    # outputs match the unbatched per-view extraction (same jpeg encode)
    rgb = pio.load_image01(rgb_files[0])
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, -1)
    views = extract_views(jnp.asarray(rgb[..., :3]), layout, width=96)
    raw = pio.raw_name(rgb_files[0])
    outs = pio.pmap_filenames(vdir, raw, layout, ext=".jpg")
    for v, out in zip(views, outs):
        assert os.path.exists(out)
        got = pio.load_image01(out)
        ref_dir = str(tmp_path / "ref.jpg")
        pio.save_jpg(ref_dir, np.asarray(jax.device_get(v)))
        want = pio.load_image01(ref_dir)
        # batched vs solo launches may differ by one float ulp, which can
        # flip a u8 quantization step through the JPEG encode
        np.testing.assert_allclose(got, want, atol=1.01 / 255)
    # second call: everything exists, nothing re-extracted
    assert pipeline.extract_stage_a(rgb_files, vdir, cfg, width=96) == 0


def test_merge_many_u16_streaming_bound(scene_files):
    """uint16-streamed inputs (half the host->device bytes) perturb the
    fused u16 output by at most 1 vs the f32 path (the on-device k/65535
    differs from numpy's by <=1 f32 ulp under XLA's reciprocal-multiply)."""
    root = scene_files["root"]
    cfg = scene_files["cfg"]
    base = str(root / "baseline" / "pano_0001.jpg.png")
    gt = str(root / "gt" / "pano_0001.png")
    outs = {}
    for mode in ("off", "on"):
        out = str(root / f"u16_{mode}.png")
        res = pipeline.merge_many(
            [dict(baseline=base, pmaps=scene_files["pmap_files"], out=out,
                  gt=gt)],
            cfg, batch_size=1, log=lambda *a: None, stream_u16=mode)
        assert res[0] is not None
        outs[mode] = res[0].out_u16.astype(np.int64)
    delta = np.abs(outs["on"] - outs["off"])
    assert delta.max() <= 1, f"u16 streaming delta {delta.max()}"


def test_u16_post_gather_normalize_exact(scene_files):
    """Keeping uint16 tables through the registration/fusion gathers and
    normalizing post-gather (ops.sampling.as01_post) matches normalizing
    the full table on-device first within 1 u16 — the k/65535 commutes with
    the gather element-for-element; the residual 1-ulp wiggle is XLA fusing
    the two graphs with different fma contraction, same bound as the
    streaming test above.  The fit coefficients see identical sample
    values, so they agree to compilation-level ulps (far inside the 5e-4
    oracle tolerance of test_registration)."""
    import jax

    from panodepth.pipeline import merge_arrays

    cfg = scene_files["cfg"]
    rng = np.random.RandomState(3)
    v = cfg.layout.num_views
    emap_u16 = rng.randint(0, 65536, (128, 256)).astype(np.uint16)
    pmaps_u16 = rng.randint(0, 65536, (v, 96, 128)).astype(np.uint16)

    fn = jax.jit(lambda e, p: merge_arrays(e, p, cfg))
    out_u16, abcd_u16 = fn(jnp.asarray(emap_u16), jnp.asarray(pmaps_u16))
    # pre-normalized on device with the identical k/65535
    e01 = jnp.asarray(emap_u16).astype(jnp.float32) / 65535.0
    p01 = jnp.asarray(pmaps_u16).astype(jnp.float32) / 65535.0
    out_f32, abcd_f32 = fn(e01, p01)
    delta = np.abs(np.asarray(out_u16).astype(np.int64)
                   - np.asarray(out_f32).astype(np.int64))
    assert delta.max() <= 1, f"post-gather normalize delta {delta.max()}"
    np.testing.assert_allclose(np.asarray(abcd_u16),
                               np.asarray(abcd_f32), rtol=0, atol=1e-5)


def test_filter_files_shard():
    """--shard i/n slices the todo list round-robin after include/exclude
    and before limit; shards are disjoint and cover everything."""
    files = [f"pano_{i:03d}.jpg" for i in range(10)]
    s0 = pio.filter_files(files, shard="0/3")
    s1 = pio.filter_files(files, shard="1/3")
    s2 = pio.filter_files(files, shard="2/3")
    assert s0 == files[0::3] and s1 == files[1::3] and s2 == files[2::3]
    assert sorted(s0 + s1 + s2) == files
    # limit applies per shard; include applies before sharding
    assert pio.filter_files(files, shard="0/3", limit=2) == files[0::3][:2]
    assert pio.filter_files(files, include=["_00"], shard="1/2") == [
        "pano_001.jpg", "pano_003.jpg", "pano_005.jpg", "pano_007.jpg",
        "pano_009.jpg"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pio.filter_files(files, shard="3/3")
    with _pytest.raises(ValueError):
        pio.filter_files(files, shard="bogus")


def test_run_batch_shard_manifest(scene_files):
    """--shard runs write per-shard manifests (no last-writer clobber in
    a shared result folder) and an out-of-range shard gets nothing."""
    root = scene_files["root"]
    cfg = scene_files["cfg"]
    res = str(root / "result_shard") + os.sep
    logs = []
    pipeline.run_batch(
        str(root / "rgb"), str(root / "gt"), str(root / "baseline"),
        res, cfg, views_folder=str(root / "views"),
        extract_rgb_views=False, pmap_ext=".png", log=logs.append,
        shard="0/2",
    )
    assert os.path.exists(res + "pano_0001.png")
    assert os.path.exists(res + "manifest.0-of-2.json")
    assert not os.path.exists(res + "manifest.json")
    logs2 = []
    pipeline.run_batch(
        str(root / "rgb"), str(root / "gt"), str(root / "baseline"),
        res, cfg, views_folder=str(root / "views"),
        extract_rgb_views=False, pmap_ext=".png", log=logs2.append,
        shard="1/2",
    )
    assert any("0 RGB panoramas" in l for l in logs2)
    assert os.path.exists(res + "manifest.1-of-2.json")
