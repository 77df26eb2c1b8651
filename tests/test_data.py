"""Training data pipeline tests."""

import os

import numpy as np

from panodepth import io as pio
from panodepth.models import data as pdata

from conftest import make_equirect


def _dataset(tmp_path, n=3):
    rgb_dir, gt_dir = tmp_path / "rgb", tmp_path / "gt"
    os.makedirs(rgb_dir), os.makedirs(gt_dir)
    for i in range(n):
        rgb = np.stack([make_equirect(64, 32)] * 3, -1)
        pio.save_jpg(str(rgb_dir / f"p{i}.jpg"), rgb)
        pio.save_png16(str(gt_dir / f"p{i}.png"),
                       pio.to_uint16(make_equirect(64, 32)))
    return str(rgb_dir), str(gt_dir)


def test_discover_pairs(tmp_path):
    rgb_dir, gt_dir = _dataset(tmp_path)
    pairs = pdata.discover_pairs(rgb_dir, gt_dir)
    assert len(pairs) == 3
    # unmatched rgb is dropped
    pio.save_jpg(os.path.join(rgb_dir, "orphan.jpg"),
                 np.zeros((4, 8, 3), np.float32))
    assert len(pdata.discover_pairs(rgb_dir, gt_dir)) == 3


def test_pano_batches(tmp_path):
    pairs = pdata.discover_pairs(*_dataset(tmp_path))
    it = pdata.pano_batches(pairs, batch_size=2, width=64, epochs=1)
    rgb, depth, valid = next(it)
    assert rgb.shape == (2, 32, 64, 3)
    assert depth.shape == (2, 32, 64)
    assert valid.dtype == bool and valid.any()
    assert rgb.dtype == np.float32 and 0 <= rgb.min() and rgb.max() <= 1


def test_perspective_batches(tmp_path):
    pairs = pdata.discover_pairs(*_dataset(tmp_path))
    it = pdata.perspective_batches(pairs, batch_size=2, view_size=32,
                                   epochs=1)
    rgb, depth, valid = next(it)
    assert rgb.shape == (2, 32, 32, 3)
    assert depth.shape == (2, 32, 32)
    # the gathered crops must contain actual scene variation
    assert depth.std() > 0.01


def test_epochs_terminate(tmp_path):
    pairs = pdata.discover_pairs(*_dataset(tmp_path))
    batches = list(pdata.pano_batches(pairs, batch_size=2, width=64,
                                      epochs=2))
    assert len(batches) == 2  # 3 pairs -> 1 full batch per epoch


def test_augment_batch_geometry_correct():
    """Spatial transforms hit rgb/depth/valid identically; only the
    photometric gain touches rgb; pano rolls preserve content."""
    from panodepth.models.data import augment_batch

    rng0 = np.random.RandomState(3)
    B, H, W = 4, 8, 16
    depth = rng0.rand(B, H, W).astype(np.float32) + 0.01
    depth[:, 2:4, 5:9] = 0.0  # holes
    valid = depth >= 1e-4
    rgb = np.full((B, H, W, 3), 0.5, np.float32)

    out_rgb, out_d, out_v = augment_batch(rgb, depth, valid,
                                          np.random.RandomState(7),
                                          pano=True)
    assert out_rgb.shape == rgb.shape and out_d.shape == depth.shape
    # inputs untouched (copies)
    np.testing.assert_array_equal(rgb, 0.5)
    for i in range(B):
        # the validity pattern moved WITH the depth
        np.testing.assert_array_equal(out_v[i], out_d[i] >= 1e-4)
        # roll+flip permute columns: every row keeps its multiset of values
        np.testing.assert_allclose(np.sort(out_d[i], axis=None),
                                   np.sort(depth[i], axis=None))
        # constant rgb stays constant per sample: pure gain, in range
        u = np.unique(out_rgb[i])
        assert u.size == 1 and 0.5 * 0.8 - 1e-6 <= u[0] <= 0.5 * 1.2 + 1e-6

    # without pano, columns may flip but never roll: first row of sample 0
    # is either identical or exactly mirrored
    out_rgb2, out_d2, _ = augment_batch(rgb, depth, valid,
                                        np.random.RandomState(11))
    for i in range(B):
        same = np.allclose(out_d2[i], depth[i])
        flipped = np.allclose(out_d2[i], depth[i][:, ::-1])
        assert same or flipped


def test_batches_augmented(tmp_path):
    """augment=True threads through both generators: shapes/dtypes
    unchanged, streams stay deterministic for a fixed seed."""
    pairs = pdata.discover_pairs(*_dataset(tmp_path))
    a = next(pdata.pano_batches(pairs, 2, width=64, epochs=1, seed=5,
                                augment=True))
    b = next(pdata.pano_batches(pairs, 2, width=64, epochs=1, seed=5,
                                augment=True))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert a[0].shape == (2, 32, 64, 3) and a[2].dtype == bool

    p = next(pdata.perspective_batches(pairs, 2, view_size=32, epochs=1,
                                       seed=5, augment=True))
    assert p[0].shape == (2, 32, 32, 3)
    assert 0 <= p[0].min() and p[0].max() <= 1
