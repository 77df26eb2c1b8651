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
