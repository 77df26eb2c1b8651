"""Test env: force an 8-device virtual CPU platform before jax import.

Multi-device (data-parallel) behavior is tested without TPU hardware via
XLA's host-platform device-count override, per SURVEY.md section 4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: under the axon TPU plugin the JAX_PLATFORMS env var is ignored;
# only the config API reliably selects the host platform.
import jax

jax.config.update("jax_platforms", "cpu")

import math

import numpy as np
import pytest

from panodepth.config import MergeConfig, ViewLayout, register_layout

D2R = math.pi / 180.0

# ``pytest -m quick``: the parity-critical gate (~30 s warm) — the fast
# green signal on this 1-vCPU box, where the full suite takes ~30 min.
# The full suite remains the pre-release bar.
_QUICK_MODULES = {"test_parity_default", "test_golden_seam", "test_fusion",
                  "test_registration", "test_config"}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: parity-critical fast gate (pytest -m quick)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item, "module", None)
        name = mod.__name__.rsplit(".", 1)[-1] if mod else ""
        if name in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


def smooth_depth(azi, zen):
    """Smooth synthetic 0~1 depth field on the sphere (seam-continuous)."""
    return (
        0.45
        + 0.18 * np.sin(azi) * np.sin(zen)
        + 0.12 * np.cos(2 * azi) * np.cos(zen)
        + 0.08 * np.sin(zen * 2.0)
    ).astype(np.float32)


def make_equirect(width, height, fn=smooth_depth):
    x = np.arange(width, dtype=np.float64)
    y = np.arange(height, dtype=np.float64)
    azi = x / (width - 1) * 2 * math.pi
    zen = y / (height - 1) * math.pi
    ag, zg = np.meshgrid(azi, zen)
    return fn(ag, zg).astype(np.float32)


_TEST_LAYOUT = register_layout(
    ViewLayout(
        "test2",
        fovs=np.array(
            [
                (25 * D2R, 175 * D2R, 30 * D2R, 150 * D2R),
                (145 * D2R, 345 * D2R, 30 * D2R, 150 * D2R),
            ]
        ),
        ranges=np.array(
            [
                (170 * D2R, 30 * D2R, 40 * D2R, 140 * D2R),
                (340 * D2R, 150 * D2R, 40 * D2R, 140 * D2R),
            ]
        ),
    )
)


@pytest.fixture(scope="session")
def tiny_cfg():
    return MergeConfig(layout_name="test2", out_width=64)


@pytest.fixture(scope="session")
def tiny_scene(tiny_cfg):
    """Synthetic scene: true field, baseline emap, per-view pmaps.

    Each pmap holds a *distorted* version of the true depth (per-view affine
    warp), so registration has something nontrivial to solve.
    """
    from panodepth import geometry

    rng = np.random.RandomState(0)
    layout = tiny_cfg.layout
    emap = np.clip(make_equirect(64, 32) * 0.92 + 0.02, 0, 1)
    pmaps = []
    for v in range(layout.num_views):
        win = geometry.make_window(*layout.fovs[v], xp=np)
        w, h = 64, 48
        xs = np.arange(w) / (w - 1)
        ys = np.arange(h) / (h - 1)
        xg, yg = np.meshgrid(xs, ys)
        azi, zen = geometry.xy_to_spherical(win, xg, yg, xp=np)
        true = smooth_depth(azi, zen)
        scale = 0.75 + 0.1 * v
        offset = 0.08 - 0.03 * v
        pmaps.append(np.clip(true * scale + offset, 0, 1).astype(np.float32))
    return dict(emap=emap, pmaps=np.stack(pmaps), layout=layout)
