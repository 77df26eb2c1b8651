"""Independent golden cross-check of the azimuth-seam flat-index wrap.

Everything else in the parity suite validates the production code against
``tests/reference_impl.py`` — itself a port of ``Depth.cpp``.  If the
porter misread the C++, oracle and product would agree with each other and
both be wrong.  This file closes that hole for the trickiest quirk
(PARITY.md #19) by asserting BOTH implementations against values computed
*by hand from the C++ text*, written out literally below.

The C++ under test (/root/reference/Depth.cpp:1695-1701):

    int xx = (*itr).first.first;          // mask tap x, may be -1 or width
    int yy = (*itr).first.second;
    float val = buffer[yy * width + xx];  // FLAT index into a row-major
                                          // width*height array

so for a covered pixel at X == 0 the left tap (xx = -1, yy = Y) reads
``buffer[Y*width - 1]`` == row Y-1, column width-1 (the previous row's
LAST pixel) — NOT the cylindrical wrap ``buffer[Y][width-1]``.  Likewise
at X == width-1 the right tap (xx = width) reads row Y+1, column 0.

Mask construction (Depth.cpp:1578-1607) at covered pixel (X, Y):
center weight 1, taps (X-xs, Y), (X+xs, Y), (X, Y-1), (X, Y+1) each -0.25;
overlapping views accumulate and the renormalization (Depth.cpp:1626-1647)
rescales the whole window by 1/center-weight.  The Jacobi update
(Depth.cpp:1704-1717) is

    target = buf[Y,X] + (win.Laplacian - Laplacian_cur) * 0.5
    new[Y,X] = clamp01(target * (1 - 1e-4) + buf[Y,X] * 1e-4)

Test scene (tiny enough to trace every number by hand):

* output 8x4, ONE pyramid level, ONE Jacobi iteration;
* zenith_range (0.3pi, 0.7pi) -> height0 = floor(4*0.3) = 1,
  height1 = ceil(4*0.7) = 3; masks live strictly inside: row 2 only;
* view A: azimuth range (0, 2pi*5/7) -> x0 = round(0) = 0,
  x1 = round(5.0) = 5, xs = +1, covered columns 0..4 (x1 exclusive,
  Depth.cpp:1566-1623 walks X from x0 and breaks when X == x1);
* view B: azimuth range (2pi, 2pi*3/7) REVERSED -> x0 = round(7.0) = 7,
  x1 = round(3.0) = 3, xs = -1, covered columns 7,6,5,4;
* both views' zenith range (0.5pi, 0.7pi) -> y0 = round(1.5) = 2 (C round
  half away from zero), clamped to height0+1 = 2; y1 = round(2.1) = 2,
  clamped to height1-1 = 2 -> row 2 exactly;
* columns 0..3 and 5..7 single-view; column 4 is covered by BOTH views
  with the identical symmetric tap set, so the accumulated mask is
  {center 2, taps -0.5} and renormalization scales it back to exactly
  {center 1, taps -0.25} — overlap exercised, hand math unchanged;
* both views carry CONSTANT depth 0.5, so every mask's target Laplacian
  is 0.5 * (1 - 4*0.25) = 0 exactly and the update depends only on the
  buffer stencil reads — i.e. purely on the seam-index semantics;
* the emap equals the level-0 buffer by construction: at level 0 the
  reference samples emap at azi = x/(w-1)*2pi, zen = y/(h-1)*pi
  (Depth.cpp:1441-1465), which for an emap of the same 8x4 shape is the
  identity gather; rows outside [height0, height1] zero (row 0 here).
"""

import math

import numpy as np
import jax.numpy as jnp

from panodepth import fusion

TWO_PI = 2.0 * math.pi

# f32-exact (all multiples of 1/64), chosen non-symmetric so every wrong
# index produces a visibly different answer
ROW1 = [4 / 64, 8 / 64, 12 / 64, 16 / 64, 20 / 64, 24 / 64, 28 / 64, 32 / 64]
ROW2 = [32 / 64, 16 / 64, 48 / 64, 8 / 64, 40 / 64, 24 / 64, 56 / 64, 4 / 64]
ROW3 = [64 / 64, 56 / 64, 48 / 64, 40 / 64, 32 / 64, 24 / 64, 16 / 64, 8 / 64]

ZENITH = (0.3 * math.pi, 0.7 * math.pi)


def _emap():
    e = np.zeros((4, 8), np.float32)
    e[1], e[2], e[3] = ROW1, ROW2, ROW3
    # row 0 arbitrary nonzero: level-0 init must zero it (y < height0)
    e[0] = 0.9
    return e


def _hand_expected_row2():
    """Row 2 after ONE Jacobi iteration, from the C++ text alone."""
    b1, b2, b3 = ROW1, ROW2, ROW3
    out = []
    for X in range(8):
        if X == 0:
            # left tap xx=-1: buffer[2*8 - 1] = buffer[1][7]  (the quirk)
            left = b1[7]
        else:
            left = b2[X - 1]
        if X == 7:
            # right tap xx=8: buffer[2*8 + 8] = buffer[3][0]  (the quirk)
            right = b3[0]
        else:
            right = b2[X + 1]
        lap_cur = b2[X] - 0.25 * (left + right + b1[X] + b3[X])
        target = b2[X] + (0.0 - lap_cur) * 0.5
        out.append(target * (1 - 1e-4) + b2[X] * 1e-4)
    return np.asarray(out, np.float64)


def test_reference_impl_matches_hand_computed_seam_wrap():
    """The parity ORACLE itself reproduces the hand-derived C++ values —
    closing the 'the port agrees with the port' failure mode."""
    from reference_impl import RefPerspectiveMap, ref_solve_depth_all

    const = np.full((16, 16), 0.5, np.float32)
    fov_a = (0.0, 0.5 * math.pi, 0.4 * math.pi, 0.6 * math.pi)
    fov_b = (1.5 * math.pi, TWO_PI, 0.4 * math.pi, 0.6 * math.pi)
    view_a = RefPerspectiveMap(
        const, fov_a, (0.0, TWO_PI * 5 / 7, 0.5 * math.pi, 0.7 * math.pi))
    view_b = RefPerspectiveMap(
        const, fov_b, (TWO_PI, TWO_PI * 3 / 7, 0.5 * math.pi, 0.7 * math.pi))

    got = ref_solve_depth_all(_emap(), [view_a, view_b], 8, 4, ZENITH,
                              schedule=(1,))
    want_u16 = (np.clip(_hand_expected_row2(), 0, 1) * 65535.0).astype(
        np.int64)
    np.testing.assert_allclose(got[2].astype(np.int64), want_u16, atol=2,
                               err_msg="oracle row 2 vs hand-computed C++")
    # rows 1/3 have no masks: unchanged up to the regularization blend
    np.testing.assert_allclose(
        got[1].astype(np.int64),
        (np.asarray(ROW1, np.float64) * 65535).astype(np.int64), atol=2)
    assert (got[0] == 0).all()  # outside the zenith band


def test_fusion_stencil_matches_hand_computed_seam_wrap():
    """The PRODUCTION stencil (fusion.lap4_refwrap) + the Jacobi update
    formula reproduce the same hand values at every column of row 2."""
    buf = _emap().copy()
    buf[0] = 0.0  # level-0 init zeroes rows outside the band
    B = jnp.asarray(buf)
    upd = B + (0.0 - fusion.lap4_refwrap(B)) * 0.5
    blended = np.asarray(upd * (1 - 1e-4) + B * 1e-4)
    np.testing.assert_allclose(blended[2], _hand_expected_row2(), atol=2e-6,
                               err_msg="lap4_refwrap row 2 vs hand C++")


def test_cylindrical_wrap_would_fail():
    """The test discriminates: a plain cylindrical roll (lap4) — the
    'obvious' but WRONG reading of the C++ — misses by thousands of u16
    ulps at both seam columns."""
    buf = _emap().copy()
    buf[0] = 0.0
    B = jnp.asarray(buf)
    upd = B + (0.0 - fusion.lap4(B)) * 0.5
    blended = np.asarray(upd * (1 - 1e-4) + B * 1e-4)
    want = _hand_expected_row2()
    assert abs(blended[2, 0] - want[0]) * 65535 > 1000
    assert abs(blended[2, 7] - want[7]) * 65535 > 1000
    # interior columns are seam-free: both stencils agree there
    np.testing.assert_allclose(blended[2, 1:7], want[1:7], atol=2e-6)
