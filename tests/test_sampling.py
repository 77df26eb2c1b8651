"""Nearest/bilinear sampling semantics vs the reference's int-cast lookups."""

import math

import jax.numpy as jnp
import numpy as np

from panodepth.ops import sampling

from reference_impl import emap_value_at_coord, RefPerspectiveMap


def test_unit_nearest_matches_reference():
    rng = np.random.RandomState(0)
    img = rng.rand(17, 23).astype(np.float32)
    ref = RefPerspectiveMap(img, (0.1, 1.2, 0.8, 2.0), (0, 1, 0, 1))
    xs = rng.uniform(0, 1, 200)
    ys = rng.uniform(0, 1, 200)
    fast = np.asarray(sampling.sample_unit_nearest(jnp.asarray(img),
                                                   jnp.asarray(xs),
                                                   jnp.asarray(ys)))
    slow = np.array([ref.value(x, y) for x, y in zip(xs, ys)])
    np.testing.assert_array_equal(fast, slow)


def test_equirect_nearest_matches_reference():
    rng = np.random.RandomState(1)
    img = rng.rand(32, 64).astype(np.float32)
    azi = rng.uniform(0, 2 * math.pi, 300)
    zen = rng.uniform(0, math.pi, 300)
    fast = np.asarray(sampling.sample_equirect_nearest(jnp.asarray(img),
                                                       jnp.asarray(azi),
                                                       jnp.asarray(zen)))
    slow = np.array([emap_value_at_coord(img, a, z) for a, z in zip(azi, zen)])
    np.testing.assert_array_equal(fast, slow)


def test_equirect_nearest_multichannel():
    img = np.stack([np.full((8, 16), 0.25), np.full((8, 16), 0.75)], -1)
    v = sampling.sample_equirect_nearest(jnp.asarray(img), jnp.asarray([1.0]),
                                         jnp.asarray([1.0]))
    assert float(v[0]) == 0.25  # channel 0, like the reference


def test_bilinear_agrees_with_nearest_at_pixel_centers():
    rng = np.random.RandomState(2)
    img = rng.rand(16, 32).astype(np.float32)
    w, h = 32, 16
    xi = np.arange(1, w - 1)
    yi = np.arange(1, h - 1)
    xg, yg = np.meshgrid(xi, yi)
    azi = xg / (w - 1) * 2 * math.pi
    zen = yg / (h - 1) * math.pi
    bil = np.asarray(sampling.sample_equirect_bilinear(
        jnp.asarray(img), jnp.asarray(azi), jnp.asarray(zen)))
    np.testing.assert_allclose(bil, img[yg, xg], atol=1e-5)


def test_bilinear_interpolates():
    img = np.zeros((4, 8), np.float32)
    img[:, 4] = 1.0
    # halfway between column 3 and 4 in azimuth
    azi = (3.5 / 7) * 2 * math.pi
    v = sampling.sample_equirect_bilinear(jnp.asarray(img),
                                          jnp.asarray([azi]),
                                          jnp.asarray([math.pi / 2]))
    np.testing.assert_allclose(float(v[0]), 0.5, atol=1e-6)


def test_rotate_equirect_identity_and_yaw():
    rng = np.random.RandomState(5)
    img = rng.rand(32, 64).astype(np.float32)
    ident = np.asarray(sampling.rotate_equirect(jnp.asarray(img)))
    # identity rotation resamples at texel positions: close to the original
    # away from the poles; the last column wraps to azimuth 0 (cols 0 and
    # w-1 share an azimuth in the inclusive (w-1) convention)
    np.testing.assert_allclose(ident[8:24, :-1], img[8:24, :-1], atol=0.08)
    # a yaw by one texel (2pi/(w-1) in this convention) equals a horizontal
    # roll, away from the seam column
    yaw = 2 * math.pi / 63
    rolled = np.asarray(sampling.rotate_equirect(jnp.asarray(img), yaw=yaw))
    # cols -2/-1 touch the azimuth wrap after the shift; exclude them
    np.testing.assert_allclose(rolled[8:24, 1:-2],
                               np.roll(img, -1, 1)[8:24, 1:-2], atol=0.08)


def test_packed_bilinear_matches_f32_for_u8_sources():
    """pack_rgb_u32 + packed sampler == the f32 bilinear path for 8-bit
    RGB sources (the e2e extraction fast path; one u32 gather per tap)."""
    rng = np.random.RandomState(9)
    rgb_u8 = rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
    rgb_f32 = rgb_u8.astype(np.float32) / 255.0
    azi = jnp.asarray(rng.uniform(0, 2 * math.pi, (10, 11)).astype(np.float32))
    zen = jnp.asarray(rng.uniform(0, math.pi, (10, 11)).astype(np.float32))

    ref = np.asarray(sampling.sample_equirect_bilinear(
        jnp.asarray(rgb_f32), azi, zen))
    for src in (rgb_u8, rgb_f32):  # uint8 direct and f32-roundtrip packing
        packed = sampling.pack_rgb_u32(jnp.asarray(src))
        assert packed.dtype == jnp.uint32 and packed.shape == (32, 64)
        got = np.asarray(sampling.sample_equirect_bilinear_packed(
            packed, azi, zen))
        np.testing.assert_allclose(got, ref, atol=2e-6)


def test_packed565_bilinear_quantization_bound():
    """pack_rgb565_u16 + its sampler == the f32 bilinear path up to the
    5/6/5 quantization bound (half of 1/31 resp. 1/63 per channel — the
    interpolation is convex, so the tap error bound survives it), and is
    EXACT for 565-representable sources."""
    rng = np.random.RandomState(11)
    rgb_u8 = rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
    rgb_f32 = rgb_u8.astype(np.float32) / 255.0
    azi = jnp.asarray(rng.uniform(0, 2 * math.pi, (10, 11)).astype(np.float32))
    zen = jnp.asarray(rng.uniform(0, math.pi, (10, 11)).astype(np.float32))

    ref = np.asarray(sampling.sample_equirect_bilinear(
        jnp.asarray(rgb_f32), azi, zen))
    for src in (rgb_u8, rgb_f32):
        packed = sampling.pack_rgb565_u16(jnp.asarray(src))
        assert packed.dtype == jnp.uint16 and packed.shape == (32, 64)
        got = np.asarray(sampling.sample_equirect_bilinear_packed565(
            packed, azi, zen))
        bound = np.array([0.5 / 31, 0.5 / 63, 0.5 / 31]) + 1e-5
        assert (np.abs(got - ref) <= bound).all()

    # 565-representable image: quantization is the identity
    q = np.stack([np.round(rgb_f32[..., 0] * 31) / 31,
                  np.round(rgb_f32[..., 1] * 63) / 63,
                  np.round(rgb_f32[..., 2] * 31) / 31], -1).astype(np.float32)
    ref_q = np.asarray(sampling.sample_equirect_bilinear(
        jnp.asarray(q), azi, zen))
    got_q = np.asarray(sampling.sample_equirect_bilinear_packed565(
        sampling.pack_rgb565_u16(jnp.asarray(q)), azi, zen))
    np.testing.assert_allclose(got_q, ref_q, atol=2e-6)


def test_pair16_bitwise_matches_packed565():
    """pack_rgb565_pair_u32 + its row sampler is BIT-identical to the
    per-tap packed565 path (same quantized values, same f32 arithmetic
    order — only the gather pattern differs), including at the azimuth
    seam where the pair table bakes in the x+1 wrap."""
    rng = np.random.RandomState(13)
    rgb_u8 = rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
    # bias sample coords onto the seam column (x0 = w-1 -> x1 wraps to 0)
    azi = np.concatenate([
        rng.uniform(0, 2 * math.pi, 80),
        rng.uniform(2 * math.pi - 0.02, 2 * math.pi, 20),
    ]).astype(np.float32).reshape(10, 10)
    zen = rng.uniform(0, math.pi, (10, 10)).astype(np.float32)
    azi, zen = jnp.asarray(azi), jnp.asarray(zen)

    pair = sampling.pack_rgb565_pair_u32(jnp.asarray(rgb_u8))
    assert pair.dtype == jnp.uint32 and pair.shape == (32, 64)
    # table layout: high 16 = pixel x, low 16 = pixel (x+1) % w
    p16 = np.asarray(sampling.pack_rgb565_u16(jnp.asarray(rgb_u8)))
    pa = np.asarray(pair)
    np.testing.assert_array_equal(pa >> 16, p16)
    np.testing.assert_array_equal(pa & 0xFFFF, np.roll(p16, -1, axis=1))

    ref = np.asarray(sampling.sample_equirect_bilinear_packed565(
        jnp.asarray(p16), azi, zen))
    got = np.asarray(sampling.sample_equirect_bilinear_packed565pair(
        pair, azi, zen))
    np.testing.assert_array_equal(got, ref)


def test_dithered_565_zero_mean_and_bound():
    """Bayer-dithered RGB565: per-channel error is (a) bounded by ~one
    565 step per pixel and (b) near-zero-mean over aligned 4x4 blocks on
    constant inputs (banding converted to zero-mean noise)."""
    from panodepth.ops.sampling import pack_rgb565_u16

    # constant mid-gradient values that fall BETWEEN 565 codes (the
    # banding case): every undithered pixel rounds the same way
    for v in (0.317, 0.5161, 0.713):
        rgb = jnp.full((8, 8, 3), v, jnp.float32)
        p = np.asarray(pack_rgb565_u16(rgb, dither=True))
        r = (p >> 11) & 0x1F
        g = (p >> 5) & 0x3F
        b = p & 0x1F
        for ch, scale in ((r, 31.0), (g, 63.0), (b, 31.0)):
            err = ch.astype(np.float64) / scale - v
            assert np.max(np.abs(err)) <= 1.0 / scale + 1e-9
            # 4x4-block mean error ~ a quarter step (vs a potential half
            # step of coherent bias without dither)
            blocks = err.reshape(2, 4, 2, 4).mean((1, 3))
            assert np.max(np.abs(blocks)) <= 0.3 / scale
        # dither actually fires: constant input, non-constant codes
        assert len(np.unique(p)) > 1

    # undithered stays bit-stable (the exact-rounding contract)
    p0 = np.asarray(pack_rgb565_u16(jnp.full((8, 8, 3), 0.317), dither=False))
    assert len(np.unique(p0)) == 1


def test_pair16_dither_matches_dithered_565():
    from panodepth.ops.sampling import pack_rgb565_pair_u32, pack_rgb565_u16

    rng = np.random.RandomState(3)
    rgb = jnp.asarray(rng.rand(16, 32, 3).astype(np.float32))
    pair = np.asarray(pack_rgb565_pair_u32(rgb, dither=True))
    single = np.asarray(pack_rgb565_u16(rgb, dither=True)).astype(np.uint32)
    np.testing.assert_array_equal(pair >> 16, single)
    np.testing.assert_array_equal(pair & 0xFFFF, np.roll(single, -1, 1))
