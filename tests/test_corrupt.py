"""Input-corruption ops: JPEG artifact fidelity, noise/exposure semantics."""

import io as _io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panodepth.ops import corrupt as C


def _test_image(h=64, w=64, seed=0):
    """Structured test content: gradients + edges + texture (JPEG responds
    very differently to smooth vs detailed content)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.5 + 0.3 * np.sin(xx / 6.0) * np.cos(yy / 9.0)
    img[h // 4: h // 2, w // 4: w // 2] = 0.9           # hard edges
    img += 0.08 * rng.rand(h, w).astype(np.float32)     # texture
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _pil_jpeg_gray(img01, quality):
    """Real libjpeg round-trip of a grayscale image via PIL."""
    from PIL import Image

    u8 = (np.clip(img01, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(u8, mode="L").save(buf, "JPEG", quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf), np.float32) / 255.0


@pytest.mark.parametrize("quality", [30, 60, 90])
def test_luma_path_matches_real_libjpeg(quality):
    """Grayscale (chroma-free) JPEG simulation vs a REAL libjpeg encode/
    decode: identical quant tables + DCT means the only deviations are
    libjpeg's integer-DCT approximation — about a code out of 255."""
    img = _test_image()
    rgb = np.stack([img] * 3, -1)[None]
    sim = np.asarray(C.jpeg_artifacts(jnp.asarray(rgb), float(quality)))[0]
    # gray input -> Cb = Cr = 0 exactly -> sim output stays gray
    np.testing.assert_allclose(sim[..., 0], sim[..., 1], atol=1.5 / 255)
    real = _pil_jpeg_gray(img, quality)
    err_sim = np.abs(sim[..., 0] - real)
    base = np.abs(img - real)  # how big the artifacts being modeled are
    assert err_sim.mean() < 1.5 / 255, err_sim.mean()
    assert err_sim.mean() < 0.35 * max(base.mean(), 1e-9)


def test_quality_monotone_and_range():
    img = np.stack([_test_image()] * 3, -1)[None]
    errs = []
    for q in (20.0, 50.0, 95.0):
        out = np.asarray(C.jpeg_artifacts(jnp.asarray(img), q))
        assert out.min() >= 0.0 and out.max() <= 1.0
        errs.append(float(np.abs(out - img).mean()))
    assert errs[0] > errs[1] > errs[2]          # lower quality = worse
    assert errs[2] < 0.01                       # q95 is near-transparent
    assert errs[0] > 0.005                      # q20 visibly degrades


def test_jpeg_per_sample_quality_vectorizes():
    img = np.stack([np.stack([_test_image(seed=s)] * 3, -1)
                    for s in range(3)])
    q = jnp.asarray([20.0, 60.0, 95.0])
    batch = np.asarray(C.jpeg_artifacts(jnp.asarray(img), q))
    solo = [np.asarray(C.jpeg_artifacts(jnp.asarray(img[i: i + 1]),
                                        float(q[i])))[0] for i in range(3)]
    for i in range(3):
        np.testing.assert_allclose(batch[i], solo[i], atol=1e-6)


def test_jpeg_rejects_unaligned_shapes():
    with pytest.raises(ValueError, match="multiples of 16"):
        C.jpeg_artifacts(jnp.zeros((1, 56, 64, 3)), 50.0)


def test_corrupt_deterministic_and_bounded():
    img = jnp.asarray(np.stack(
        [np.stack([_test_image(seed=s)] * 3, -1) for s in range(4)]))
    key = jax.random.PRNGKey(7)
    a = np.asarray(C.corrupt(img, key))
    b = np.asarray(C.corrupt(img, key))
    np.testing.assert_array_equal(a, b)          # same key -> same batch
    assert a.min() >= 0.0 and a.max() <= 1.0
    c = np.asarray(C.corrupt(img, jax.random.PRNGKey(8)))
    assert np.abs(a - c).max() > 1e-4            # different key -> different


def test_corrupt_off_probabilities_are_identity():
    img = jnp.asarray(np.stack([np.stack([_test_image()] * 3, -1)] * 2))
    cfg = C.CorruptConfig(p_jpeg=0.0, p_noise=0.0, p_photo=0.0)
    out = np.asarray(C.corrupt(img, jax.random.PRNGKey(0), cfg))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-7)


def test_corrupt_batches_passthrough_targets():
    def gen():
        for i in range(2):
            rgb = np.full((2, 32, 32, 3), 0.5, np.float32)
            yield rgb, np.full((2, 32, 32), 0.25 + i, np.float32), \
                np.ones((2, 32, 32), bool)

    got = list(C.corrupt_batches(gen(), seed=3))
    assert len(got) == 2
    for i, (rgb, depth, valid) in enumerate(got):
        assert rgb.shape == (2, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(depth), 0.25 + i)
        assert np.asarray(valid).all()
    # the two steps draw different corruption
    assert np.abs(np.asarray(got[0][0]) - np.asarray(got[1][0])).max() > 0


def test_eval_corruption_fixed():
    img = jnp.asarray(np.stack([np.stack([_test_image()] * 3, -1)] * 2))
    a = np.asarray(C.eval_corruption(img))
    b = np.asarray(C.eval_corruption(img))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - np.asarray(img)).mean() > 0.005  # visibly degraded
    assert a.min() >= 0.0 and a.max() <= 1.0
