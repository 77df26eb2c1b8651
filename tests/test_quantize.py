"""int8 PTQ of the perspective net (models/quantize.py, QConv).

Pins (a) the converter's param-tree mapping against the quantized
module's own init structure, (b) closeness of the int8 forward to the f32
forward, (c) the weight round-trip error bound, and (d) the checkpoint-
level plumbing (load_model_checkpoint(quantize=True)).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panodepth.models.perspective import PerspectiveDepthNet, QConv
from panodepth.models.quantize import (quantize_conv_kernel,
                                       quantize_perspective_params)


@pytest.fixture(scope="module")
def small_net():
    model = PerspectiveDepthNet(stage_sizes=(1, 1), widths=(16, 32),
                                decoder_width=16)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_converted_tree_matches_quantized_init(small_net):
    model, params = small_net
    mq = model.clone(quantized=True)
    ref = mq.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cvt = quantize_perspective_params(params)
    assert (jax.tree_util.tree_structure(ref)
            == jax.tree_util.tree_structure(cvt))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(cvt)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_kernel_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    k = rng.randn(3, 3, 8, 16).astype(np.float32)
    q, s = quantize_conv_kernel(k)
    assert q.dtype == np.int8 and s.shape == (16,)
    back = q.astype(np.float32) * s
    # symmetric round-to-nearest: error <= scale/2 per weight
    assert np.max(np.abs(back - k)) <= np.max(s) / 2 + 1e-7
    # channel absmax maps to exactly +-127
    assert np.all(np.max(np.abs(q), axis=(0, 1, 2)) == 127)


def test_int8_forward_close_to_f32(small_net):
    model, params = small_net
    mq = model.clone(quantized=True)
    pq = quantize_perspective_params(params)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    y = model.apply(params, x)
    yq = mq.apply(pq, x)
    assert y.shape == yq.shape
    rel = float(jnp.sqrt(jnp.mean((y - yq) ** 2))
                / (jnp.sqrt(jnp.mean(y ** 2)) + 1e-9))
    # int8 PTQ noise through GN-renormalized stacks stays in the few-
    # percent band; the held-out accuracy adjudication is the real gate
    assert rel < 0.12, rel


def test_qconv_zero_input_exact():
    # symmetric quant has no zero-point: conv(0) must be exactly bias
    conv = QConv(4, (3, 3), use_bias=True)
    p = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))
    p = jax.tree.map(lambda a: a + 1 if a.dtype == jnp.float32 else a, p)
    y = conv.apply(p, jnp.zeros((1, 8, 8, 2)))
    np.testing.assert_allclose(np.asarray(y, np.float32), 1.0)


def test_load_checkpoint_quantize_plumbing(tmp_path):
    from panodepth.e2e import load_model_checkpoint
    from panodepth.models import train as ptrain

    # exactly the topology load_model_checkpoint builds at width_scale
    # 0.125: widths max(8, w/8) = (8, 16, 32, 64), decoder max(16, 16)
    model = PerspectiveDepthNet(widths=(8, 16, 32, 64), decoder_width=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ck = tmp_path / "perspective_final.params.npz"
    ptrain.save_params_npz(str(ck), params)
    (tmp_path / "perspective.config.json").write_text(json.dumps(
        {"model": "perspective", "view_size": 64, "width_scale": 0.125}))
    mq, pq, arch = load_model_checkpoint(str(ck), quantize=True)
    assert mq.quantized
    # width_scale 0.25 -> widths (16, 32, 64, 128); just run it
    out = mq.apply(pq, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64)

    # non-GN / non-perspective checkpoints refuse loudly
    (tmp_path / "perspective.config.json").write_text(json.dumps(
        {"model": "perspective", "view_size": 64, "variant": "nf"}))
    with pytest.raises(ValueError, match="GN perspective"):
        load_model_checkpoint(str(ck), quantize=True)
