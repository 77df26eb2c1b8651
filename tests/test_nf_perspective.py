"""NFPerspectiveNet (normalizer-free perspective variant): shapes, signal
propagation, trainability, checkpoint/sidecar plumbing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panodepth.models import train as ptrain
from panodepth.models.perspective import (NFPerspectiveNet,
                                          PerspectiveDepthNet, WSConv)

TINY = dict(stage_sizes=(1, 1, 1, 1), widths=(8, 16, 16, 32),
            decoder_width=16)


@pytest.fixture(scope="module")
def tiny_nf():
    model = NFPerspectiveNet(**TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    return model, params


def test_nf_shapes_and_positivity(tiny_nf):
    model, params = tiny_nf
    out = jax.jit(model.apply)(params, jnp.zeros((2, 64, 96, 3)))
    assert out.shape == (2, 64, 96)
    assert (np.asarray(out) >= 0).all()


def test_wsconv_is_variance_preserving():
    """conv(relu(z)) for unit-normal z stays near unit variance under
    scaled weight standardization — the property the analytic beta
    tracking in NFResBlock rests on."""
    conv = WSConv(64, (3, 3), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 64))
    params = conv.init(jax.random.PRNGKey(2), x)
    y = conv.apply(params, jax.nn.relu(x))
    v = float(jnp.var(y))
    assert 0.7 < v < 1.4, v


def test_nf_param_count_matches_gn_class():
    """Same topology => parameter counts within a few percent (the NF
    variant trades GN scale/bias for WS gain/bias)."""
    n = {m: sum(x.size for x in jax.tree.leaves(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))))
        for m in (NFPerspectiveNet(**TINY), PerspectiveDepthNet(**TINY))}
    a, b = list(n.values())
    assert abs(a - b) / max(a, b) < 0.05, n


def test_nf_trains(tiny_nf):
    model, _ = tiny_nf
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    depth = jnp.asarray(rng.rand(2, 64, 96).astype(np.float32))
    mask = jnp.ones((2, 64, 96), bool)
    tx = ptrain.make_optimizer(lr=1e-3)
    state = ptrain.init_state(model, jax.random.PRNGKey(2), rgb[:1], tx)
    step = jax.jit(ptrain.make_train_step(model, tx))
    state, m0 = step(state, (rgb, depth, mask))
    loss0 = float(m0["loss"])
    for _ in range(5):
        state, m = step(state, (rgb, depth, mask))
    assert float(m["loss"]) < loss0
    assert np.isfinite(float(m["grad_norm"]))


def test_nf_variant_loads_through_sidecar(tmp_path):
    """A checkpoint whose sidecar says variant=nf reconstructs an
    NFPerspectiveNet through e2e.load_model_checkpoint (the path the CLI
    and the e2e drivers use)."""
    from panodepth.e2e import load_model_checkpoint

    # widths must match what width_scale=0.125 reconstructs:
    # max(8, int(w * s)) over (64, 128, 256, 512) and max(16, int(128 s))
    model = NFPerspectiveNet(widths=(8, 16, 32, 64), decoder_width=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    npz = str(tmp_path / "perspective_final.params.npz")
    ptrain.save_params_npz(npz, params)
    with open(os.path.join(tmp_path, "perspective.config.json"), "w") as fp:
        json.dump(dict(model="perspective", width_scale=0.125,
                       view_size=64, pano_width=512, variant="nf"), fp)
    m2, p2, arch = load_model_checkpoint(npz, norm_dtype=jnp.bfloat16)
    assert isinstance(m2, NFPerspectiveNet)
    assert arch["variant"] == "nf"
    out = m2.apply(p2, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64)


def test_nf_through_full_e2e_pipeline(tiny_nf):
    """The NF variant drives the on-device e2e graph (RGB -> views ->
    CNN -> registration -> fusion) exactly like the GN net."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import make_equirect
    from test_e2e import E2E_CFG

    from panodepth.e2e import full_pipeline
    from panodepth.models.panoramic import PanoBaselineNet

    model, params = tiny_nf
    base = PanoBaselineNet(widths=(8, 16, 16, 32))
    bp = base.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))
    rgb = jnp.asarray(np.stack([make_equirect(64, 32)] * 3, -1))
    out, abcd, baseline, pmaps = jax.jit(
        lambda r: full_pipeline(r, model, params, base, bp, cfg=E2E_CFG,
                                view_width=64, base_w=64))(rgb)
    assert out.shape == (E2E_CFG.out_height, E2E_CFG.out_width)
    assert out.dtype == jnp.uint16
    assert np.isfinite(np.asarray(abcd)).all()


def test_nf_panoramic_shapes_and_trains():
    from panodepth.models.panoramic import NFPanoBaselineNet

    model = NFPanoBaselineNet(widths=(8, 16, 16, 32))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)))
    out = jax.jit(model.apply)(params, jnp.zeros((2, 32, 64, 3)))
    assert out.shape == (2, 32, 64)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    depth = jnp.asarray(rng.rand(2, 32, 64).astype(np.float32))
    mask = jnp.ones((2, 32, 64), bool)
    tx = ptrain.make_optimizer(lr=1e-3)
    state = ptrain.init_state(model, jax.random.PRNGKey(2), rgb[:1], tx)
    step = jax.jit(ptrain.make_train_step(model, tx))
    state, m0 = step(state, (rgb, depth, mask))
    for _ in range(5):
        state, m = step(state, (rgb, depth, mask))
    assert float(m["loss"]) < float(m0["loss"])


def test_nf_panoramic_loads_through_sidecar(tmp_path):
    from panodepth.e2e import load_model_checkpoint
    from panodepth.models.panoramic import NFPanoBaselineNet

    model = NFPanoBaselineNet(widths=(8, 16, 32, 64))  # width_scale 0.25
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    npz = str(tmp_path / "panoramic_final.params.npz")
    ptrain.save_params_npz(npz, params)
    with open(os.path.join(tmp_path, "panoramic.config.json"), "w") as fp:
        json.dump(dict(model="panoramic", width_scale=0.25,
                       view_size=256, pano_width=64, variant="nf"), fp)
    m2, p2, arch = load_model_checkpoint(npz, norm_dtype=jnp.bfloat16)
    assert isinstance(m2, NFPanoBaselineNet)
    out = m2.apply(p2, jnp.zeros((1, 32, 64, 3)))
    assert out.shape == (1, 32, 64)


def test_nf_encoder_signal_propagation():
    """Full-width encoder keeps pre-activation variance in a sane band
    through all four stages (no collapse, no blow-up) on unit-normal
    input — the NF design's core claim, checked by probing the residual
    stream via intermediate capture."""
    model = NFPerspectiveNet()  # full widths
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(4), x)
    _, state = model.apply(params, x, capture_intermediates=True)
    inter = state["intermediates"]
    acts = [np.asarray(v) for k, v in jax.tree_util.tree_flatten_with_path(
        inter)[0] if "__call__" in str(k)]
    # the final head output is tiny (softplus(-1.8)); check the largest
    # tensors (residual stream) stay bounded
    big = [a for a in acts if a.size >= 4096]
    for a in big:
        s = float(np.std(a.astype(np.float32)))
        assert 1e-3 < s < 64.0, (a.shape, s)
