"""AOT export/serve roundtrip: serialized graphs match the live ones."""

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
