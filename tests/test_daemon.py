"""Serving daemon: HTTP surface, micro-batching, error paths.

The daemon wraps an AOT merge artifact (tiny shapes, jnp Jacobi) and is
driven over real HTTP on a loopback socket — concurrent clients, npz
roundtrips, and the stats/health endpoints.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import jax.numpy as jnp

import pytest

from panodepth import serve
from panodepth.config import MergeConfig
from panodepth.daemon import Daemon


@pytest.fixture(scope="module")
def daemon_art(tmp_path_factory):
    cfg = MergeConfig(out_width=256, layout_name="3fold")
    path = str(tmp_path_factory.mktemp("art") / "merge.xla")
    serve.export_merge(path, cfg, batch=4, emap_shape=(64, 128),
                       pmap_shape=(96, 128), dtype="uint16",
                       jacobi_kind="jnp")
    art = serve.load(path)
    d = Daemon(art, port=0, max_delay_ms=30.0)
    t = threading.Thread(target=d.serve_forever, daemon=True)
    t.start()
    yield d, art, cfg
    d.stop()


def _url(d, path):
    host, port = d.address
    return f"http://{host}:{port}{path}"


def _post_npz(d, arrays, timeout=120):
    buf = io.BytesIO()
    np.savez(buf, **{f"in{k}": a for k, a in enumerate(arrays)})
    req = urllib.request.Request(_url(d, "/infer"), data=buf.getvalue(),
                                 headers={"Content-Type": "application/npz"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"] == "application/npz"
        return dict(np.load(io.BytesIO(r.read())))


def test_health_and_describe(daemon_art):
    d, art, _ = daemon_art
    with urllib.request.urlopen(_url(d, "/healthz"), timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["kind"] == "merge" and h["batch"] == 4
    with urllib.request.urlopen(_url(d, "/describe"), timeout=30) as r:
        meta = json.loads(r.read())
    assert meta == art.meta


def test_concurrent_requests_match_direct_batch(daemon_art):
    """N concurrent single-item posts == one direct artifact call."""
    d, art, cfg = daemon_art
    rng = np.random.RandomState(1)
    v = cfg.layout.num_views
    n = 5  # more than one batch's worth arrives inside the delay window
    emaps = rng.randint(0, 65536, (n, 64, 128)).astype(np.uint16)
    pmaps = rng.randint(0, 65536, (n, v, 96, 128)).astype(np.uint16)

    results = [None] * n
    errs = []

    def worker(i):
        try:
            results[i] = _post_npz(d, [emaps[i], pmaps[i]])
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs

    # direct call at full batch for the oracle (pad with item 0)
    pad = 4 * ((n + 3) // 4) - n
    out_ref, abcd_ref = None, None
    outs, abcds = [], []
    for c in range(0, n + pad, 4):
        idx = [min(i, n - 1) for i in range(c, c + 4)]
        o, a = art(jnp.asarray(emaps[idx]), jnp.asarray(pmaps[idx]))
        outs.append(np.asarray(o))
        abcds.append(np.asarray(a))
    out_ref = np.concatenate(outs)[:n]
    abcd_ref = np.concatenate(abcds)[:n]

    for i in range(n):
        np.testing.assert_array_equal(results[i]["out0"], out_ref[i])
        np.testing.assert_allclose(results[i]["out1"], abcd_ref[i],
                                   rtol=0, atol=1e-6)


def test_stats_counts_and_fill(daemon_art):
    d, _, _ = daemon_art
    with urllib.request.urlopen(_url(d, "/stats"), timeout=30) as r:
        s = json.loads(r.read())
    # warmup + at least the 5 concurrent requests above
    assert s["requests"] >= 6
    assert s["batches"] >= 2
    assert 1.0 <= s["mean_batch_fill"] <= 4.0
    assert s["latency_ms_p50"] > 0


def test_bad_shape_is_400_not_crash(daemon_art):
    d, _, cfg = daemon_art
    v = cfg.layout.num_views
    bad = [np.zeros((32, 64), np.uint16),  # wrong emap shape
           np.zeros((v, 96, 128), np.uint16)]
    buf = io.BytesIO()
    np.savez(buf, **{f"in{k}": a for k, a in enumerate(bad)})
    req = urllib.request.Request(_url(d, "/infer"), data=buf.getvalue())
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    assert "expected shape" in json.loads(ei.value.read())["error"]
    # daemon still alive
    with urllib.request.urlopen(_url(d, "/healthz"), timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_wrong_dtype_and_missing_array_400(daemon_art):
    d, _, cfg = daemon_art
    v = cfg.layout.num_views
    # f32 where u16 expected
    bad = [np.zeros((64, 128), np.float32),
           np.zeros((v, 96, 128), np.uint16)]
    buf = io.BytesIO()
    np.savez(buf, **{f"in{k}": a for k, a in enumerate(bad)})
    req = urllib.request.Request(_url(d, "/infer"), data=buf.getvalue())
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # npz missing in1 entirely
    buf = io.BytesIO()
    np.savez(buf, in0=np.zeros((64, 128), np.uint16))
    req = urllib.request.Request(_url(d, "/infer"), data=buf.getvalue())
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_image_body_rejected_for_merge_artifact(daemon_art):
    """merge artifacts take 2 inputs; an image body must 400 with advice."""
    from PIL import Image

    d, _, _ = daemon_art
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 128, 3), np.uint8)).save(buf, "JPEG")
    req = urllib.request.Request(
        _url(d, "/infer"), data=buf.getvalue(),
        headers={"Content-Type": "image/jpeg"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    assert "npz" in json.loads(ei.value.read())["error"]


def test_unknown_route_404(daemon_art):
    d, _, _ = daemon_art
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(d, "/nope"), timeout=30)
    assert ei.value.code == 404
