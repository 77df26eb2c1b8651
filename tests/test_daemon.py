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


class _StubArtifact:
    """Minimal artifact double for Batcher unit tests (no device)."""

    meta = dict(in_shapes=[[2, 4]], in_dtypes=["float32"], kind="stub")

    def __init__(self):
        self.calls = 0

    def __call__(self, x):
        self.calls += 1
        return (np.asarray(x) * 2.0,)


def test_batcher_timeout_abandons_item():
    """A timed-out request is skipped by the runner (no dead device work)
    and counted in the timeout stats, not in errors/latencies."""
    from panodepth.daemon import Batcher

    art = _StubArtifact()
    b = Batcher(art, max_delay_ms=1.0)  # not started yet
    with pytest.raises(TimeoutError):
        b.submit([np.zeros((4,), np.float32)], timeout=0.05)
    assert b.stats["timeouts"] == 1 and b.stats["errors"] == 0
    b.start()
    out, = b.submit([np.ones((4,), np.float32)], timeout=30)
    np.testing.assert_array_equal(out, np.full((4,), 2.0, np.float32))
    # only the live item was computed; the abandoned one was dropped
    assert b.stats["items"] == 1
    b.stop()


def test_batcher_backpressure_rejects():
    """Beyond the queue bound, submits shed load with Overloaded (503)
    instead of buffering unboundedly."""
    from panodepth.daemon import Batcher, Overloaded

    art = _StubArtifact()
    b = Batcher(art, max_queue=2)  # runner never started: queue only fills
    errs = []

    def blocked():
        try:
            b.submit([np.zeros((4,), np.float32)], timeout=1.0)
        except TimeoutError:
            pass
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=blocked) for _ in range(2)]
    for t in ts:
        t.start()
    import time as _time

    deadline = _time.monotonic() + 5
    while b._q.qsize() < 2 and _time.monotonic() < deadline:
        _time.sleep(0.01)
    with pytest.raises(Overloaded):
        b.submit([np.zeros((4,), np.float32)], timeout=1.0)
    assert b.stats["rejected"] == 1
    for t in ts:
        t.join()
    assert not errs
    assert b.stats["bad_requests"] == 0
    with pytest.raises(ValueError):
        b.submit([np.zeros((3,), np.float32)])
    assert b.stats["bad_requests"] == 1


def test_body_size_cap_413(daemon_art, monkeypatch):
    import panodepth.daemon as pdaemon

    d, _, _ = daemon_art
    monkeypatch.setattr(pdaemon, "MAX_BODY_BYTES", 1024)
    req = urllib.request.Request(_url(d, "/infer"), data=b"x" * 2048)
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 413


@pytest.fixture(scope="module")
def e2e_daemon(tmp_path_factory):
    """Daemon over a tiny e2e artifact (uint8 RGB in, u16 pano out)."""
    import jax

    from panodepth.models import train as ptrain
    from panodepth.models.panoramic import PanoBaselineNet
    from panodepth.models.perspective import PerspectiveDepthNet

    tmp = tmp_path_factory.mktemp("e2eart")
    s = 0.125
    persp = PerspectiveDepthNet(
        widths=tuple(max(8, int(w * s)) for w in (64, 128, 256, 512)),
        decoder_width=max(16, int(128 * s)))
    pparams = persp.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ptrain.save_params_npz(str(tmp / "perspective_final.params.npz"),
                           pparams)
    with open(tmp / "perspective.config.json", "w") as fp:
        json.dump(dict(model="perspective", width_scale=s, view_size=32,
                       pano_width=128), fp)
    pano = PanoBaselineNet(
        widths=tuple(max(8, int(w * s)) for w in (32, 64, 128, 256)))
    bparams = pano.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 128, 3)))
    ptrain.save_params_npz(str(tmp / "panoramic_final.params.npz"), bparams)
    with open(tmp / "panoramic.config.json", "w") as fp:
        json.dump(dict(model="panoramic", width_scale=s, view_size=32,
                       pano_width=128), fp)

    cfg = MergeConfig(out_width=128, layout_name="3fold")
    path = str(tmp / "e2e.xla")
    serve.export_e2e(path, cfg, batch=2,
                     persp_ckpt=str(tmp / "perspective_final.params.npz"),
                     baseline_ckpt=str(tmp / "panoramic_final.params.npz"),
                     rgb_shape=(64, 128), view_width=32)
    art = serve.load(path)
    d = Daemon(art, port=0, max_delay_ms=10.0)
    t = threading.Thread(target=d.serve_forever, daemon=True)
    t.start()
    yield d
    d.stop()


def test_infer_image_happy_path(e2e_daemon):
    """JPEG in -> 16-bit PNG depth panorama out, through the real HTTP
    stack and the I;16 PIL encode."""
    from PIL import Image

    d = e2e_daemon
    rng = np.random.RandomState(3)
    rgb = (rng.rand(64, 128, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=95)
    req = urllib.request.Request(
        _url(d, "/infer"), data=buf.getvalue(),
        headers={"Content-Type": "image/jpeg"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "image/png"
        png = r.read()
    depth = np.asarray(Image.open(io.BytesIO(png)))
    assert depth.dtype == np.uint16 or depth.dtype == np.int32
    assert depth.shape == (64, 128)
    # wrong-size image still 400s with the artifact's expectation
    small = io.BytesIO()
    Image.fromarray(rgb[:32]).save(small, "JPEG")
    req = urllib.request.Request(
        _url(d, "/infer"), data=small.getvalue(),
        headers={"Content-Type": "image/jpeg"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
