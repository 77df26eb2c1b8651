"""Multi-host support: REAL 2-process jax.distributed runs on CPU.

Each test spawns two Python processes (2 virtual CPU devices each -> a
4-device global mesh over DCN-like channels) — the honest multi-host
test the single-process virtual mesh cannot provide.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panodepth.models import train as ptrain
from panodepth.models.perspective import PerspectiveDepthNet
from panodepth.parallel.multihost import process_shard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(argv):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # children pick their own device count; don't inherit the 8-dev flag
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen([sys.executable] + argv, env=env, cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _run_pair(argv_of, timeout=900):
    procs = [_spawn(argv_of(0)), _spawn(argv_of(1))]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        # a timeout/assert must not leak children: stragglers contend for
        # the CPU and starve every later test in the session
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs


def test_process_shard_roundrobin():
    items = list(range(10))
    a = process_shard(items, 0, 3)
    b = process_shard(items, 1, 3)
    c = process_shard(items, 2, 3)
    assert a == [0, 3, 6, 9] and b == [1, 4, 7] and c == [2, 5, 8]
    assert sorted(a + b + c) == items
    with pytest.raises(ValueError):
        process_shard(items, 3, 3)


def test_two_process_training_matches_single(tmp_path):
    """2-process global-mesh steps == single-device steps on the same
    global batch; params bit-identical across processes."""
    port = _free_port()
    worker = os.path.join(REPO, "tests", "mh_worker.py")
    _run_pair(lambda pid: [worker, str(port), str(pid), "2",
                           str(tmp_path)])

    z0 = np.load(tmp_path / "proc0.npz")
    z1 = np.load(tmp_path / "proc1.npz")
    assert int(z0["n_global"]) == 4
    # both processes hold the identical replicated result
    np.testing.assert_array_equal(z0["losses"], z1["losses"])
    keys = [k for k in z0.files if k.startswith("arr_")]
    assert keys
    for k in keys:
        np.testing.assert_array_equal(z0[k], z1[k])

    # single-process oracle on the full 4-item batch (one device, no mesh)
    model = PerspectiveDepthNet(stage_sizes=(1, 1, 1, 1),
                                widths=(8, 16, 16, 32), decoder_width=16)
    tx = ptrain.make_optimizer(lr=1e-3)
    state = ptrain.init_state(model, jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)), tx)
    step = jax.jit(ptrain.make_train_step(model, tx))
    losses = []
    for s in range(2):
        rng = np.random.RandomState(1000 + s)
        batch = (jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32)),
                 jnp.asarray(rng.rand(4, 32, 32).astype(np.float32)),
                 jnp.ones((4, 32, 32), bool))
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(z0["losses"], losses, rtol=1e-5)
    flat = jax.tree_util.tree_leaves(state.params)
    assert len(flat) == len(keys)
    # AdamW normalizes by sqrt(second moment): reduction-order noise in
    # the distributed grad psum is amplified ~1/|g| on near-zero params,
    # so the oracle match is loose here; the strict checks are the losses
    # (1e-5) and cross-process bit-equality above
    for k, ref in zip(sorted(keys, key=lambda s: int(s[4:])), flat):
        np.testing.assert_allclose(z0[k], np.asarray(ref),
                                   rtol=1e-2, atol=1e-4)


def test_train_cli_multihost_smoke(tmp_path):
    """The real CLI across 2 processes: trains, only proc0 checkpoints,
    and the checkpoint loads back through the e2e loader."""
    port = _free_port()
    ck = tmp_path / "ck"

    def argv(pid):
        return ["-m", "panodepth.train_cli", "perspective", "x", "y",
                str(ck), "--synth", "--steps", "2", "--batch-size", "4",
                "--view-size", "64", "--width-scale", "0.125",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--platform", "cpu", "--log-every", "1"]

    outs = _run_pair(argv)
    assert "[train] done" in outs[0]
    assert "[train] done" not in outs[1]  # proc1 stays quiet
    assert (ck / "perspective_final.params.npz").exists()
    assert (ck / "perspective.config.json").exists()

    from panodepth.e2e import load_model_checkpoint

    model, params, arch = load_model_checkpoint(
        str(ck / "perspective_final.params.npz"))
    out = model.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64)


def test_preemption_drain_two_process(tmp_path):
    """SIGTERM delivered to ONE process of a 2-process run: the stop step
    is agreed through the coordination KV store, BOTH processes drain to
    it, checkpoint collectively, and exit 0 (a unilateral break would
    wedge the peer inside the next collective step)."""
    import re
    import signal
    import time as _time

    port = _free_port()
    ck = tmp_path / "ck"

    def argv(pid):
        return ["-m", "panodepth.train_cli", "perspective", "x", "y",
                str(ck), "--synth", "--steps", "500", "--batch-size", "4",
                "--view-size", "64", "--width-scale", "0.125",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--platform", "cpu", "--log-every", "1",
                "--ckpt-every", "100000"]

    logs = [str(tmp_path / f"p{i}.log") for i in (0, 1)]
    fps = [open(f, "w") for f in logs]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable] + argv(i), env=env,
                              cwd=REPO, stdout=fp,
                              stderr=subprocess.STDOUT, text=True)
             for i, fp in enumerate(fps)]
    try:
        deadline = _time.monotonic() + 900
        while _time.monotonic() < deadline:
            if "step 2 " in open(logs[0]).read():
                break
            for p in procs:
                assert p.poll() is None, (
                    f"worker died early:\n{open(logs[p is procs[1]]).read()[-3000:]}")
            _time.sleep(2)
        else:
            raise AssertionError(
                f"never reached step 2:\n{open(logs[0]).read()[-3000:]}")
        procs[0].send_signal(signal.SIGTERM)  # ONE process only
        rcs = [p.wait(timeout=300) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        for fp in fps:
            fp.close()
    out0, out1 = (open(f).read() for f in logs)
    assert rcs == [0, 0], (out0[-2000:], out1[-2000:])
    m = re.search(r"draining to collectively agreed step (\d+)", out0)
    assert m, out0[-3000:]
    stop_at = int(m.group(1))
    assert "collective checkpoint at step" in out0, out0[-2000:]
    # the collective full-state save landed and is resumable
    assert os.path.isdir(ck / f"perspective_{stop_at}")
