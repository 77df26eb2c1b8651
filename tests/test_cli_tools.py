"""Smoke tests for the standalone CLI tools: analyze + train_cli.

These are the last two user-facing entry points without direct tests —
the analysis CLI (the reference's commented-out ``cmd == "1"`` path,
Main.cpp:896-897) and the training CLI.  Both are driven in-process via
their ``main(argv)`` functions on tiny shapes.
"""

import json
import os

import numpy as np
import pytest

from panodepth import io as pio


@pytest.fixture
def depth_pair(tmp_path):
    rng = np.random.RandomState(7)
    y, x = np.mgrid[0:64, 0:128]
    gt = (0.2 + 0.1 * np.sin(x / 17.0) * np.cos(y / 9.0)).astype(np.float32)
    pred = np.clip(gt * 1.07 + 0.01 * rng.rand(64, 128), 0, 1).astype(
        np.float32)
    gt_f = str(tmp_path / "gt.png")
    pred_f = str(tmp_path / "pred.png")
    pio.save_png16(gt_f, (gt * 65535 + 0.5).astype(np.uint16))
    pio.save_png16(pred_f, (pred * 65535 + 0.5).astype(np.uint16))
    return gt_f, pred_f


def test_analyze_cli_json(depth_pair, capsys):
    from panodepth import analyze

    gt_f, pred_f = depth_pair
    rc = analyze.main([gt_f, pred_f, "--json", "--laplacian",
                       "--platform", "cpu"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    for key in ("rmse", "mae", "mre", "rmselog", "delta1"):
        assert key in rec, rec
    # median alignment absorbs the 1.07 scale; residual is the noise term
    assert 0 < rec["rmse"] < 0.02
    assert rec["delta1"] > 0.9
    assert any(k.startswith("laplacian") for k in rec), rec


def test_analyze_cli_self_comparison_is_exact(depth_pair, capsys):
    from panodepth import analyze

    gt_f, _ = depth_pair
    rc = analyze.main([gt_f, gt_f, "--json", "--align", "0",
                       "--platform", "cpu"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rmse"] == 0.0
    assert rec["delta1"] == 1.0


def test_train_cli_synth_smoke(tmp_path):
    """Three tiny synthetic steps end-to-end: loss finite, checkpoint +
    sidecar written, params-only npz loadable by the e2e loader."""
    from panodepth import train_cli
    from panodepth.e2e import load_model_checkpoint

    ckpt_dir = str(tmp_path / "ckpts")
    # batch 8: the conftest pins an 8-device CPU mesh and the dp sharding
    # needs batch % devices == 0 (train_cli rejects mismatches up front)
    rc = train_cli.main([
        "panoramic", "x", "x", ckpt_dir, "--synth", "--steps", "3",
        "--batch-size", "8", "--pano-width", "64", "--width-scale", "0.25",
        "--ckpt-every", "1000", "--log-every", "1", "--platform", "cpu",
        "--ema", "0.9"])
    assert rc in (0, None)
    npz = os.path.join(ckpt_dir, "panoramic_final.params.npz")
    sidecar = os.path.join(ckpt_dir, "panoramic.config.json")
    assert os.path.exists(npz) and os.path.exists(sidecar)
    # --ema writes the smoothed weights alongside, same tree as params
    ema_npz = os.path.join(ckpt_dir, "panoramic_final.ema.params.npz")
    assert os.path.exists(ema_npz)
    arch = json.load(open(sidecar))
    assert arch["model"] == "panoramic" and arch["pano_width"] == 64

    model, params, loaded_arch = load_model_checkpoint(npz)
    assert loaded_arch["pano_width"] == 64
    import jax.numpy as jnp

    out = model.apply(params, jnp.zeros((1, 32, 64, 3)))
    assert out.shape == (1, 32, 64)
    assert bool(jnp.isfinite(out).all())

    # the EMA weights load through the same e2e path (identical tree)
    _, ema_p, _ = load_model_checkpoint(ema_npz)
    out_e = model.apply(ema_p, jnp.zeros((1, 32, 64, 3)))
    assert out_e.shape == (1, 32, 64)
    assert bool(jnp.isfinite(out_e).all())


def test_save_png16_level_env(tmp_path, monkeypatch):
    """PANODEPTH_PNG_LEVEL / level= control the (lossless) deflate level."""
    y, x = np.mgrid[0:64, 0:128]
    img = (1000 + 40 * np.sin(x / 9.0) + 8 * y).astype(np.uint16)
    f1 = str(tmp_path / "l1.png")
    f6 = str(tmp_path / "l6.png")
    pio.save_png16(f1, img, level=1)
    pio.save_png16(f6, img, level=6)
    assert os.path.getsize(f6) <= os.path.getsize(f1)
    a1 = (pio.load_image01(f1) * 65535 + 0.5).astype(np.uint16)
    a6 = (pio.load_image01(f6) * 65535 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(a1, img)
    np.testing.assert_array_equal(a6, img)

    monkeypatch.setenv("PANODEPTH_PNG_LEVEL", "6")
    fenv = str(tmp_path / "env.png")
    pio.save_png16(fenv, img)
    assert os.path.getsize(fenv) == os.path.getsize(f6)


def test_analyze_cli_mono360(tmp_path, capsys):
    """--mono360: disparity baseline through the ErrorCompare chain
    (disp->depth, least-squares align, 10 m cap, shifted 8-bit dump)."""
    from panodepth import analyze

    y, x = np.mgrid[0:64, 0:128]
    gt = (0.15 + 0.05 * np.sin(x / 11.0) + 0.001 * y).astype(np.float32)
    disp = 1.0 / np.maximum(gt, 1e-3)
    disp = disp / disp.max()  # mono360 disparities arrive normalized
    gt_f = str(tmp_path / "gt.png")
    disp_f = str(tmp_path / "disp.png")
    shift_f = str(tmp_path / "shifted.png")
    pio.save_png16(gt_f, (gt * 65535 + 0.5).astype(np.uint16))
    pio.save_png16(disp_f, (disp * 65535 + 0.5).astype(np.uint16))
    rc = analyze.main([gt_f, disp_f, "--mono360", "--json",
                       "--shifted-out", shift_f, "--platform", "cpu"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # a clean reciprocal relation survives the disp->depth chain well
    assert rec["rmse"] < 0.05 and rec["delta1"] > 0.8, rec
    assert os.path.exists(shift_f)


def test_train_cli_resume(tmp_path, capsys):
    """--resume restores the FULL train state (params + optimizer moments
    + step counter) from the newest checkpoint and continues at the saved
    step instead of restarting from 0."""
    from panodepth import train_cli

    ckpt_dir = str(tmp_path / "ck")
    common = ["panoramic", "x", "x", ckpt_dir, "--synth", "--batch-size",
              "8", "--pano-width", "64", "--width-scale", "0.25",
              "--log-every", "1", "--platform", "cpu"]
    rc = train_cli.main(common + ["--steps", "3", "--ckpt-every", "2"])
    assert rc in (0, None)
    capsys.readouterr()
    # intermediate (tag = step index at save time) + final both exist
    assert os.path.isdir(os.path.join(ckpt_dir, "panoramic_2"))
    assert os.path.isdir(os.path.join(ckpt_dir, "panoramic_final"))

    rc = train_cli.main(common + ["--steps", "5", "--ckpt-every", "1000",
                                  "--resume"])
    assert rc in (0, None)
    out = capsys.readouterr().out
    # restored at step 3 (the final ckpt of the 3-step run), ran 3..4 only
    assert "resumed" in out and "at step 3" in out, out
    assert "step 3 " in out and "step 4 " in out
    assert "step 0 " not in out and "step 2 " not in out

    # --resume with no checkpoints starts fresh from step 0
    fresh_dir = str(tmp_path / "fresh")
    rc = train_cli.main(
        ["panoramic", "x", "x", fresh_dir, "--synth", "--steps", "1",
         "--batch-size", "8", "--pano-width", "64", "--width-scale",
         "0.25", "--log-every", "1", "--platform", "cpu", "--resume"])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "starting fresh" in out and "step 0 " in out


def test_train_cli_preemption_grace(tmp_path):
    """SIGTERM mid-training checkpoints the in-flight state and exits 0;
    --resume then continues from the preemption point."""
    import re
    import signal
    import subprocess
    import sys
    import time as _time

    ck = str(tmp_path / "ck")
    logf = str(tmp_path / "out.log")
    argv = [sys.executable, "-m", "panodepth.train_cli", "panoramic", "x",
            "x", ck, "--synth", "--steps", "500", "--batch-size", "8",
            "--pano-width", "64", "--width-scale", "0.25", "--log-every",
            "1", "--ckpt-every", "100000", "--platform", "cpu"]
    with open(logf, "w") as fp:
        p = subprocess.Popen(argv, stdout=fp, stderr=subprocess.STDOUT,
                             text=True, cwd=os.path.dirname(
                                 os.path.dirname(os.path.abspath(__file__))))
    try:
        deadline = _time.monotonic() + 420
        while _time.monotonic() < deadline:
            if "step 2 " in open(logf).read():
                break
            if p.poll() is not None:
                raise AssertionError(
                    f"train exited early:\n{open(logf).read()[-3000:]}")
            _time.sleep(1)
        else:
            raise AssertionError(
                f"never reached step 2:\n{open(logf).read()[-3000:]}")
        p.send_signal(signal.SIGTERM)
        rc = p.wait(timeout=180)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()
    out = open(logf).read()
    assert rc == 0, out[-3000:]
    m = re.search(r"SIGTERM: checkpointed at step (\d+)", out)
    assert m, out[-3000:]
    saved = int(m.group(1))

    from panodepth import train_cli

    rc = train_cli.main(["panoramic", "x", "x", ck, "--synth", "--steps",
                         str(saved + 2), "--batch-size", "8",
                         "--pano-width", "64", "--width-scale", "0.25",
                         "--log-every", "1", "--platform", "cpu",
                         "--resume"])
    assert rc in (0, None)
    assert os.path.exists(os.path.join(ck, "panoramic_final.params.npz"))


def test_train_cli_eval_and_metrics_out(tmp_path):
    """--eval-every scores a fixed held-out set (raw + EMA weights) and
    --metrics-out appends structured JSON lines."""
    from panodepth import train_cli

    ckpt_dir = str(tmp_path / "ck")
    mfile = str(tmp_path / "metrics.jsonl")
    rc = train_cli.main([
        "panoramic", "x", "x", ckpt_dir, "--synth", "--steps", "4",
        "--batch-size", "8", "--pano-width", "64", "--width-scale", "0.25",
        "--ckpt-every", "1000", "--log-every", "1", "--platform", "cpu",
        "--ema", "0.9", "--eval-every", "2", "--eval-batches", "1",
        "--metrics-out", mfile])
    assert rc in (0, None)
    recs = [json.loads(l) for l in open(mfile)]
    losses = [r for r in recs if "loss" in r]
    vals = [r for r in recs if "val_loss" in r]
    assert len(losses) == 4 and len(vals) == 2
    assert vals[0]["step"] == 1 and vals[1]["step"] == 3
    for v in vals:
        assert np.isfinite(v["val_loss"]) and np.isfinite(v["val_loss_ema"])
    # 0.9-decay EMA after <=4 steps stays near init: it must differ from
    # the raw weights' score
    assert vals[-1]["val_loss"] != vals[-1]["val_loss_ema"]


def test_train_cli_file_mode_eval_holdout(tmp_path, capsys):
    """File datasets with --eval-every: every 10th pair is REMOVED from
    the training set and scored as the holdout (no leakage), with
    --augment active on the training stream only."""
    from conftest import make_equirect
    from panodepth import train_cli

    rgb_dir, gt_dir = str(tmp_path / "rgb"), str(tmp_path / "gt")
    os.makedirs(rgb_dir), os.makedirs(gt_dir)
    rng = np.random.RandomState(0)
    for i in range(16):
        rgb = np.stack([np.clip(make_equirect(64, 32)
                                + 0.05 * rng.rand(32, 64), 0, 1)] * 3, -1)
        pio.save_jpg(os.path.join(rgb_dir, f"p{i:02d}.jpg"), rgb)
        pio.save_png16(os.path.join(gt_dir, f"p{i:02d}.png"),
                       pio.to_uint16(make_equirect(64, 32)))

    mfile = str(tmp_path / "m.jsonl")
    rc = train_cli.main([
        "panoramic", rgb_dir, gt_dir, str(tmp_path / "ck"), "--steps", "2",
        "--batch-size", "8", "--pano-width", "64", "--width-scale", "0.25",
        "--log-every", "1", "--platform", "cpu", "--eval-every", "1",
        "--eval-batches", "1", "--augment", "--metrics-out", mfile])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "holding out 2 pairs" in out, out
    assert "14 pairs/host" in out, out
    vals = [json.loads(l) for l in open(mfile) if "val_loss" in l]
    assert len(vals) == 2 and all(np.isfinite(v["val_loss"]) for v in vals)
    # the split is recorded in the sidecar
    arch = json.load(open(os.path.join(str(tmp_path / "ck"),
                                       "panoramic.config.json")))
    assert arch["eval_holdout"] is True

    # STICKY split: a --resume WITHOUT --eval-every must keep the holdout
    # pairs out of training (else later evals are contaminated)
    rc = train_cli.main([
        "panoramic", rgb_dir, gt_dir, str(tmp_path / "ck"), "--steps", "3",
        "--batch-size", "8", "--pano-width", "64", "--width-scale", "0.25",
        "--log-every", "1", "--platform", "cpu", "--resume"])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "maintaining the validation holdout" in out, out
    assert "14 pairs/host" in out, out


def test_train_cli_trace(tmp_path):
    """--trace writes an xprof trace of the steady-state steps."""
    from panodepth import train_cli

    tdir = str(tmp_path / "trace")
    rc = train_cli.main([
        "panoramic", "x", "x", str(tmp_path / "ck"), "--synth", "--steps",
        "6", "--batch-size", "8", "--pano-width", "64", "--width-scale",
        "0.25", "--log-every", "5", "--platform", "cpu", "--trace", tdir])
    assert rc in (0, None)
    files = [os.path.join(r, f) for r, _, fs in os.walk(tdir) for f in fs]
    assert files, "no trace files written"


def test_latest_checkpoint_prefers_newest_save(tmp_path):
    """--resume must pick the NEWEST save: ranking 'final' above numbered
    tags would roll a preempted run-extension back to a stale final."""
    from panodepth.train_cli import _latest_checkpoint

    base = str(tmp_path / "m")
    for tag, t in [("final", 1000), ("50", 2000), ("2", 1500)]:
        os.makedirs(f"{base}_{tag}")
        os.utime(f"{base}_{tag}", (t, t))
    assert _latest_checkpoint(base).endswith("_50")
    # mtime tie: final wins (within one run it is written last)
    os.utime(f"{base}_final", (2000, 2000))
    assert _latest_checkpoint(base).endswith("_final")
    assert _latest_checkpoint(str(tmp_path / "none")) is None
    # non-checkpoint dirs and files are ignored
    os.makedirs(f"{base}_backup")
    open(f"{base}_7", "w").close()
    assert _latest_checkpoint(base).endswith("_final")


def test_main_cli_help_renders():
    """argparse interpolates '%' in help strings at render time — a bare
    '%' crashes `--help` with ValueError (regression: the --infer-norm
    text's '+24% CNN').  Render the full help for every parser surface."""
    from panodepth.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
