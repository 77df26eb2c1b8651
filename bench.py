"""Benchmark: fused 2048x1024 panorama depth throughput on the local chip.

Prints one JSON line per metric, the PRIMARY first:
  {"metric", "value", "unit", "vs_baseline"}

1. (primary) file-path merge throughput at 2048x1024: 15-view cubic
   registration + 3-level multiresolution Laplacian fusion (200/100/50
   Jacobi iterations) to a u16 panorama, with realistic 1024x988
   perspective maps — the graph the reference times as time_Reg +
   time_Laplacian (reference Main.cpp:667-681).
2. the same at 4096x2048 (4-level pyramid).
3. the fully on-device e2e model mode (RGB -> PanoBaselineNet +
   PerspectiveDepthNet -> registration -> fusion), if the committed model
   zoo (zoo/) is present.

Each metric is the MEDIAN of TRIALS pipelined measurements (each trial
enqueues REPS batches and fences once — per-batch host syncs would measure
the ~30 ms tunnel roundtrip, which a production stream never pays);
``spread`` is (max-min)/median across trials.  ``vs_baseline`` is measured
throughput over the north-star target of 30 panoramas/sec @2048 on v5e-8
(BASELINE.json; the reference repo publishes no numbers of its own — see
BASELINE.md).

Every successful on-chip measurement is appended to ``BENCH_LEDGER.jsonl``
(committed); when the tunneled TPU is wedged at capture time, the newest
ledger entry for the primary metric is replayed as the final line with
``stale_s`` + provenance instead of a bare error.  The primary metric is
also re-stated as the LAST stdout line of a fully successful run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

# batch sweeps on the v5e (r2): 2048 fused — b8 223/s, b16 257/s, b32
# 207/s (HBM pressure, 156% spread); 4096 fused — b1 11.9, b4 43, b8 58.8,
# b16 66.3, b32 49.5/s; e2e models — b4 25.4, b8 29.1, b16 25.8/s with f32
# extraction + jnp Jacobi; with the defaults (packed-u32 extraction
# gathers + Pallas fused-iteration Jacobi + round-up CNN shapes) — b16
# 54.1/s (58.5 with round-down 224x256 CNN shapes; bf16 gathers:
# b8 50.4, b16 53.5, b32 45.0/s).
# Re-swept after the normal-equations registration solve (r2 tail): the
# sweet spot moved 16 -> 24 and is SHARP — 2048 fused b12 217, b16 261,
# b20 235, b24 275.4, b28 182 (tiling alignment, not a smooth curve);
# 4096 fused b16 66.8, b24 68.3; e2e b16 64.7, b24 68.2, b32 68.0
# (plateau).  b32 fused still regresses (HBM pressure).
BATCH = int(os.environ.get("BENCH_BATCH", "24"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "5"))
NORTH_STAR = 30.0  # panoramas/sec @2048 on v5e-8 (BASELINE.json)
ZOO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "zoo")

# --- on-chip result ledger -------------------------------------------------
# Every successful TPU measurement is appended (timestamped) to a committed
# jsonl ledger.  When the tunnel is wedged at capture time (three rounds of
# driver benches were lost to exactly that), the newest ledger entry for the
# primary metric is REPLAYED as the final JSON line with explicit staleness
# provenance instead of emitting a bare error — a stale-but-honest number
# beats no number (VERDICT r3 next-step #1).
LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BENCH_LEDGER.jsonl")
PRIMARY_METRIC = "panoramas_per_sec_2048x1024_fused"
_primary_rec = None  # set by emit() when the primary metric lands


def _utcnow():
    import datetime

    return datetime.datetime.now(datetime.timezone.utc)


def ledger_append(rec) -> None:
    if jax.default_backend() != "tpu":
        return  # only real-chip numbers belong in the ledger
    try:
        with open(LEDGER, "a") as fp:
            fp.write(json.dumps(
                {"ts": _utcnow().strftime("%Y-%m-%dT%H:%M:%SZ"), **rec})
                + "\n")
    except OSError:
        pass


def ledger_latest(metric: str):
    """Newest ledger entry for ``metric`` (file is append-ordered)."""
    best = None
    try:
        with open(LEDGER) as fp:
            for line in fp:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("metric") == metric:
                    best = rec
    except OSError:
        return None
    return best


def emit_stale_replay(reason: str) -> bool:
    """Print the newest on-chip capture of the primary metric, labeled
    stale.  Returns False when the ledger has nothing to replay."""
    import datetime

    rec = ledger_latest(PRIMARY_METRIC)
    if rec is None:
        return False
    ts = rec.get("ts", "")
    try:
        then = datetime.datetime.strptime(
            ts, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=datetime.timezone.utc)
        stale_s = int((_utcnow() - then).total_seconds())
    except ValueError:
        stale_s = -1
    out = {k: v for k, v in rec.items() if k != "ts"}
    out["stale_s"] = stale_s
    out["note"] = (f"{reason}; replaying last on-chip capture @{ts}"
                   f" from BENCH_LEDGER.jsonl")
    print(json.dumps(out), flush=True)
    return True


def chip_lock():
    """Serialize chip work against the builder's watch-loop queue jobs.

    Concurrent processes on the one tunneled chip make each other look
    wedged (r3's driver bench preflight failed WHILE a queued fine-tune was
    training at 90 img/s — self-contention, not a dead tunnel).  Every chip
    job flocks /tmp/panodepth_chip.lock; bench waits a bounded time for it
    and then proceeds regardless (the preflight still protects us)."""
    import fcntl

    if os.environ.get("PANODEPTH_HAVE_CHIP_LOCK"):
        return None  # caller (queue runner) already holds the flock
    try:
        fp = open("/tmp/panodepth_chip.lock", "w")
    except OSError:
        return None
    deadline = time.time() + float(
        os.environ.get("BENCH_LOCK_WAIT_S", "600"))
    while True:
        try:
            fcntl.flock(fp, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return fp  # hold until process exit
        except OSError:
            if time.time() >= deadline:
                # proceed unlocked; better than forfeiting — but mark
                # every record of this run as possibly contended
                _RUN_FLAGS["lock_timeout"] = True
                print(json.dumps({
                    "metric": "bench_warning", "value": 0.0,
                    "unit": "warning", "vs_baseline": 0.0,
                    "warning": "chip lock wait expired; running "
                               "contended (lock_timeout on all records)"}),
                    flush=True)
                return fp
            time.sleep(5.0)


def sync(out):
    # NOTE: on tunneled backends (axon) block_until_ready returns before
    # remote execution finishes; a host readback is the only true sync.
    # Device execution is in-order, so one readback of the LAST output
    # fences everything enqueued before it.
    return float(jnp.sum(out.astype(jnp.float32)))


def timed_trials(run_reps):
    """run_reps() enqueues REPS iterations and fences; returns per-item
    seconds.  Median +- spread across TRIALS."""
    vals = []
    for _ in range(TRIALS):
        vals.append(run_reps())
    med = float(np.median(vals))
    spread = (max(vals) - min(vals)) / med if med else 0.0
    return med, spread


# anomaly markers attached to every emitted record: "lock_timeout" when
# the bounded chip-lock wait expired and the run proceeded contended
# (ADVICE r4 — contended numbers must be attributable)
_RUN_FLAGS: dict = {}


def emit(metric, panos_per_sec, spread, extra=None):
    global _primary_rec
    rec = {
        "metric": metric,
        "value": round(panos_per_sec, 3),
        "unit": "panoramas/sec",
        "vs_baseline": round(panos_per_sec / NORTH_STAR, 3),
        "spread": round(spread, 4),
    }
    rec.update(_RUN_FLAGS)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    ledger_append(rec)
    if metric == PRIMARY_METRIC:
        _primary_rec = rec


def bench_merge(out_width: int, batch: int) -> None:
    from panodepth.config import MergeConfig
    from panodepth.pipeline import merge_arrays

    cfg = MergeConfig(out_width=out_width)
    rng = np.random.RandomState(0)
    v = cfg.layout.num_views
    emaps = jnp.asarray(
        rng.uniform(0.05, 0.9, (batch, 512, 1024)).astype(np.float32))
    pmaps = jnp.asarray(
        rng.uniform(0.05, 0.9, (batch, v, 988, 1024)).astype(np.float32))

    jacobi_fn = None
    if jax.default_backend() == "tpu":
        from panodepth.kernels.jacobi import pallas_jacobi

        jacobi_fn = pallas_jacobi
    fn = jax.jit(jax.vmap(lambda e, p: merge_arrays(e, p, cfg, jacobi_fn)))
    sync(fn(emaps, pmaps)[0])  # compile + warm up

    def run():
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out, _ = fn(emaps, pmaps)
        sync(out)
        return (time.perf_counter() - t0) / (REPS * batch)

    per_item, spread = timed_trials(run)
    emit(f"panoramas_per_sec_{out_width}x{out_width // 2}_fused",
         1.0 / per_item, spread, {"batch": batch})


def _e2e_base_ckpt() -> str:
    """The shipping e2e baseline family: the TPU-fast FastPanoNet when its
    promoted weights are present (r5), else the UniFuse-class net."""
    fp = os.path.join(ZOO, "fastpano_final.params.npz")
    return fp if os.path.exists(fp) else os.path.join(
        ZOO, "panoramic_final.params.npz")


def bench_e2e() -> None:
    """On-device model mode: RGB -> models -> registration -> fusion."""
    persp = os.path.join(ZOO, "perspective_final.params.npz")
    base = _e2e_base_ckpt()
    if not (os.path.exists(persp) and os.path.exists(base)):
        return
    from panodepth.config import MergeConfig
    from panodepth.e2e import build_batched_e2e, load_model_checkpoint

    cfg = MergeConfig(out_width=2048)
    # bf16 GroupNorms on TPU, as the production CLI defaults (--infer-norm
    # auto): +24% perspective-CNN throughput, no measured accuracy change
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    persp_model, persp_params, persp_arch = load_model_checkpoint(
        persp, norm_dtype=nd)
    base_model, base_params, base_arch = load_model_checkpoint(
        base, norm_dtype=nd)
    bw = base_arch.get("pano_width", 512)
    # match the CLI's default: perspective CNN at its training resolution
    vw = persp_arch.get("view_size", 512)

    rng = np.random.RandomState(1)
    e2e_reps = max(2, REPS // 2)
    for batch in (1, int(os.environ.get("BENCH_E2E_BATCH", "24"))):
        fn, _, _ = build_batched_e2e(
            persp_model, persp_params, cfg, view_width=vw,
            base_model=base_model, base_params=base_params, base_w=bw)
        # uint8 input, as the production CLI streams it on TPU (--stream
        # auto): extract_dtype="auto" then picks the packed-u32 gather
        # table, which is only exact (and only auto-enabled) for 8-bit
        # sources
        rgbs = jnp.asarray(rng.randint(
            0, 256, (batch, 1024, 2048, 3)).astype(np.uint8))
        sync(fn(rgbs)[0])

        def run():
            t0 = time.perf_counter()
            out = None
            for _ in range(e2e_reps):
                out, _ = fn(rgbs)
            sync(out)
            return (time.perf_counter() - t0) / (e2e_reps * batch)

        per_item, spread = timed_trials(run)
        name = "panoramas_per_sec_2048x1024_e2e_models"
        emit(name if batch == 1 else name + "_batched", 1.0 / per_item,
             spread, {"batch": batch})

        if batch == 1:
            # single-request latency: one panorama in, fence, repeat —
            # each request pays the host->device transfer, the graph, and
            # the tunnel roundtrip (what a batch-1 serving client sees)
            lat_fn = fn
            lat_rgb = rgbs

            def run_lat():
                vals = []
                for _ in range(e2e_reps):
                    t0 = time.perf_counter()
                    out, _ = lat_fn(lat_rgb)
                    sync(out)
                    vals.append(time.perf_counter() - t0)
                return float(np.median(vals))

            lat_s, lat_spread = timed_trials(run_lat)
            lat_rec = {
                "metric": "latency_ms_2048x1024_e2e_single",
                "value": round(lat_s * 1e3, 2), "unit": "ms/panorama",
                # north star as latency: 1 pano / 30 per-sec = 33.3 ms;
                # >1.0 means faster than the target
                "vs_baseline": round((1000.0 / 30.0) / (lat_s * 1e3), 3),
                "spread": round(lat_spread, 4), "batch": 1}
            print(json.dumps(lat_rec), flush=True)
            ledger_append(lat_rec)


def bench_e2e_4096() -> None:
    """On-device model mode at 4096x2048 output (4-level pyramid)."""
    persp = os.path.join(ZOO, "perspective_final.params.npz")
    base = _e2e_base_ckpt()
    if not (os.path.exists(persp) and os.path.exists(base)):
        return
    from panodepth.config import MergeConfig
    from panodepth.e2e import build_batched_e2e, load_model_checkpoint

    cfg = MergeConfig(out_width=4096)
    nd = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    persp_model, persp_params, persp_arch = load_model_checkpoint(
        persp, norm_dtype=nd)
    base_model, base_params, base_arch = load_model_checkpoint(
        base, norm_dtype=nd)
    batch = int(os.environ.get("BENCH_E2E_4096_BATCH", "8"))
    fn, _, _ = build_batched_e2e(
        persp_model, persp_params, cfg,
        view_width=persp_arch.get("view_size", 512),
        base_model=base_model, base_params=base_params,
        base_w=base_arch.get("pano_width", 512))
    rng = np.random.RandomState(2)
    rgbs = jnp.asarray(rng.randint(
        0, 256, (batch, 2048, 4096, 3)).astype(np.uint8))
    sync(fn(rgbs)[0])
    e2e_reps = max(2, REPS // 2)

    def run():
        t0 = time.perf_counter()
        out = None
        for _ in range(e2e_reps):
            out, _ = fn(rgbs)
        sync(out)
        return (time.perf_counter() - t0) / (e2e_reps * batch)

    per_item, spread = timed_trials(run)
    emit("panoramas_per_sec_4096x2048_e2e_models_batched", 1.0 / per_item,
         spread, {"batch": batch})


def preflight_retry() -> bool:
    """Wait (bounded) for a healthy TPU tunnel before benching.

    The tunneled backend can wedge for minutes-to-hours and then heal
    (the r2 record was lost to exactly this: one preflight attempt, fail
    fast, emit error — during a flap that healed 40 minutes later).  A
    wedged in-process RPC blocks the calling thread forever, so retrying
    requires *subprocess* probes: each attempt is a fresh client under a
    hard timeout, killed and retried until the budget runs out.  Probe
    shapes vary per attempt AND per pid — a probe killed mid-compile can
    wedge its own remote cache entry, so a fixed shape could keep a
    healed tunnel looking dead forever (CLAUDE.md env gotchas).

    Returns True when a probe round-trips; False when the budget (default
    22 min, inside the driver watchdog) is exhausted.
    """
    if jax.default_backend() != "tpu":
        return True  # CPU runs can't flap
    budget = float(os.environ.get("BENCH_PREFLIGHT_BUDGET_S", "1320"))
    per_try = float(os.environ.get("BENCH_PREFLIGHT_S", "150"))
    deadline = time.time() + budget
    attempt = 0
    while True:
        attempt += 1
        n = 100 + (os.getpid() * 7 + attempt * 13) % 83
        code = (
            "import os\n"
            "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',"
            " os.path.expanduser('~/.jax_cache'))\n"
            "import jax, jax.numpy as jnp\n"
            f"x = jnp.ones(({n}, {n})) @ jnp.ones(({n}, {n}))\n"
            "print(float(jnp.sum(x)))\n")
        try:
            subprocess.run([sys.executable, "-c", code], timeout=per_try,
                           check=True, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            pass
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        print(json.dumps({
            "metric": "bench_preflight_retry", "value": attempt,
            "unit": "attempts", "vs_baseline": 0.0,
            "note": f"tunnel probe failed; {int(remaining)}s budget left"}),
            file=sys.stderr, flush=True)
        time.sleep(min(45.0, max(0.0, remaining)))


def main() -> None:
    # Watchdog: the tunneled TPU backend can wedge hard (device transfers
    # and compiles block forever after a client is killed mid-RPC).  A
    # bench that hangs is worse than one that fails — emit an explicit
    # error line instead.  A watchdog *thread* (not SIGALRM): when the
    # main thread is blocked inside a native RPC the interpreter never
    # regains control to run a Python signal handler, but a daemon timer
    # thread still fires and os._exit bypasses the stuck call entirely.
    import threading

    def _abort():
        # A wedge mid-run: stages that already completed THIS run are in
        # the ledger; replay the freshest primary capture rather than
        # discarding the record (exit 0 — the line is labeled stale).
        if _primary_rec is not None:
            # the primary landed but later sections did not: a driver
            # parsing the final line must see the truncation (ADVICE r4)
            print(json.dumps({
                **_primary_rec, "partial": True,
                "note": "watchdog abort mid-run; sections after this "
                        "record did not complete"}), flush=True)
            os._exit(0)
        if emit_stale_replay("tunnel wedged mid-run (watchdog)"):
            os._exit(0)
        print(json.dumps({
            "metric": "bench_error", "value": 0.0, "unit": "error",
            "vs_baseline": 0.0,
            "error": "timed out (wedged TPU tunnel?); ledger empty"}),
            flush=True)
        os._exit(2)

    _lock = chip_lock()  # released at process exit

    if not preflight_retry():
        if emit_stale_replay("tunnel unreachable (preflight exhausted)"):
            sys.exit(0)
        print(json.dumps({
            "metric": "bench_error", "value": 0.0, "unit": "error",
            "vs_baseline": 0.0,
            "error": "TPU tunnel unreachable after preflight retry budget;"
                     " ledger empty"}),
            flush=True)
        sys.exit(2)

    # backstop for the in-process warm-up: the tunnel can wedge *between*
    # the subprocess probe and our own first device op
    preflight = threading.Timer(
        float(os.environ.get("BENCH_INPROC_PREFLIGHT_S", "420")), _abort)
    preflight.daemon = True
    preflight.start()
    n = 120 + os.getpid() % 17
    sync(jnp.ones((n, n)) @ jnp.ones((n, n)))
    preflight.cancel()

    watchdog = threading.Timer(
        float(os.environ.get("BENCH_TIMEOUT_S", "2400")), _abort)
    watchdog.daemon = True
    watchdog.start()
    # BENCH_SECTIONS (csv of 2048,4096,e2e,e2e4096) limits the run — a
    # primary-only capture fits inside a short tunnel-heal window, which
    # is how a fresh ledger entry gets banked during flappy periods
    sections = os.environ.get("BENCH_SECTIONS", "2048,4096,e2e,e2e4096")
    want = {s.strip() for s in sections.split(",") if s.strip()}
    if "2048" in want:
        bench_merge(2048, BATCH)
    if "4096" in want:
        bench_merge(4096, BATCH)  # batch 24 is the 4096 sweet spot (5.7x b1)
    if "e2e" in want:
        bench_e2e()
    if "e2e4096" in want:
        bench_e2e_4096()
    watchdog.cancel()
    # Re-state the primary metric as the FINAL line: drivers that parse the
    # last JSON line get the headline number, not whichever stage ran last.
    if _primary_rec is not None:
        print(json.dumps(_primary_rec), flush=True)


if __name__ == "__main__":
    main()
