"""Benchmark harness: honest single-chip throughput of the hot paths.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline metric is BN254 G1 Pippenger MSM points/s at N = 2^BENCH_MSM_LOG
(default 2^20); "extra" carries the remaining north-star metrics
(mont_mul muls/s, NTT transform time, QAP end-to-end prove seconds) plus the
on-device bit-check verdicts.

Timeout-proofing (the round-1..3 failure mode was a driver timeout eating
the JSON): the top-level process is a thin orchestrator that runs NO JAX —
it launches each phase group as a subprocess with a budgeted timeout, merges
the phase's incrementally-written progress file, and ALWAYS emits the final
JSON: on phase timeout, on SIGTERM/SIGINT from an external watchdog, or on
its own SIGALRM at BENCH_BUDGET_S (default 2700 s).  A hung remote compile
can only ever cost its own phase, never the output line.  Expensive
artifacts persist across runs in BENCH_KEYS (default /tmp/myzkp_bench_keys):
the Pinocchio proving key (setup runs once per host per code version) and
the 2^20 MSM point table.

Timing methodology (docs/speed_of_light.md): this chip is reached through a
relay where dispatch is acknowledged before execution and
``jax.block_until_ready`` does not block, so every measurement here either
(a) chain-differences two on-device ``fori_loop`` repeat counts with a
scalar host fetch after each, or (b) wall-times a call whose return value is
host data (forcing execution).

``vs_baseline`` is the measured speedup over the reference's only MSM
algorithm — per-coefficient affine double-and-add on host BigInts
(myzkp/src/modules/algebra/polynomial.rs:156-165 + curve.rs:163-191) —
sampled here on the same host and extrapolated per point (the reference
publishes no numbers, BASELINE.md).
"""

import functools
import hashlib
import json
import os
import random
import signal
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

LOG_N = int(os.environ.get("BENCH_MSM_LOG", 20))
QAP_LOG = int(os.environ.get("BENCH_QAP_LOG", 20))
NTT_LOG = int(os.environ.get("BENCH_NTT_LOG", 20))
SKIP = set(os.environ.get("BENCH_SKIP", "").split(","))
# Default budget sized to the DRIVER's observed kill window (~1800 s wall:
# BENCH_r04 recorded SIGTERM at 1798.4 s) minus emit headroom — r4's 2700 s
# default let the qap prove start work it could never finish (VERDICT r5 #1).
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1700))
KEYS_DIR = os.environ.get("BENCH_KEYS", "/tmp/myzkp_bench_keys")

# One seed for every pseudorandom draw in the bench (points, scalars,
# circuit assignment, setup toxic waste).  Setup retries re-seed from this
# constant so a retried setup replays the identical draw sequence; the
# prove's draws come from the same stream and are therefore independent of
# how many setup attempts ran (advisor r4).
SEED = 42


def _is_relay_500(msg: str) -> bool:
    """The axon relay's remote-compile helper failure signature (an
    intermittent HTTP 500 that succeeds on immediate retry).  A bare
    '500' substring also matched byte counts and durations (advisor r4)."""
    return "HTTP 500" in msg or "tpu_compile_helper" in msg

T0 = time.perf_counter()


def _code_hash(*relpaths) -> str:
    """Version salt for cached artifacts: stale caches from older code
    versions must miss, not poison a run."""
    h = hashlib.md5()
    for rp in relpaths:
        try:
            with open(os.path.join(_REPO, rp), "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(rp.encode())
    return h.hexdigest()[:10]


# ===========================================================================
# Parent orchestrator
# ===========================================================================

STATE = {
    "emitted": False,
    "pps": 0.0,
    "host_pps": 0.0,
    "extra": {"methodology": "chain-diff+fetch (docs/speed_of_light.md)"},
}


def _emit(tag=None):
    if STATE["emitted"]:
        return
    STATE["emitted"] = True
    extra = STATE["extra"]
    extra["bench_wall_s"] = round(time.perf_counter() - T0, 1)
    if tag:
        extra["bench_exit"] = tag
    metric = f"bn254_g1_msm_pippenger_2^{LOG_N}"
    if extra.pop("_bitcheck_failed", None):
        metric = "BITCHECK_FAILED"
    if extra.pop("_msm_golden_failed", None):
        metric = "MSM_GOLDEN_FAILED"
    pps = STATE["pps"] or 0.0
    host = STATE["host_pps"] or 0.0
    # Environment-normalized anchors (VERDICT r4 #6): the relay/chip
    # environment drifts ±25-75% between rounds (BASELINE.md drift note),
    # so each headline also ships as a ratio against the same-run mont_mul
    # rate — the ratios stay comparable across rounds.
    mont = extra.get("mont_mul_2^20_M_per_s")
    if mont and pps:
        extra["msm_pts_per_Mmont"] = round(pps / (mont * 1e6) * 1e6, 3)
    ntt_bf = extra.get(f"ntt_2^{NTT_LOG}_M_butterflies_per_s")
    if mont and ntt_bf:
        extra["ntt_butterflies_per_mont"] = round(ntt_bf / mont, 3)
    print(json.dumps({
        "metric": metric,
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / host, 2) if (pps and host) else 0,
        "extra": extra,
    }), flush=True)


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T0)


def _merge_progress(path):
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return
    for k, v in data.items():
        if k == "_pps":
            STATE["pps"] = v
        elif k == "_host_pps":
            STATE["host_pps"] = v
        else:
            STATE["extra"][k] = v


def _run_phase(phases: str, timeout: float) -> None:
    """Launch ``python bench.py --child <phases> <progress>`` in its own
    session; merge whatever it managed to write, however it ends."""
    os.makedirs(KEYS_DIR, exist_ok=True)
    progress = os.path.join(KEYS_DIR, f"progress_{phases}_{os.getpid()}.json")
    _LIVE_PROGRESS.append(progress)
    try:
        os.unlink(progress)
    except OSError:
        pass
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", phases,
         progress, f"{max(30.0, timeout - 15):.0f}"],
        start_new_session=True)
    _CHILD_PGIDS.add(proc.pid)
    try:
        rc = proc.wait(timeout=timeout)
        if rc != 0:
            STATE["extra"][f"phase_{phases}_rc"] = rc
    except subprocess.TimeoutExpired:
        STATE["extra"][f"phase_{phases}_timeout_s"] = round(timeout, 1)
        try:
            os.killpg(proc.pid, signal.SIGTERM)
            proc.wait(timeout=20)
        except (subprocess.TimeoutExpired, OSError, ProcessLookupError):
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (OSError, ProcessLookupError):
                pass
            proc.wait()
    finally:
        _merge_progress(progress)
        try:
            os.unlink(progress)
        except OSError:
            pass


def main():
    def handler(signum, frame):
        # emit with whatever has landed, then hard-exit: a timeout or
        # watchdog kill must never again produce parsed=null
        try:
            for pgid in _CHILD_PGIDS:
                try:
                    os.killpg(pgid, signal.SIGKILL)
                except (OSError, ProcessLookupError):
                    pass
            for p in _LIVE_PROGRESS:  # salvage the in-flight child's results
                _merge_progress(p)
        finally:
            _emit(f"signal_{signum}")
            os._exit(0)

    for s in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(s, handler)
    signal.alarm(max(1, int(BUDGET_S)))

    # sweep stale atomic-write temps from killed past runs (advisor r4:
    # a ~500 MB orphan per killed save); no children are live yet
    try:
        for f in os.listdir(KEYS_DIR):
            if ".tmp" in f:
                try:
                    os.unlink(os.path.join(KEYS_DIR, f))
                except OSError:
                    pass
    except OSError:
        pass

    # Phase 0: relay-health probe.  A SIGKILLed client mid-remote-compile
    # wedges the relay for every new connection until the abandoned
    # server-side compile finishes (measured: hours) — a tiny jax op in a
    # subprocess distinguishes "relay wedged" from "our programs are slow"
    # and waits a bounded window for recovery instead of burning the whole
    # budget on a doomed phase.
    probe_deadline = time.perf_counter() + min(900.0, BUDGET_S / 3)
    probe_src = ("import jax, numpy; jax.devices(); "
                 "numpy.asarray(jax.numpy.arange(4)); print('ok')")
    t_probe = time.perf_counter()
    healthy = False
    while time.perf_counter() < probe_deadline:
        try:
            r = subprocess.run([sys.executable, "-c", probe_src],
                               capture_output=True, timeout=90, text=True)
            if "ok" in r.stdout:
                healthy = True
                break
        except subprocess.TimeoutExpired:
            pass
        time.sleep(20)
    STATE["extra"]["relay_probe_s"] = round(time.perf_counter() - t_probe, 1)
    if not healthy:
        STATE["extra"]["relay_unreachable"] = True
        _emit("relay_unreachable")
        return

    # Phase group 1: bitchecks + mont_mul + NTT (light; all programs cached
    # from prior runs in the steady state).
    if not {"bitcheck", "mont_mul", "ntt"} <= SKIP:
        _run_phase("light", max(60.0, min(_remaining() - 90, 1500)))
    if STATE["extra"].get("_bitcheck_failed"):
        _emit("bitcheck_failed")
        return
    # Phase group 2: MSM headline + QAP end-to-end (heavy; shares one
    # process so the prover's 2^20 Pippenger trace is paid once).
    if _remaining() > 90:
        _run_phase("heavy", max(60.0, _remaining() - 45))
    # QAP retry in a FRESH process: the relay's tpu_compile_helper has
    # twice 500'd on setup's first compile when issued from a session
    # that already compiled the 2^20 MSM programs, while the identical
    # setup compiles cleanly from a fresh process (measured 2026-08-21).
    # If the in-process attempt died that way, isolate and retry.
    qap_missing = (f"qap_2^{QAP_LOG}_prove_s" not in STATE["extra"]
                   and "qap" not in SKIP)
    if qap_missing and _is_relay_500(str(STATE["extra"].get("qap_error", ""))) \
            and _remaining() > 600:
        _run_phase("qap", max(60.0, _remaining() - 45))
    _emit()


_CHILD_PGIDS = set()
_LIVE_PROGRESS = []


# ===========================================================================
# Child phases (everything below runs in subprocesses)
# ===========================================================================

class Progress:
    """Incrementally-persisted result dict: every update is atomically
    visible to the parent, so a later hang loses nothing.  A lock
    serializes the dict mutation AND the dump+rename: the background
    key-save thread writes timings concurrently with the main thread
    (advisor r4 — an unguarded dump could raise 'dict changed size' or
    interleave tmp-file writes)."""

    def __init__(self, path):
        import threading

        self.path = path
        self.data = {}
        self._lock = threading.Lock()

    def __setitem__(self, k, v):
        with self._lock:
            self.data[k] = v
            tmp = f"{self.path}.tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(self.data, f)
            os.replace(tmp, self.path)

    def get(self, k, default=None):
        return self.data.get(k, default)


def _child_setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _fetch(out):
    import jax
    import numpy as np

    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def _time_fetch(fn, *args, reps=2):
    out = fn(*args)
    _fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _chain_time(step, init, n_long=8, n_short=1, reps=2, consts=()):
    """Seconds per step: diff of two on-device chain lengths (traced N, one
    compile). ``step(i, x, *consts)`` must be shape-preserving and
    data-dependent.

    Loop-invariant arrays MUST go in ``consts`` (threaded through the jit as
    arguments), never captured in ``step``'s closure: closed-over device
    arrays become HLO literal constants, and at 2^20 points that ~200 MB
    payload exceeds the relay's remote-compile HTTP body limit (the round-2
    BENCH rc=1 / HTTP 413 failure)."""
    import jax

    @jax.jit
    def run(N, x0, *cs):
        x = jax.lax.fori_loop(0, N, lambda i, x: step(i, x, *cs), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]

    tl = _time_fetch(functools.partial(run, n_long), init, *consts, reps=reps)
    ts = _time_fetch(functools.partial(run, n_short), init, *consts, reps=reps)
    return (tl - ts) / (n_long - n_short)


def bench_bitchecks(extra):
    """On-device golden comparisons: flag the whole bench on mismatch
    (VERDICT r1: Mosaic lowering must be bit-checked on the real chip).
    Golden paths run under limb.force_pallas(False) — a trace-keyed,
    thread-local override — instead of mutating MYZKP_PALLAS process-wide
    (advisor r2/r3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from myzkp_tpu.fields.spec import bn254_q_spec
    from myzkp_tpu.fields import limb, limb_pallas

    spec = bn254_q_spec()
    n = 1 << 14
    a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(0), (n,)))
    b = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (n,)))
    with limb.force_pallas(False):
        want = np.asarray(jax.jit(
            lambda a, b: limb.mont_mul(spec, a, b))(a, b))
    got = np.asarray(jax.jit(
        lambda a, b: limb_pallas.mont_mul_pallas(spec, a, b))(a, b))
    ok_mul = bool((got == want).all())

    tw = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(2), (n,)))
    gu, gv = jax.jit(lambda u, v, t: limb_pallas.butterfly_pallas(
        spec, u, v, t, dit=False))(a, b, tw)
    with limb.force_pallas(False):
        wu, wv = jax.jit(lambda u, v, t: (
            limb.add(spec, u, v),
            limb.mont_mul(spec, limb.sub(spec, u, v), t)))(a, b, tw)
    ok_bf = bool((np.asarray(gu) == np.asarray(wu)).all()
                 and (np.asarray(gv) == np.asarray(wv)).all())

    # fused multi-stage NTT leaf kernel vs pure-JAX Stockham (over the
    # NTT field bn254-r: q-1 has 2-adicity 1, no length-256 roots)
    from myzkp_tpu.fields.spec import bn254_r_spec
    from myzkp_tpu.ops import ntt as nttmod

    rspec = bn254_r_spec()
    ar = limb.to_mont(rspec, limb.random(rspec, jax.random.PRNGKey(5),
                                         (n,)))
    m = 128
    x4 = ar.reshape(rspec.L, 1, m, n // m)
    twf = jnp.asarray(nttmod._leaf_twiddles_np(rspec, m, False))
    gl = np.asarray(limb_pallas.ntt_leaf_pallas(rspec, x4, twf, m))
    with limb.force_pallas(False):
        wl = np.asarray(jax.jit(
            lambda x: nttmod._stockham_axis(rspec, x, m, False))(x4))
    ok_leaf = bool((gl == wl).all())

    # fused G2 (Fq2-coordinate) complete add vs pure-JAX golden — the
    # G2 interpret tests are CI-slow-marked, so the lowering is pinned
    # here on the real chip instead
    from myzkp_tpu.curves import bn254, weierstrass as wst

    F2, b32 = bn254.g2_ops(), bn254.g2_b3(())
    g2gen = bn254.g2_generator()
    pa = bn254.g2_points_to_device([g2gen * (3 + i) for i in range(8)])
    pb = bn254.g2_points_to_device([g2gen * (11 + i) for i in range(8)])

    def g2add():
        return wst.padd(F2, b32, pa, pb)

    got2 = jax.tree_util.tree_leaves(g2add())
    with limb.force_pallas(False):
        want2 = jax.tree_util.tree_leaves(g2add())
    ok_g2 = all(bool((np.asarray(g) == np.asarray(w)).all())
                for g, w in zip(got2, want2))

    extra["bitcheck_mont_mul"] = ok_mul
    extra["bitcheck_butterfly"] = ok_bf
    extra["bitcheck_ntt_leaf"] = ok_leaf
    extra["bitcheck_g2_padd"] = ok_g2
    if not (ok_mul and ok_bf and ok_leaf and ok_g2):
        extra["_bitcheck_failed"] = True
    else:
        print("# bitchecks OK (mont_mul, butterfly @ 2^14, ntt_leaf @ "
              "128x128, g2 padd)", file=sys.stderr)


def bench_mont_mul(extra):
    import jax

    from myzkp_tpu.fields.spec import bn254_q_spec
    from myzkp_tpu.fields import limb, limb_pallas

    spec = bn254_q_spec()
    n = 1 << 20
    a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(0), (n,)))
    b = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (n,)))
    dt = _chain_time(
        lambda i, x, b: limb_pallas.mont_mul_pallas(spec, x, b), a,
        n_long=32, n_short=4, consts=(b,))
    extra["mont_mul_2^20_M_per_s"] = round(n / dt / 1e6, 1)
    print(f"# mont_mul 2^20: {n/dt/1e6:.0f} M muls/s", file=sys.stderr)


def bench_ntt(extra):
    import jax

    from myzkp_tpu.fields.spec import bn254_r_spec
    from myzkp_tpu.fields import limb
    from myzkp_tpu.ops import ntt as nttmod

    spec = bn254_r_spec()
    n = 1 << NTT_LOG
    a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(3), (n,)))
    tabs = nttmod.fourstep_tables(spec, n, False)

    def step(i, x, *tb):
        return nttmod._ntt_natural(spec, x, False, tb)

    dt = _chain_time(step, a, n_long=6, n_short=1, consts=tabs)
    nbf = (n // 2) * NTT_LOG
    extra[f"ntt_2^{NTT_LOG}_ms"] = round(dt * 1e3, 2)
    extra[f"ntt_2^{NTT_LOG}_M_butterflies_per_s"] = round(nbf / dt / 1e6, 1)
    print(f"# ntt 2^{NTT_LOG}: {dt*1e3:.1f} ms "
          f"({nbf/dt/1e6:.0f} M butterflies/s)", file=sys.stderr)


def _msm_point_cache_path():
    salt = _code_hash("myzkp_tpu/curves/fixed_base.py",
                      "myzkp_tpu/curves/bn254.py")
    return os.path.join(KEYS_DIR, f"msm_pts_2^{LOG_N}_s42_{salt}.npz")


def _msm_points_and_scalars():
    """2^LOG_N pseudorandom points as known multiples [m_i]G (disk-cached)
    plus random scalars; the golden check then needs only one host scalar
    mul: [sum k_i m_i mod r] G."""
    import jax
    import numpy as np

    from myzkp_tpu.curves import bn254, fixed_base, msm, weierstrass as wst

    rng = random.Random(SEED)
    rspec = bn254.r_spec()
    n = 1 << LOG_N
    ms = [rng.randrange(1, bn254.R) for _ in range(n)]
    ks = [rng.randrange(0, bn254.R) for _ in range(n)]
    scalars = msm.scalars_from_int(rspec, ks)
    path = _msm_point_cache_path()
    if os.path.exists(path):
        try:
            d = np.load(path)
            import jax.numpy as jnp

            pts = wst.Point(jnp.asarray(d["x"]), jnp.asarray(d["y"]),
                            jnp.asarray(d["z"]))
            print("# msm point table loaded from cache", file=sys.stderr)
            return pts, scalars, ms, ks
        except Exception:
            pass
    t0 = time.perf_counter()
    pts = fixed_base.fixed_base_multi("g1", msm.scalars_from_int(rspec, ms))
    x, y, z = (np.asarray(c) for c in (pts.x, pts.y, pts.z))
    print(f"# msm point table generated in {time.perf_counter()-t0:.1f}s "
          "(fixed-base windowed)", file=sys.stderr)
    try:
        os.makedirs(KEYS_DIR, exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}.npz"  # np.savez appends .npz itself
        np.savez(tmp, x=x, y=y, z=z)
        os.replace(tmp, path)
    except OSError:
        pass
    return pts, scalars, ms, ks


_MSM_DATA = {}


def _msm_data():
    if not _MSM_DATA:
        pts, scalars, ms, ks = _msm_points_and_scalars()
        _MSM_DATA.update(points=pts, scalars=scalars, ms=ms, ks=ks)
    return _MSM_DATA


def bench_msm_goldens(extra):
    """Small-n MSM diagnostics goldens vs host ground truth (both the
    rows-scan auto path at a multi-tile shape and the XLA-scan fallback).
    Run after the headline when budget remains: the headline's own
    full-production-shape golden and the light phase's on-chip bitchecks
    are the integrity gate; these localize a failure to a path."""
    import jax

    from myzkp_tpu.curves import bn254, msm

    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    d = _msm_data()
    points, scalars, ms, ks = d["points"], d["scalars"], d["ms"], d["ks"]

    n_small = 512
    pts_s = jax.tree_util.tree_map(lambda c: c[:, :n_small], points)
    exp = bn254.g1_generator() * (
        sum(k * m for k, m in zip(ks[:n_small], ms[:n_small])) % bn254.R)

    def check(**kw):
        got = msm.msm_pippenger(F, b3, pts_s, scalars[:, :n_small], **kw)
        got_host = bn254.g1_points_to_host(
            jax.tree_util.tree_map(lambda c: c[:, None], got))[0]
        return bool(got_host == exp)

    # Golden 1 — the AUTO path at n=512: with ROWS_SCAN_AUTO on, the
    # cost model's own parameters (c=8, G=32, K=8 -> 2048 lanes, 2 grid
    # tiles) route through the fused rows-scan kernel at a MULTI-tile
    # shape — the r4 bug class fails here, not only at headline size
    # (VERDICT r4 #5).  A failure flags the path (and disables it for
    # anything later in this process).
    rows_live = bool(msm.ROWS_SCAN_AUTO)
    try:
        ok_auto = check()
    except Exception as e:
        ok_auto = f"error: {type(e).__name__}"[:80]
    extra["bitcheck_msm_512_auto"] = ok_auto
    if ok_auto is not True and rows_live:
        msm.ROWS_SCAN_AUTO = False
        extra["rows_scan_disabled"] = True
        print("# msm auto golden FAILED -> rows path disabled",
              file=sys.stderr)
    else:
        print(f"# msm golden @512 auto (rows={rows_live}) "
              f"{'OK' if ok_auto is True else 'FAILED'}", file=sys.stderr)

    # Golden 2 — the XLA-scan formulation (the kill-switch fallback and
    # the r3 headline path) must be green too: if BOTH paths fail the
    # whole bench aborts as MSM_GOLDEN_FAILED.
    ok_xla = check(_rows_scan=False)
    extra["bitcheck_msm_512_xla"] = ok_xla
    if not ok_xla:
        extra["_msm_golden_failed"] = True
        return
    print("# msm golden @512 xla-scan OK", file=sys.stderr)


def bench_msm_headline(extra):
    """Time the PROVER'S OWN jitted 2^20 MSM program
    (snark.pinocchio._jitted_msm).  Runs AFTER bench_qap in the same
    process: the qap prove's witness MSMs already compiled this exact
    program, so the headline costs only the point-table load plus timing
    reps (the ~272 s cold compile is paid once per child — VERDICT r5 #1).

    Methodology (b) of docs/speed_of_light.md: wall-time calls whose
    output is fetched to host — the fetch blocks until execution
    completes, and the ~26 ms relay round trip is measured and
    subtracted.  Distinct scalar inputs per rep defeat any caching."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from myzkp_tpu.curves import bn254, msm
    from myzkp_tpu.snark import pinocchio

    n = 1 << LOG_N
    d = _msm_data()
    points, scalars, ms, ks = d["points"], d["scalars"], d["ms"], d["ks"]

    run = pinocchio._jitted_msm("g1", "pippenger")

    def fetch_point(out):
        for c in out:
            np.asarray(c)

    variants = []
    for k in range(4):
        sl = scalars.at[0, 0].set((scalars[0, 0] + k) & jnp.uint32(0x7FFF))
        np.asarray(sl[0, 0])  # materialize before timing
        variants.append(sl)
    t0 = time.perf_counter()
    out = run(points.x, points.y, points.z, variants[0])
    fetch_point(out)
    extra["msm_compile_s"] = round(time.perf_counter() - t0, 1)
    print(f"# msm compile+first {extra['msm_compile_s']}s", file=sys.stderr)
    # relay round-trip baseline: fetch of an already-materialized tiny array
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(variants[0][0, 0])
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    ts = []
    for k in (1, 2, 3, 1, 2):
        t0 = time.perf_counter()
        out = run(points.x, points.y, points.z, variants[k])
        fetch_point(out)
        ts.append(time.perf_counter() - t0)
    dt = max(1e-9, min(ts) - rtt)
    extra["msm_rtt_ms"] = round(rtt * 1e3, 1)
    pps = n / dt
    print(f"# msm 2^{LOG_N}: {dt*1e3:.1f} ms -> {pps/1e3:.0f} k pts/s "
          f"(rtt {rtt*1e3:.0f} ms subtracted)", file=sys.stderr)

    # FULL-SHAPE golden (VERDICT r4 #5): the timed program's own output at
    # the exact production configuration vs one host scalar mul.  The last
    # timing rep used variants[2] (scalar 0 perturbed by +2 mod 2^15).
    k0 = ks[0]  # variants[2] replaced scalar 0's limb 0 by (l0+2) & 0x7FFF
    k0_pert = k0 - (k0 & 0xFFFF) + (((k0 & 0xFFFF) + 2) & 0x7FFF)
    exp_full = bn254.g1_generator() * (
        (sum(k * m for k, m in zip(ks, ms)) - k0 * ms[0] + k0_pert * ms[0])
        % bn254.R)
    got_full = bn254.g1_points_to_host(jax.tree_util.tree_map(
        lambda c: np.asarray(c)[:, None], wst_point(out)))[0]
    extra[f"bitcheck_msm_2^{LOG_N}"] = bool(got_full == exp_full)
    if not extra[f"bitcheck_msm_2^{LOG_N}"]:
        extra["_msm_golden_failed"] = True
        print(f"# msm FULL-SHAPE golden @2^{LOG_N} FAILED", file=sys.stderr)
        return
    print(f"# msm full-shape golden @2^{LOG_N} OK", file=sys.stderr)

    # reference-equivalent naive host double-and-add, sampled
    sample = 4
    host_pts = [bn254.g1_generator() * m for m in ms[:sample]]
    t0 = time.perf_counter()
    acc = bn254.curve_g1.infinity()
    for k, p in zip(ks[:sample], host_pts):
        acc = acc + p * k
    host_pps = sample / (time.perf_counter() - t0)
    extra["_pps"] = round(pps, 1)
    extra["_host_pps"] = host_pps


def wst_point(out):
    from myzkp_tpu.curves import weierstrass as wst

    return wst.Point(*out)


# ---------------------------------------------------------------------------
# QAP end-to-end (north star)
# ---------------------------------------------------------------------------

def _qap_cache_paths(qap_log):
    salt = _code_hash("myzkp_tpu/snark/pinocchio.py",
                      "myzkp_tpu/arith/sparse.py",
                      "myzkp_tpu/curves/fixed_base.py")
    base = os.path.join(KEYS_DIR, f"pino_2^{qap_log}_s42_{salt}")
    return base + ".npz", base + ".vk.json"


def _warm_prove_programs(extra, pk, qap, assignment, deadline):
    """Compile the cold prove's programs CONCURRENTLY before proving.

    A fresh process pays every remote compile (no cross-process cache),
    and the prove issues them sequentially: 2^20 G1 Pippenger (~430 s in
    the r5 environment), the chunked naive G2 ladder (~6+ min), the
    shifted-h NTT pipeline, plus the small fused-kernel shapes (tails,
    single-point delta ladders — the Fq2 lowerings take minutes each).
    The relay's compile helper runs per-request subprocesses, so
    compiles issued from separate threads overlap server-side: warming
    here turns sum-of-compiles into ~max-of-compiles.  Results are
    discarded; the prove's jit caches are process-local and hit warm.
    Thread errors are recorded, never raised — the prove itself retries
    with its own shields."""
    import threading

    import jax
    import jax.numpy as jnp

    from myzkp_tpu.curves import bn254, msm as _m, weierstrass as wst
    from myzkp_tpu.snark import pinocchio

    spec = bn254.r_spec()
    d = jax.tree_util.tree_leaves(pk.g1_ell_i)[0].shape[1]
    zeros = jnp.zeros((spec.L, d), jnp.uint32)
    bits1 = _m.scalar_bits(_m.scalars_from_int(spec, [3]))
    F1, b31 = bn254.g1_ops(), bn254.g1_b3(())
    F2, b32 = bn254.g2_ops(), bn254.g2_b3(())

    def job(name, fn):
        def run():
            t0 = time.perf_counter()
            try:
                out = fn()
                jax.block_until_ready(jax.tree_util.tree_leaves(out))
                _fetch(out)
                extra[f"warm_{name}_s"] = round(time.perf_counter() - t0, 1)
            except Exception as e:
                extra[f"warm_{name}_error"] = f"{type(e).__name__}: {e}"[:160]
        return threading.Thread(target=run, daemon=True, name=name)

    m1 = jax.tree_util.tree_leaves(pk.g1_sj)[0].shape[1]
    threads = [
        job("g1_pip", lambda: pinocchio._msm_g1(pk.g1_ell_i, zeros)),
        job("g2_naive", lambda: pinocchio._msm_g2(
            pk.g2_r_i, zeros, "naive")),
        job("shifted_h", lambda: pinocchio.get_shifted_h(
            qap, assignment, 3, 5, 7).coef.mont),
        job("g1_sj", lambda: pinocchio._msm_g1(
            pk.g1_sj, zeros[:, :m1])),
        job("ladders", lambda: (
            tuple(wst.scalar_mul_bits(F1, b31, pk.g1_ell_ts, bits1)),
            tuple(jax.tree_util.tree_leaves(
                wst.scalar_mul_bits(F2, b32, pk.g2_r_ts, bits1))))),
    ]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=max(5.0, deadline - time.perf_counter()))
    extra["warm_wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"# qap warm: {extra['warm_wall_s']}s "
          f"({sum(1 for th in threads if not th.is_alive())}/"
          f"{len(threads)} done)", file=sys.stderr)


def bench_qap(extra, deadline, qap_log=None):
    """End-to-end Pinocchio prove at 2^qap_log constraints (north star).

    Stage-gated against ``deadline`` (absolute perf_counter value); the
    proving key persists across runs, so setup's cost is paid once per
    host per code version.  The G2 prover MSM defaults to the chunked
    naive ladder: remote compiles bypass the persistent XLA cache, so a
    fresh bench process ALWAYS pays the cold compile — ~6 min for the
    ladder vs ~36 min for G2 Pippenger (which is what killed the r4 qap
    phase: a stale 'warm' marker selected Pippenger and the driver's
    SIGTERM landed mid-compile).  Runtime cost of the ladder is ~+18 s on
    the steady prove; MYZKP_G2_MSM=pippenger overrides when the compile
    is known-warm in-process."""
    from myzkp_tpu.arith.sparse import SparseQAP, square_chain
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.snark import pinocchio
    from myzkp_tpu.utils import serialize

    qap_log = qap_log if qap_log is not None else QAP_LOG
    tag = f"qap_2^{qap_log}"

    g2_method = os.environ.get("MYZKP_G2_MSM", "naive")
    extra[tag + "_g2_method"] = g2_method

    spec = bn254.r_spec()
    rng = random.Random(SEED)
    m = 1 << qap_log
    t0 = time.perf_counter()
    r1cs, assignment = square_chain(spec, m)
    qap = SparseQAP(r1cs)
    t1 = time.perf_counter()
    extra[tag + "_circuit_s"] = round(t1 - t0, 3)

    pk_path, vk_path = _qap_cache_paths(qap_log)
    cached = os.path.exists(pk_path) and os.path.exists(vk_path)
    if cached:
        try:
            pk = serialize.load_pinocchio_pk(pk_path)
            vk = serialize.load_pinocchio_vk(vk_path)
        except Exception as e:  # corrupt/stale cache -> regenerate
            extra[tag + "_setup_load_error"] = f"{type(e).__name__}"[:80]
            cached = False
        else:
            extra[tag + "_setup_cached"] = True
            t2 = time.perf_counter()
            extra[tag + "_setup_load_s"] = round(t2 - t1, 3)
    if not cached:
        if time.perf_counter() > deadline - 240:
            extra[tag + "_skipped"] = "no time for setup"
            return
        # The relay's tpu_compile_helper 500s intermittently (observed on
        # three different pool ports for the same program that also
        # compiles cleanly); a failed attempt dies in ~seconds, so retry
        # with fresh rng state each time (the draws must match the
        # single-attempt sequence for reproducibility, so re-seed).
        for attempt in range(4):
            rng_a = random.Random(SEED)  # replay the setup draw sequence
            try:
                pk, vk = pinocchio.setup(qap, rng=rng_a)
                _fetch(pk.g1_sj.x)
                break
            except Exception as e:
                msg = f"{type(e).__name__}: {e}"
                extra[tag + f"_setup_try{attempt}"] = msg[:160]
                if not _is_relay_500(msg) or attempt == 3 \
                        or time.perf_counter() > deadline - 300:
                    raise
                time.sleep(20)
        t2 = time.perf_counter()
        extra[tag + "_setup_s"] = round(t2 - t1, 3)

        # Persist in a BACKGROUND thread: the device->host fetch of a
        # 2^20 proving key rides the relay at ~1.4 MB/s (measured 61 s
        # for the 84 MB 2^16 key), which would cost the prove its whole
        # remaining budget if serialized on the critical path.  numpy
        # fetches release the GIL, so the prove continues unimpeded.
        def _save_keys():
            try:
                os.makedirs(KEYS_DIR, exist_ok=True)
                serialize.save_pinocchio_pk(pk_path, pk)
                serialize.save_pinocchio_vk(vk_path, vk)
                extra[tag + "_setup_saved_s"] = round(
                    time.perf_counter() - t2, 3)
            except Exception as e:
                extra[tag + "_setup_save_error"] = str(e)[:120]
        import threading
        th = threading.Thread(target=_save_keys, daemon=True)
        th.start()
        _SAVE_THREADS.append(th)
    print(f"# {tag}: keys ready ({time.perf_counter()-t1:.1f}s, "
          f"cached={cached})", file=sys.stderr)

    if (os.environ.get("BENCH_NO_WARM") != "1"
            and time.perf_counter() < deadline - 300):
        _warm_prove_programs(extra, pk, qap, assignment, deadline - 150)

    if time.perf_counter() > deadline - 60:
        extra[tag + "_skipped"] = "no time for prove"
        return
    t2 = time.perf_counter()
    for attempt in range(3):  # same intermittent-500 shield as setup
        try:
            proof = pinocchio.prove(assignment, pk, qap, rng=rng,
                                    g2_method=g2_method)
            break
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            extra[tag + f"_prove_try{attempt}"] = msg[:160]
            if not _is_relay_500(msg) or attempt == 2 \
                    or time.perf_counter() > deadline - 120:
                raise
            time.sleep(20)
    t3 = time.perf_counter()
    extra[tag + "_prove_cold_s"] = round(t3 - t2, 3)
    print(f"# {tag}: cold prove {t3-t2:.1f}s", file=sys.stderr)
    # steady-state rep only if it can't cost the headline its slot: the
    # warm prove measured ~41 s, so require ~2x that plus headroom
    if time.perf_counter() < deadline - max(120.0, 0.3 * (t3 - t2)):
        proof = pinocchio.prove(assignment, pk, qap, rng=rng,
                                g2_method=g2_method)  # steady state
        t4 = time.perf_counter()
        extra[tag + "_prove_s"] = round(t4 - t3, 3)
    else:
        t4 = t3
        extra[tag + "_prove_s"] = round(t3 - t2, 3)
        extra[tag + "_prove_is_cold"] = True
    ok = pinocchio.verify(proof, vk)
    t5 = time.perf_counter()
    extra[tag + "_verify_s"] = round(t5 - t4, 3)
    print(f"# {tag}: prove {extra[tag + '_prove_s']:.2f}s "
          f"verify {t5-t4:.2f}s ok={ok}", file=sys.stderr)
    if not ok:
        extra[tag + "_rejected"] = True
        if cached:
            # a stale cached key can't satisfy a fresh assignment check —
            # invalidate and (budget permitting) retry with a fresh setup
            for p in (pk_path, vk_path):
                try:
                    os.unlink(p)
                except OSError:
                    pass
            if time.perf_counter() < deadline - 420:
                bench_qap(extra, deadline, qap_log)
        return


_SAVE_THREADS: list = []


def child_main(phases: str, progress_path: str, budget: float):
    prog = Progress(progress_path)

    def handler(signum, frame):
        prog["child_killed"] = signum
        os._exit(1)

    signal.signal(signal.SIGTERM, handler)
    _child_setup_jax()
    deadline = T0 + budget  # parent-granted budget (it enforces harder caps)

    class ExtraProxy(dict):
        def __setitem__(self, k, v):
            dict.__setitem__(self, k, v)
            prog[k] = v

    extra = ExtraProxy()
    try:
        if phases == "light":
            if "bitcheck" not in SKIP:
                bench_bitchecks(extra)
                if extra.get("_bitcheck_failed"):
                    return
            if "mont_mul" not in SKIP:
                bench_mont_mul(extra)
            if "ntt" not in SKIP:
                bench_ntt(extra)
        elif phases in ("heavy", "qap"):
            # Order (VERDICT r5 #1, re-tuned after the r5 rehearsal
            # measured today's relay compiling ~1.7x slower): the qap
            # prove FIRST — four rounds missed it and it owns the one
            # 2^20 Pippenger compile — then the MSM headline, which
            # reuses that compiled program and carries its own
            # full-production-shape golden, then the 512-point
            # diagnostics goldens with whatever budget remains.  The
            # light phase's on-chip bitchecks plus the full-shape golden
            # keep the headline integrity-gated; a corrupted fused path
            # additionally surfaces as a REJECTED proof (verify runs
            # before any number is reported).
            if phases == "qap":
                extra["qap_retry_fresh_process"] = True
            if "qap" not in SKIP:
                # reserve ~3 min for the headline timing that follows
                qap_deadline = (deadline - 180 if phases == "heavy"
                                else deadline)
                try:
                    bench_qap(extra, qap_deadline)
                except Exception as e:  # keep the headline on qap failure
                    extra["qap_error"] = f"{type(e).__name__}: {e}"[:500]
            if phases == "heavy" and "msm" not in SKIP:
                bench_msm_headline(extra)
                if extra.get("_msm_golden_failed"):
                    return
            if (phases == "heavy" and "msm" not in SKIP
                    and time.perf_counter() < deadline - 180):
                bench_msm_goldens(extra)
                if extra.get("_msm_golden_failed"):
                    return
            if ("qap" not in SKIP and QAP_LOG > 16
                    and f"qap_2^{QAP_LOG}_prove_s" not in extra
                    and time.perf_counter() < deadline - 240):
                try:
                    bench_qap(extra, deadline, qap_log=16)
                except Exception as e2:
                    extra["qap16_error"] = (
                        f"{type(e2).__name__}: {e2}"[:200])
    except Exception as e:
        extra["phase_error"] = f"{type(e).__name__}: {e}"[:300]
        raise
    finally:
        # let an in-flight background key save land (bounded by what's
        # left of the budget; the tmp+rename write is atomic either way)
        for th in _SAVE_THREADS:
            th.join(timeout=max(5.0, deadline - time.perf_counter()))


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--child":
        child_main(sys.argv[2], sys.argv[3], float(sys.argv[4]))
    else:
        main()
