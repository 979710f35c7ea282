"""Benchmark harness: honest single-chip throughput of the hot paths.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline metric is BN254 G1 Pippenger MSM points/s at N = 2^BENCH_MSM_LOG
(default 2^20); "extra" carries the remaining north-star metrics
(mont_mul muls/s, NTT transform time, QAP end-to-end prove seconds) plus the
on-device bit-check verdicts.

Timing methodology (docs/speed_of_light.md): this chip is reached through a
relay where dispatch is acknowledged before execution and
``jax.block_until_ready`` does not block, so every measurement here either
(a) chain-differences two on-device ``fori_loop`` repeat counts with a
scalar host fetch after each, or (b) wall-times a call whose return value is
host data (forcing execution).  Round-1 numbers were taken the naive way and
under-reported throughput ~3x; do not compare against them.

``vs_baseline`` is the measured speedup over the reference's only MSM
algorithm — per-coefficient affine double-and-add on host BigInts
(myzkp/src/modules/algebra/polynomial.rs:156-165 + curve.rs:163-191) —
sampled here on the same host and extrapolated per point (the reference
publishes no numbers, BASELINE.md).
"""

import functools
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

LOG_N = int(os.environ.get("BENCH_MSM_LOG", 20))
QAP_LOG = int(os.environ.get("BENCH_QAP_LOG", 20))
NTT_LOG = int(os.environ.get("BENCH_NTT_LOG", 20))
SKIP = set(os.environ.get("BENCH_SKIP", "").split(","))

# Compile cache: Pippenger/SNARK programs take minutes to compile; repeated
# bench runs on the same host reuse the cache.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch(out):
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

    @jax.jit
    def run(N, x0, *cs):
        x = jax.lax.fori_loop(0, N, lambda i, x: step(i, x, *cs), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]

    tl = _time_fetch(functools.partial(run, n_long), init, *consts, reps=reps)
    ts = _time_fetch(functools.partial(run, n_short), init, *consts, reps=reps)
    return (tl - ts) / (n_long - n_short)


def bench_bitchecks(extra):
    """On-device golden comparisons: fail the whole bench on mismatch
    (VERDICT r1: Mosaic lowering must be bit-checked on the real chip)."""
    from myzkp_tpu.fields.spec import bn254_q_spec
    from myzkp_tpu.fields import limb, limb_pallas

    spec = bn254_q_spec()
    n = 1 << 14
    a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(0), (n,)))
    b = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (n,)))
    prev_pallas = os.environ.get("MYZKP_PALLAS")
    try:
        os.environ["MYZKP_PALLAS"] = "0"
        want = np.asarray(jax.jit(lambda a, b: limb.mont_mul(spec, a, b))(a, b))
        os.environ["MYZKP_PALLAS"] = "1"
        got = np.asarray(jax.jit(
            lambda a, b: limb_pallas.mont_mul_pallas(spec, a, b))(a, b))
        ok_mul = bool((got == want).all())

        tw = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(2), (n,)))
        gu, gv = jax.jit(lambda u, v, t: limb_pallas.butterfly_pallas(
            spec, u, v, t, dit=False))(a, b, tw)
        os.environ["MYZKP_PALLAS"] = "0"
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
        os.environ["MYZKP_PALLAS"] = "0"
        wl = np.asarray(jax.jit(
            lambda x: nttmod._stockham_axis(rspec, x, m, False))(x4))
        os.environ["MYZKP_PALLAS"] = "1"
        ok_leaf = bool((gl == wl).all())

        # fused G2 (Fq2-coordinate) complete add vs pure-JAX golden — the
        # G2 interpret tests are CI-slow-marked, so the lowering is pinned
        # here on the real chip instead
        from myzkp_tpu.curves import bn254, weierstrass as wst

        F2, b32 = bn254.g2_ops(), bn254.g2_b3(())
        g2gen = bn254.g2_generator()
        pa = bn254.g2_points_to_device([g2gen * (3 + i) for i in range(8)])
        pb = bn254.g2_points_to_device([g2gen * (11 + i) for i in range(8)])
        def g2add(): return wst.padd(F2, b32, pa, pb)
        got2 = jax.tree_util.tree_leaves(g2add())
        os.environ["MYZKP_PALLAS"] = "0"
        want2 = jax.tree_util.tree_leaves(g2add())
        os.environ["MYZKP_PALLAS"] = "1"
        ok_g2 = all(bool((np.asarray(g) == np.asarray(w)).all())
                    for g, w in zip(got2, want2))
    finally:
        if prev_pallas is None:
            os.environ.pop("MYZKP_PALLAS", None)
        else:
            os.environ["MYZKP_PALLAS"] = prev_pallas
    extra["bitcheck_mont_mul"] = ok_mul
    extra["bitcheck_butterfly"] = ok_bf
    extra["bitcheck_ntt_leaf"] = ok_leaf
    extra["bitcheck_g2_padd"] = ok_g2
    if not (ok_mul and ok_bf and ok_leaf and ok_g2):
        print(json.dumps({"metric": "BITCHECK_FAILED", "value": 0,
                          "unit": "", "vs_baseline": 0, "extra": extra}))
        sys.exit(1)
    print("# bitchecks OK (mont_mul, butterfly @ 2^14, ntt_leaf @ 128x128, g2 padd)",
          file=sys.stderr)


def bench_mont_mul(extra):
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
    from myzkp_tpu.fields.spec import bn254_r_spec
    from myzkp_tpu.fields import limb
    from myzkp_tpu.fields.fp import Fp
    from myzkp_tpu.ops import ntt as nttmod

    spec = bn254_r_spec()
    n = 1 << NTT_LOG
    a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(3), (n,)))

    def step(i, x):
        return nttmod._ntt_natural(spec, x, False)

    dt = _chain_time(step, a, n_long=6, n_short=1)
    nbf = (n // 2) * NTT_LOG
    extra[f"ntt_2^{NTT_LOG}_ms"] = round(dt * 1e3, 2)
    extra[f"ntt_2^{NTT_LOG}_M_butterflies_per_s"] = round(nbf / dt / 1e6, 1)
    print(f"# ntt 2^{NTT_LOG}: {dt*1e3:.1f} ms "
          f"({nbf/dt/1e6:.0f} M butterflies/s)", file=sys.stderr)


def bench_msm(extra):
    from myzkp_tpu.curves import bn254, msm, weierstrass as wst
    from myzkp_tpu.fields import limb

    rng = random.Random(42)
    rspec = bn254.r_spec()
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    n = 1 << LOG_N

    # points generated ON DEVICE as known multiples [m_i]G so the golden
    # check needs only one host scalar mul: sum k_i m_i mod r
    ms = [rng.randrange(1, bn254.R) for _ in range(n)]
    base = bn254.g1_points_to_device([bn254.g1_generator()] * n)
    m_limbs = msm.scalars_from_int(rspec, ms)
    gen = jax.jit(lambda px, py, pz, sl: tuple(wst.scalar_mul_bits(
        F, b3, wst.Point(px, py, pz), msm.scalar_bits(sl))))
    points = wst.Point(*gen(base.x, base.y, base.z, m_limbs))
    _fetch(points)

    ks = [rng.randrange(0, bn254.R) for _ in range(n)]
    scalars = msm.scalars_from_int(rspec, ks)

    # golden: small-n MSM through the same pipeline vs host ground truth
    n_small = 512
    got = msm.msm_pippenger(
        F, b3, jax.tree_util.tree_map(lambda c: c[:, :n_small], points),
        scalars[:, :n_small])
    got_host = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda c: c[:, None], got))[0]
    exp = bn254.g1_generator() * (
        sum(k * m for k, m in zip(ks[:n_small], ms[:n_small])) % bn254.R)
    extra["bitcheck_msm_512"] = bool(got_host == exp)
    if not extra["bitcheck_msm_512"]:
        print(json.dumps({"metric": "MSM_GOLDEN_FAILED", "value": 0,
                          "unit": "", "vs_baseline": 0, "extra": extra}))
        sys.exit(1)
    print("# msm golden @512 OK", file=sys.stderr)

    def step(i, carry, px, py, pz, sl):
        # points/scalars arrive as jit arguments (consts=...), NOT closure
        # captures — see _chain_time: captured 2^20-point tables become HLO
        # literals and overflow the relay's remote-compile request body.
        s2 = sl.at[0, 0].set(
            (carry[0][0] + i.astype(jnp.uint32)) & jnp.uint32(0x7FFF))
        return tuple(msm.msm_pippenger(F, b3, wst.Point(px, py, pz), s2))

    init = (points.x[:, 0] * 0, points.y[:, 0] * 0, points.z[:, 0] * 0)
    dt = _chain_time(step, init, n_long=4, n_short=1, reps=2,
                     consts=(points.x, points.y, points.z, scalars))
    pps = n / dt
    print(f"# msm 2^{LOG_N}: {dt*1e3:.1f} ms -> {pps/1e3:.0f} k pts/s",
          file=sys.stderr)

    # reference-equivalent naive host double-and-add, sampled
    sample = 4
    host_pts = [bn254.g1_generator() * m for m in ms[:sample]]
    t0 = time.perf_counter()
    acc = bn254.curve_g1.infinity()
    for k, p in zip(ks[:sample], host_pts):
        acc = acc + p * k
    host_pps = sample / (time.perf_counter() - t0)
    return pps, host_pps


def bench_qap(extra, qap_log=None):
    """End-to-end Pinocchio prove at 2^qap_log constraints (north star)."""
    from myzkp_tpu.arith.sparse import SparseQAP, square_chain
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.snark import pinocchio

    QAP_LOG = qap_log if qap_log is not None else globals()["QAP_LOG"]
    spec = bn254.r_spec()
    rng = random.Random(42)
    m = 1 << QAP_LOG
    t0 = time.perf_counter()
    r1cs, assignment = square_chain(spec, m)
    qap = SparseQAP(r1cs)
    t1 = time.perf_counter()
    pk, vk = pinocchio.setup(qap, rng=rng)
    _fetch(pk.g1_sj.x)
    t2 = time.perf_counter()
    proof = pinocchio.prove(assignment, pk, qap, rng=rng)  # warm-up/compile
    t3 = time.perf_counter()
    proof = pinocchio.prove(assignment, pk, qap, rng=rng)  # steady state
    t4 = time.perf_counter()
    ok = pinocchio.verify(proof, vk)
    t5 = time.perf_counter()
    if not ok:
        print(json.dumps({"metric": "QAP_PROOF_REJECTED", "value": 0,
                          "unit": "", "vs_baseline": 0, "extra": extra}))
        sys.exit(1)
    extra[f"qap_2^{QAP_LOG}_prove_s"] = round(t4 - t3, 3)
    extra[f"qap_2^{QAP_LOG}_prove_cold_s"] = round(t3 - t2, 3)
    extra[f"qap_2^{QAP_LOG}_setup_s"] = round(t2 - t1, 3)
    extra[f"qap_2^{QAP_LOG}_circuit_s"] = round(t1 - t0, 3)
    extra[f"qap_2^{QAP_LOG}_verify_s"] = round(t5 - t4, 3)
    print(f"# qap 2^{QAP_LOG}: prove {t4-t3:.2f}s (cold {t3-t2:.2f}s) "
          f"setup {t2-t1:.1f}s verify {t5-t4:.2f}s", file=sys.stderr)


def main():
    extra = {"methodology": "chain-diff+fetch (docs/speed_of_light.md)"}
    t_start = time.perf_counter()
    if "bitcheck" not in SKIP:
        bench_bitchecks(extra)
    if "mont_mul" not in SKIP:
        bench_mont_mul(extra)
    if "ntt" not in SKIP:
        bench_ntt(extra)
    pps, host_pps = bench_msm(extra)
    if "qap" not in SKIP:
        try:
            bench_qap(extra)
        except Exception as e:  # keep the headline metric on qap failure
            extra["qap_error"] = f"{type(e).__name__}: {e}"[:200]
            if QAP_LOG > 16:
                # fall back so SOME end-to-end prove number lands
                try:
                    bench_qap(extra, qap_log=16)
                except Exception as e2:
                    extra["qap16_error"] = f"{type(e2).__name__}: {e2}"[:200]
    extra["bench_wall_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps({
        "metric": f"bn254_g1_msm_pippenger_2^{LOG_N}",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / host_pps, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
