"""Honest full-MSM benchmark on the TPU (chain-diff timing + golden check).

Usage: python scratch_msm_bench.py [log2_n] [c] [K]
"""
import functools
import sys, os, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myzkp_tpu.curves import bn254, msm, weierstrass as wst
from myzkp_tpu.fields import limb

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 16
C = int(sys.argv[2]) if len(sys.argv) > 2 else 0
K = int(sys.argv[3]) if len(sys.argv) > 3 else 0
n = 1 << LOGN


def fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def time_fetch(fn, *args, reps=3):
    out = fn(*args); fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args); fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import random
    rng = random.Random(42)
    rspec = bn254.r_spec()
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())

    t0 = time.perf_counter()
    ks_gen = [rng.randrange(1, bn254.R) for _ in range(n)]
    g1 = bn254.g1_generator()
    base = bn254.g1_points_to_device([g1] * n)
    bits = msm.scalar_bits(msm.scalars_from_int(rspec, ks_gen))
    gen = jax.jit(lambda b: tuple(wst.scalar_mul_bits(F, b3, base, b)))
    points = wst.Point(*gen(bits))
    fetch(points)
    print(f"point gen: {time.perf_counter()-t0:.1f}s", flush=True)

    scalars = msm.scalars_from_int(
        rspec, [rng.randrange(1, bn254.R) for _ in range(n)])

    kw = {}
    if C: kw["c"] = C
    if K: kw["K"] = K

    def one_msm(px, py, pz, s):
        return wst.to_affine(F, msm.msm_pippenger(
            F, b3, wst.Point(px, py, pz), s), axis=None) \
            if False else tuple(msm.msm_pippenger(
                F, b3, wst.Point(px, py, pz), s, **kw))

    @jax.jit
    def chain(N, px, py, pz, s):
        def body(i, carry):
            s2 = s.at[0, 0].set((carry[0][0] + i.astype(jnp.uint32))
                                & jnp.uint32(0x7FFF))
            return one_msm(px, py, pz, s2)
        out = jax.lax.fori_loop(
            0, N, body, (px[:, 0] * 0, py[:, 0] * 0, pz[:, 0] * 0))
        return out[0].ravel()[0]

    t0 = time.perf_counter()
    tl = time_fetch(functools.partial(chain, 4), points.x, points.y,
                    points.z, scalars)
    ts = time_fetch(functools.partial(chain, 1), points.x, points.y,
                    points.z, scalars)
    dt = (tl - ts) / 3
    print(f"compile+measure wall: {time.perf_counter()-t0:.0f}s", flush=True)
    print(f"MSM n=2^{LOGN} c={C or 'auto'} K={K or 'auto'}: "
          f"{dt*1e3:.1f} ms -> {n/dt/1e3:.1f} k points/s", flush=True)

    # golden check vs batched double-and-add on device (bit-exact)
    if LOGN <= 16:
        t0 = time.perf_counter()
        run_p = jax.jit(lambda px, py, pz, s: tuple(
            msm.msm_pippenger(F, b3, wst.Point(px, py, pz), s, **kw)))
        got = wst.Point(*run_p(points.x, points.y, points.z, scalars))
        run_n = jax.jit(lambda px, py, pz, s: tuple(
            msm.msm_naive(F, b3, wst.Point(px, py, pz), s)))
        want = wst.Point(*run_n(points.x, points.y, points.z, scalars))
        eq = jax.jit(lambda g, w: wst.peq(F, b3, wst.Point(*g), wst.Point(*w)))
        ok = bool(np.asarray(eq(tuple(got), tuple(want))))
        print(f"golden check (vs device double-and-add): "
              f"{'OK' if ok else 'MISMATCH'} ({time.perf_counter()-t0:.0f}s)",
              flush=True)
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
