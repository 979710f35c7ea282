"""Validate + time the fused row-major MSM bucket scan on the real chip.

Compares msm_pippenger(_rows_scan=True) against the XLA-scan formulation
and host ground truth at a mid size (fast compile), then times both at the
target size.  Run on an otherwise-idle chip:

    python tools/exp_rows_scan.py [log_n_small] [log_n_big]
"""

import functools
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from myzkp_tpu.curves import bn254, fixed_base, msm as m, weierstrass as wst

LOG_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 17
LOG_BIG = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def fetch(out):
    for c in jax.tree_util.tree_leaves(out):
        np.asarray(c)


def timed(fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    return compile_s, min(ts), out


def main():
    rng = random.Random(42)
    rspec = bn254.r_spec()
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())

    for logn, check in ((LOG_SMALL, True), (LOG_BIG, False)):
        n = 1 << logn
        ms = [rng.randrange(1, bn254.R) for _ in range(n)]
        ks = [rng.randrange(0, bn254.R) for _ in range(n)]
        pts = fixed_base.fixed_base_multi(
            "g1", m.scalars_from_int(rspec, ms))
        fetch(pts)
        scalars = m.scalars_from_int(rspec, ks)

        @jax.jit
        def run_new(px, py, pz, sl):
            return tuple(m.msm_pippenger(F, b3, wst.Point(px, py, pz), sl,
                                         _rows_scan=True))

        @jax.jit
        def run_old(px, py, pz, sl):
            return tuple(m.msm_pippenger(F, b3, wst.Point(px, py, pz), sl,
                                         _rows_scan=False))

        for name, fn in (("rows", run_new), ("old ", run_old)):
            cs, dt, out = timed(fn, pts.x, pts.y, pts.z, scalars)
            print(f"2^{logn} {name}: compile+first {cs:7.1f}s  "
                  f"steady {dt*1e3:7.1f} ms  {n/dt/1e6:.2f} M pts/s",
                  flush=True)
            if check:
                got = bn254.g1_points_to_host(jax.tree_util.tree_map(
                    lambda a: a[:, None], wst.Point(*out)))[0]
                exp = bn254.g1_generator() * (
                    sum(k * mm for k, mm in zip(ks, ms)) % bn254.R)
                print(f"   golden vs host: {'OK' if got == exp else 'FAIL'}",
                      flush=True)
                assert got == exp


if __name__ == "__main__":
    main()
